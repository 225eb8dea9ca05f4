"""Determinism & golden-value tests (SURVEY §5 race-detection analog:
on TPU the hazard is nondeterministic reductions / scatter orders, so we
pin bit-exact repeatability and seeded golden values)."""
import numpy as np
import pytest

from suitesparse_tpu.core.common import default_common
from suitesparse_tpu.core.sparse import SparseCSC
from suitesparse_tpu.io import generators


class TestBitwiseRepeatability:
    def test_cholesky_wave_and_unrolled(self):
        from suitesparse_tpu.cholesky import (analyze, factorize_super,
                                              super_symbolic)
        A = generators.laplacian_3d(7)
        for program in ("unrolled", "wave"):
            cm = default_common()
            cm.cholesky.supernodal = "supernodal"
            cm.cholesky.program = program
            sym = analyze(A, cm)
            ss = super_symbolic(A, sym, cm)
            f1 = factorize_super(A, sym, ss, common=cm, dtype=np.float64)
            f2 = factorize_super(A, sym, ss, common=cm, dtype=np.float64)
            a1, a2 = np.asarray(f1.Lx), np.asarray(f2.Lx)
            tot = f1.plan.total
            assert np.array_equal(a1[:tot], a2[:tot]), program

    def test_umfpack_repeatable(self):
        from suitesparse_tpu.lu import umf_numeric, umf_symbolic
        A = generators.random_unsym(120, 0.04, seed=40)
        S = umf_symbolic(A)
        n1 = umf_numeric(A, S)
        n2 = umf_numeric(A, S)
        assert np.array_equal(np.asarray(n1.Lb), np.asarray(n2.Lb))
        assert np.array_equal(np.asarray(n1.Ub), np.asarray(n2.Ub))

    def test_klu_native_repeatable(self):
        from suitesparse_tpu.lu.klu import klu_analyze, klu_factor
        A = generators.random_unsym(150, 0.04, seed=41)
        sym = klu_analyze(A)
        b1 = klu_factor(A, sym)
        b2 = klu_factor(A, sym)
        for x, y in zip(b1.blocks, b2.blocks):
            assert np.array_equal(x.Lx, y.Lx)
            assert np.array_equal(x.Ux, y.Ux)
            assert np.array_equal(x.pivot_rows, y.pivot_rows)

    def test_spgemm_repeatable(self):
        from suitesparse_tpu.ops.spgemm import spgemm
        import scipy.sparse as sp
        rng = np.random.default_rng(42)
        A = SparseCSC.from_scipy(sp.random(200, 200, 0.03,
                                           random_state=rng).tocsc())
        C1 = spgemm(A, A)
        C2 = spgemm(A, A)
        assert np.array_equal(C1.data, C2.data)
        assert np.array_equal(C1.indices, C2.indices)


class TestGoldenValues:
    """Seeded golden values: catch silent cross-version numeric drift.
    (Pinned from the float64 CPU path; tolerance covers BLAS variation.)"""

    def test_cholesky_golden(self):
        from suitesparse_tpu.cholesky import (analyze, factorize_super,
                                              solve_super, super_symbolic)
        A = generators.laplacian_2d(10)           # fixed 100-node grid
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        sym = analyze(A, cm)
        ss = super_symbolic(A, sym, cm)
        f = factorize_super(A, sym, ss, common=cm, dtype=np.float64)
        b = np.arange(1, 101, dtype=float) / 100.0
        x = solve_super(f, b)
        # golden scalar invariants of the exact solution of this system
        # (pinned from scipy.sparse.linalg.spsolve in float64)
        assert np.sum(x) == pytest.approx(238.85580876304888, rel=1e-10)
        assert np.abs(x).max() == pytest.approx(4.526011068636602, rel=1e-10)

    def test_pagerank_golden(self):
        from suitesparse_tpu.graphblas.algorithms import pagerank
        import scipy.sparse as sp
        n = 64
        ring = sp.csc_matrix(
            (np.ones(n), (np.arange(n), (np.arange(n) + 1) % n)),
            shape=(n, n))
        pr = pagerank(SparseCSC.from_scipy(ring), tol=1e-12)
        # symmetric ring: uniform distribution
        assert np.allclose(pr, 1.0 / n, atol=1e-9)

    def test_determinant_golden(self):
        from suitesparse_tpu.lu import umf_determinant, umf_numeric, \
            umf_symbolic
        import scipy.sparse as sp
        T = sp.diags([2.0 * np.ones(12), -np.ones(11), -np.ones(11)],
                     [0, 1, -1]).tocsc()
        num = umf_numeric(SparseCSC.from_scipy(T), umf_symbolic(
            SparseCSC.from_scipy(T)))
        m, e = umf_determinant(num)
        # det(tridiag(-1,2,-1), n=12) = 13
        assert m * 10.0**e == pytest.approx(13.0, rel=1e-10)
