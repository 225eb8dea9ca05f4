"""UMFPACK-class multifrontal LU tests (reference model: UMFPACK Tcov +
umfpack demo residuals)."""
import numpy as np
import pytest
import scipy.sparse as sp

from suitesparse_tpu.cholesky import residual_norm
from suitesparse_tpu.core.common import default_common
from suitesparse_tpu.core.sparse import SparseCSC
from suitesparse_tpu.io import generators
from suitesparse_tpu.lu import (umf_determinant, umf_numeric, umf_solve,
                                umf_symbolic)


class TestUmf:
    @pytest.mark.parametrize("gen,kw", [
        ("random_unsym", dict(n=250, density=0.02, seed=1)),
        ("circuit_like", dict(n=200, seed=2)),
    ])
    def test_solve_residual(self, gen, kw):
        A = getattr(generators, gen)(**kw)
        cm = default_common()
        S = umf_symbolic(A, cm)
        num = umf_numeric(A, S, cm)
        assert num.ok
        b = np.random.default_rng(0).standard_normal(A.ncol)
        x = umf_solve(num, b, A=A, common=cm)
        assert residual_norm(A, x, b) < 1e-13

    def test_strategy_auto(self):
        # near-symmetric with full diagonal -> symmetric strategy
        A = generators.circuit_like(150, seed=3)
        S = umf_symbolic(A)
        assert S.strategy == "symmetric"
        # wildly unsymmetric -> unsymmetric strategy + row matching
        B = generators.random_unsym(150, 0.03, seed=4)
        S2 = umf_symbolic(B)
        assert S2.strategy == "unsymmetric"

    def test_matches_scipy(self):
        A = generators.random_unsym(180, 0.03, seed=5)
        import scipy.sparse.linalg as spla
        b = np.random.default_rng(1).standard_normal(180)
        x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
        num = umf_numeric(A, umf_symbolic(A))
        x = umf_solve(num, b, A=A)
        assert np.allclose(x, x_ref, rtol=1e-6, atol=1e-8)

    def test_multi_rhs(self):
        A = generators.random_unsym(120, 0.04, seed=6)
        num = umf_numeric(A, umf_symbolic(A))
        B = np.random.default_rng(2).standard_normal((120, 3))
        X = umf_solve(num, B, A=A)
        assert np.abs(A.to_scipy() @ X - B).max() < 1e-10

    def test_refactorization_reuse(self):
        """Same pattern, new values — symbolic + plan reused."""
        A = generators.random_unsym(200, 0.02, seed=7)
        S = umf_symbolic(A)
        b = np.ones(200)
        for scale in (1.0, 3.0, 0.25):
            A2 = SparseCSC(A.indptr, A.indices, A.data * scale, A.shape)
            num = umf_numeric(A2, S)
            x = umf_solve(num, b, A=A2)
            assert residual_norm(A2, x, b) < 1e-12

    def test_hard_pivoting_case_refinement_recovers(self):
        """Matrix with weak diagonal: restricted pivoting + refinement must
        still reach the residual bar (the documented accuracy strategy)."""
        rng = np.random.default_rng(8)
        n = 150
        M = sp.random(n, n, density=0.05, random_state=rng).tolil()
        for i in range(n):
            M[i, i] = 1e-8 * (1 + rng.random())   # tiny diagonal
            M[i, (i + 7) % n] = 1.0 + rng.random()
        A = SparseCSC.from_scipy(M.tocsc())
        cm = default_common()
        num = umf_numeric(A, umf_symbolic(A, cm), cm)
        b = rng.standard_normal(n)
        x = umf_solve(num, b, A=A, refine=5, common=cm)
        assert residual_norm(A, x, b) < 1e-10

    def test_determinant(self):
        A = generators.random_unsym(80, 0.05, seed=9)
        num = umf_numeric(A, umf_symbolic(A))
        m, e = umf_determinant(num)
        _, ld = np.linalg.slogdet(A.to_scipy().toarray())
        assert np.log10(abs(m)) + e == pytest.approx(ld / np.log(10), abs=1e-6)

    def test_singular_flagged(self):
        S = sp.identity(10).tolil()
        S[4, 4] = 0.0
        S[4, :] = 0.0   # entire zero row -> singular
        cm = default_common()
        A = SparseCSC.from_scipy(S.tocsc())
        num = umf_numeric(A, umf_symbolic(A, cm), cm)
        from suitesparse_tpu.core.status import Status
        assert num.singular or cm.status == Status.SINGULAR


class TestUmfTranspose:
    def test_transpose_solve(self):
        A = generators.random_unsym(150, 0.03, seed=21)
        from suitesparse_tpu.cholesky import residual_norm
        num = umf_numeric(A, umf_symbolic(A))
        b = np.random.default_rng(2).standard_normal(150)
        xt = umf_solve(num, b, system="At", A=A)
        assert residual_norm(A.transpose(), xt, b) < 1e-13
        # cross-check vs scipy
        import scipy.sparse.linalg as spla
        x_ref = spla.spsolve(A.to_scipy().T.tocsc(), b)
        assert np.allclose(xt, x_ref, rtol=1e-6, atol=1e-9)

    def test_transpose_with_blocks_pivoting(self):
        # symmetric-strategy path (no row matching) + block pivots
        A = generators.circuit_like(180, seed=22)
        from suitesparse_tpu.cholesky import residual_norm
        num = umf_numeric(A, umf_symbolic(A))
        b = np.ones(180)
        xt = umf_solve(num, b, system="At", A=A)
        assert residual_norm(A.transpose(), xt, b) < 1e-12

    def test_report_functions(self):
        from suitesparse_tpu.lu import report
        from suitesparse_tpu.core.common import default_common
        lines = []
        cm = default_common()
        cm.print_func = lines.append
        A = generators.random_unsym(50, 0.08, seed=23)
        S = umf_symbolic(A, cm)
        num = umf_numeric(A, S, cm)
        report.report_status(cm)
        report.report_control(cm)
        report.report_symbolic(S, cm)
        report.report_numeric(num, cm)
        report.report_info(cm)
        assert any("umf symbolic" in l for l in lines)
        assert any("status" in l for l in lines)
