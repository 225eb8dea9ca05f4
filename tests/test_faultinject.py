"""Tcov-style fault-injection torture tests (SURVEY §4).

The reference's coverage suites override malloc to fail on the N-th call
and assert every out-of-memory branch is graceful (CHOLMOD/Tcov memory.c).
Our analog: Common.arm_failure(N) makes the N-th phase checkpoint raise a
SparseError(OUT_OF_MEMORY); the sweep asserts that for EVERY N the failure
is clean (typed error, status set, no crash / corrupted state) and that the
same Common, disarmed, then completes successfully.
"""
import numpy as np
import pytest

from suitesparse_tpu.core.common import default_common
from suitesparse_tpu.core.status import SparseError, Status
from suitesparse_tpu.io import generators


def _sweep(pipeline, max_n=8):
    """Run `pipeline(cm)` with a failure injected at every checkpoint depth;
    returns the number of injection points that actually fired."""
    fired = 0
    for n in range(max_n):
        cm = default_common()
        cm.arm_failure(n)
        try:
            pipeline(cm)
        except SparseError as e:
            assert e.status == Status.OUT_OF_MEMORY
            assert cm.status == Status.OUT_OF_MEMORY
            fired += 1
            continue
        break      # pipeline survived n checkpoints: no more to inject
    # disarmed run must succeed and leave OK status
    cm = default_common()
    pipeline(cm)
    assert cm.status == Status.OK
    return fired


class TestFaultInjection:
    def test_cholesky_pipeline(self):
        A = generators.laplacian_2d(12)
        b = np.ones(A.ncol)

        def pipeline(cm):
            from suitesparse_tpu.cholesky import analyze, super_symbolic
            from suitesparse_tpu.cholesky.super_numeric import (
                factorize_super, solve_super)
            cm.cholesky.supernodal = "supernodal"
            sym = analyze(A, cm)
            ss = super_symbolic(A, sym, cm)
            f = factorize_super(A, sym, ss, common=cm)
            solve_super(f, b)

        assert _sweep(pipeline) >= 3    # analyze, super_symbolic, numeric

    def test_umf_pipeline(self):
        A = generators.random_unsym(60, 0.08, seed=70)
        b = np.ones(60)

        def pipeline(cm):
            from suitesparse_tpu.lu import umf_symbolic, umf_numeric, umf_solve
            S = umf_symbolic(A, cm)
            num = umf_numeric(A, S, cm)
            umf_solve(num, b, common=cm)

        assert _sweep(pipeline) >= 3

    def test_klu_pipeline(self):
        A = generators.circuit_like(80, seed=71)
        b = np.ones(80)

        def pipeline(cm):
            from suitesparse_tpu.lu import klu_analyze, klu_factor, klu_solve
            S = klu_analyze(A, cm)
            num = klu_factor(A, S, cm)
            klu_solve(num, b)

        assert _sweep(pipeline) >= 2

    def test_qr_pipeline(self):
        import scipy.sparse as sp
        from suitesparse_tpu.core.sparse import SparseCSC
        S = sp.random(40, 25, density=0.2, random_state=72, format="csc")
        S = S + sp.csc_matrix((np.full(25, 0.7),
                               (np.arange(25), np.arange(25))), shape=(40, 25))
        A = SparseCSC.from_scipy(S.tocsc())
        b = np.ones(40)

        def pipeline(cm):
            from suitesparse_tpu.qr import qr_symbolic, qr_factorize, qr_rsolve
            Sy = qr_symbolic(A, cm)
            num = qr_factorize(A, Sy, b=b, common=cm)
            qr_rsolve(num, num.qtb[:, 0])

        assert _sweep(pipeline) >= 2

    def test_failure_does_not_poison_later_runs(self):
        """A failed (injected) run must not corrupt module state: a fresh
        run on the same pattern afterwards is bit-identical to a run that
        never saw a failure."""
        A = generators.laplacian_2d(10)
        from suitesparse_tpu.cholesky import analyze, super_symbolic
        from suitesparse_tpu.cholesky.super_numeric import factorize_super

        def factor():
            cm = default_common()
            cm.cholesky.supernodal = "supernodal"
            sym = analyze(A, cm)
            ss = super_symbolic(A, sym, cm)
            return np.asarray(factorize_super(A, sym, ss, common=cm).Lx)

        clean = factor()
        cm = default_common()
        cm.arm_failure(1)
        with pytest.raises(SparseError):
            from suitesparse_tpu.cholesky import analyze as an2
            an2(A, cm)
            from suitesparse_tpu.cholesky import super_symbolic as ss2
            ss2(A, an2(A, cm), cm)
        after = factor()
        assert np.array_equal(clean, after)
