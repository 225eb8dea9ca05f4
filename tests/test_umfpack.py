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
        # wildly unsymmetric: BTF decomposes first (singleton pruning);
        # the non-trivial blocks then pick the unsymmetric strategy
        B = generators.random_unsym(150, 0.03, seed=4)
        S2 = umf_symbolic(B)
        if S2.strategy == "btf":
            inner = [s for s in S2.singles.subs if s is not None]
            assert all(s[0].strategy == "unsymmetric" for s in inner)
        else:
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

    def test_determinant_sign_exact(self):
        """Sign (permutation parity) must match the dense determinant —
        umfpack_get_determinant.c semantics, across seeds and strategies."""
        for seed in range(5):
            A = generators.random_unsym(40, 0.12, seed=100 + seed)
            sgn_ref, ld = np.linalg.slogdet(A.to_scipy().toarray())
            for strategy in ("auto", "unsymmetric", "symmetric"):
                cm = default_common()
                cm.lu.strategy = strategy
                num = umf_numeric(A, umf_symbolic(A, cm), cm)
                m, e = umf_determinant(num)
                assert np.sign(m) == sgn_ref, (seed, strategy)
                assert np.log(abs(m)) + e * np.log(10) == \
                    pytest.approx(ld, abs=1e-6)

    def test_determinant_sign_btf_path(self):
        """Sign exactness through the BTF/singleton recursion."""
        rng = np.random.default_rng(3)
        for seed in range(4):
            rng = np.random.default_rng(seed)
            # block-triangularizable matrix: 2 dense-ish diagonal blocks +
            # one-way coupling so BTF finds >1 block
            n1, n2 = 13, 17
            B1 = rng.standard_normal((n1, n1)) + 5 * np.eye(n1)
            B2 = rng.standard_normal((n2, n2)) + 5 * np.eye(n2)
            M = sp.lil_matrix((n1 + n2, n1 + n2))
            M[:n1, :n1] = B1
            M[n1:, n1:] = B2
            M[:n1, n1:] = rng.standard_normal((n1, n2)) * \
                (rng.random((n1, n2)) < 0.1)
            A = SparseCSC.from_scipy(M.tocsc())
            num = umf_numeric(A, umf_symbolic(A))
            assert num.bnums is not None, "BTF path not taken"
            m, e = umf_determinant(num)
            ref = np.linalg.det(M.toarray())
            assert np.sign(m) == np.sign(ref), seed
            assert abs(m * 10.0**e - ref) / abs(ref) < 1e-8

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


class TestUmfSystems:
    """The umfpack.h:379-394 solve-system set + complex end-to-end."""

    def _setup(self, n=120, seed=31):
        A = generators.random_unsym(n, 0.06, seed=seed)
        S = umf_symbolic(A)
        num = umf_numeric(A, S)
        return A, S, num

    def test_piecewise_compose_equals_A(self):
        A, S, num = self._setup()
        n = A.ncol
        rng = np.random.default_rng(31)
        b = rng.standard_normal(n)
        x_a = umf_solve(num, b, "A", refine=0)
        # x = C^{-1} Q (U \ (L \ (P R^{-1} b)))  — the factored matrix is
        # the two-sided-scaled R^{-1} A C^{-1}
        z = (b / num.Rs)[S.a_perm_rows]
        y = umf_solve(num, umf_solve(num, z, "L"), "U")
        x2 = np.empty(n)
        x2[S.a_perm_cols] = y / num.Cs
        assert np.abs(x2 - x_a).max() < 1e-10

    def test_transpose_compose_equals_At(self):
        A, S, num = self._setup(seed=32)
        n = A.ncol
        b = np.random.default_rng(32).standard_normal(n)
        x_t = umf_solve(num, b, "At", refine=0)
        z = b[S.a_perm_cols] / num.Cs
        y = umf_solve(num, umf_solve(num, z, "Ut"), "Lt")
        x2 = np.empty(n)
        x2[S.a_perm_rows] = y
        x2 /= num.Rs
        assert np.abs(x2 - x_t).max() < 1e-10

    def test_perm_system_variants(self):
        A, S, num = self._setup(seed=33)
        n = A.ncol
        b = np.random.default_rng(33).standard_normal(n)
        # Pt_L == L with P-permuted rhs
        assert np.allclose(umf_solve(num, b, "Pt_L"),
                           umf_solve(num, b[S.a_perm_rows], "L"))
        # U_Qt scatters the U solve through the column perm
        y = umf_solve(num, b, "U")
        out = np.empty(n)
        out[S.a_perm_cols] = y
        assert np.allclose(umf_solve(num, b, "U_Qt"), out)
        # Lt_P / Ut_Q roundtrips against their unpermuted versions
        yl = umf_solve(num, b, "Lt")
        outl = np.empty(n)
        outl[S.a_perm_rows] = yl
        assert np.allclose(umf_solve(num, b, "Lt_P"), outl)
        assert np.allclose(umf_solve(num, b, "Ut_Q"),
                           umf_solve(num, b, "Ut")[S.a_perm_cols])

    def test_wsolve_alias(self):
        A, S, num = self._setup(seed=34)
        b = np.ones(A.ncol)
        from suitesparse_tpu.lu import umf_wsolve
        W = np.zeros(5 * A.ncol)
        assert np.allclose(umf_wsolve(num, b, W=W, system="A", A=A),
                           umf_solve(num, b, "A", A=A))

    def test_complex_lu_end_to_end(self):
        rng = np.random.default_rng(35)
        import scipy.sparse as sp
        n = 100
        Sr = sp.random(n, n, density=0.05, random_state=rng, format="csc")
        Si = sp.random(n, n, density=0.05, random_state=rng, format="csc")
        S = (Sr + 1j * Si + sp.diags(np.full(n, 4.0 + 1.0j))).tocsc()
        from suitesparse_tpu.core.sparse import SparseCSC
        A = SparseCSC.from_scipy(S)
        Ssym = umf_symbolic(A)
        num = umf_numeric(A, Ssym)
        b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        x = umf_solve(num, b, "A", A=A)
        assert np.iscomplexobj(x)
        assert np.linalg.norm(S @ x - b, np.inf) < 1e-8
        # adjoint and plain-transpose systems differ and are both right
        xh = umf_solve(num, b, "At", A=A)
        xt = umf_solve(num, b, "Aat", A=A)
        assert np.linalg.norm(S.conj().T @ xh - b, np.inf) < 1e-8
        assert np.linalg.norm(S.T @ xt - b, np.inf) < 1e-8
        assert np.abs(xh - xt).max() > 1e-6
        # complex determinant magnitude vs dense
        from suitesparse_tpu.lu import umf_determinant
        m, e = umf_determinant(num)
        ref = np.linalg.det(S.toarray())
        assert abs(abs(m) * 10.0**e - abs(ref)) / abs(ref) < 1e-6


class TestUmfSingletons:
    """Singleton pruning (umf_singletons analog, generalized to BTF)."""

    def _triangularish(self, n=60, seed=90):
        import scipy.sparse as sp
        rng = np.random.default_rng(seed)
        # upper-triangular plus a dense-ish trailing block: plenty of
        # column singletons for the peel
        U = sp.triu(sp.random(n, n, density=0.06, random_state=rng)).tolil()
        U.setdiag(np.arange(1.0, n + 1.0))
        k = n - 12
        blk = rng.standard_normal((12, 12)) + 12 * np.eye(12)
        U[k:, k:] = blk
        return SparseCSC.from_scipy(U.tocsc())

    def test_singletons_found_and_solve_exact(self):
        from suitesparse_tpu.core.common import default_common
        A = self._triangularish()
        cm = default_common()
        S = umf_symbolic(A, cm)
        assert S.strategy == "btf"
        n1 = sum(1 for s in S.singles.subs if s is None)
        assert n1 >= 40          # the triangular part peels to singletons
        num = umf_numeric(A, S, cm)
        b = np.arange(1.0, 61.0)
        x = umf_solve(num, b, A=A, common=cm)
        Ssc = A.to_scipy()
        assert np.linalg.norm(Ssc @ x - b, np.inf) < 1e-10
        xt = umf_solve(num, b, system="At", A=A, common=cm)
        assert np.linalg.norm(Ssc.T @ xt - b, np.inf) < 1e-10

    def test_singletons_off_matches(self):
        from suitesparse_tpu.core.common import default_common
        A = self._triangularish(seed=91)
        b = np.ones(60)
        cm = default_common()
        cm.lu.singletons = False
        S = umf_symbolic(A, cm)
        assert S.strategy in ("symmetric", "unsymmetric")
        x_off = umf_solve(umf_numeric(A, S, cm), b, A=A, common=cm)
        x_on = umf_solve(umf_numeric(A, umf_symbolic(A)), b, A=A)
        assert np.abs(x_on - x_off).max() < 1e-9

    def test_btf_refactor_uses_new_values(self):
        A = self._triangularish(seed=92)
        S = umf_symbolic(A)
        b = np.ones(60)
        for scale in (1.0, 5.0):
            A2 = SparseCSC(A.indptr, A.indices, A.data * scale, A.shape)
            num = umf_numeric(A2, S)
            x = umf_solve(num, b, A=A2)
            assert np.linalg.norm(A2.to_scipy() @ x - b, np.inf) < 1e-10

    def test_factor_systems_unavailable_on_btf(self):
        from suitesparse_tpu.core.status import SparseError
        A = self._triangularish(seed=93)
        num = umf_numeric(A, umf_symbolic(A))
        with pytest.raises(SparseError):
            umf_solve(num, np.ones(60), system="L")


class TestEscalation:
    """Omega-triggered KLU escalation (the accuracy escape hatch for the
    static-pivot design; reference accuracy class umf_local_search.c)."""

    def test_west0479_escalates_to_reference_accuracy(self):
        from suitesparse_tpu.core.common import default_common
        from suitesparse_tpu.io.fixtures import load
        A = load("west0479")
        Ssc = A.to_scipy()
        b = np.asarray(Ssc @ np.ones(A.ncol)).ravel()
        # the stalling regime: no singleton/BTF pruning, f32 factor
        cm = default_common()
        cm.lu.singletons = False
        S = umf_symbolic(A, cm)
        N = umf_numeric(A, S, cm, dtype=np.float32)
        x = umf_solve(N, b, "A", A=A, common=cm)
        r = b - Ssc @ x
        comp = np.abs(r) / np.maximum(np.abs(Ssc) @ np.abs(x) + np.abs(b),
                                      1e-300)
        assert cm.info.get("umf_escalated") is True
        assert comp.max() < 1e-10
        assert np.abs(x - 1).max() < 1e-8

    def test_no_escalation_when_refinement_converges(self):
        from suitesparse_tpu.core.common import default_common
        from suitesparse_tpu.io.fixtures import load
        A = load("west0067")
        cm = default_common()
        S = umf_symbolic(A, cm)
        N = umf_numeric(A, S, cm)
        b = np.ones(A.ncol)
        x = umf_solve(N, b, "A", A=A, common=cm)
        assert cm.info.get("umf_escalated") is None
        assert np.linalg.norm(A.to_scipy() @ x - b, np.inf) < 1e-10

    def test_default_btf_path_meets_target_without_escalation(self):
        from suitesparse_tpu.core.common import default_common
        from suitesparse_tpu.io.fixtures import load
        A = load("west0479")
        Ssc = A.to_scipy()
        b = np.asarray(Ssc @ np.ones(A.ncol)).ravel()
        cm = default_common()
        S = umf_symbolic(A, cm)
        N = umf_numeric(A, S, cm)
        x = umf_solve(N, b, "A", A=A, common=cm)
        r = b - Ssc @ x
        comp = np.abs(r) / np.maximum(np.abs(Ssc) @ np.abs(x) + np.abs(b),
                                      1e-300)
        assert comp.max() < 1e-10
