"""Cholesky engine tests: simplicial oracle, supernodal vs oracle, solve
systems, mixed precision + refinement, graceful failure.

Residual bar = the reference protocol ||Ax-b||inf/(||A||1 ||x||inf + ||b||inf)
(CHOLMOD/Demo/cholmod_demo.c:453-503).
"""
import numpy as np
import pytest
import scipy.sparse as sp

from suitesparse_tpu.cholesky import (CholeskySolver, Symbolic, analyze,
                                      build_plan, cholesky, factorize_simplicial,
                                      factorize_super, residual_norm, rcond,
                                      solve, solve_super, spsolve_chol,
                                      super_symbolic)
from suitesparse_tpu.core.common import default_common
from suitesparse_tpu.core.sparse import SparseCSC
from suitesparse_tpu.io import generators


def _spd(n=120, seed=0):
    return generators.random_spd(n, 4.0 / n, seed=seed)


class TestAnalyze:
    def test_symbolic_reuse_contract(self):
        A = generators.laplacian_2d(10)
        cm = default_common()
        sym = analyze(A, cm)
        assert sym.lnz == int(sym.colcount.sum())
        assert cm.info["ordering"] == "amd"
        # supernodal switch policy
        assert sym.is_super == (sym.flops / sym.lnz >= cm.cholesky.supernodal_switch)

    def test_given_permutation(self):
        A = _spd(50)
        p = np.random.default_rng(3).permutation(50)
        sym = analyze(A, perm=p)
        assert np.array_equal(np.sort(sym.perm), np.arange(50))
        assert sym.method == "given"

    def test_supernodal_mode_override(self):
        A = generators.laplacian_2d(8)
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        assert analyze(A, cm).is_super
        cm.cholesky.supernodal = "simplicial"
        assert not analyze(A, cm).is_super


class TestSimplicial:
    @pytest.mark.parametrize("ll", [False, True])
    def test_factor_reconstructs(self, ll):
        A = _spd(100)
        f = factorize_simplicial(A, ll=ll)
        assert f.ok
        L = f.L_scipy().toarray()
        R = L @ L.T if ll else L @ np.diag(f.D) @ L.T
        D = A.to_scipy().toarray()
        assert np.allclose(R, D[np.ix_(f.perm, f.perm)], atol=1e-10 * np.abs(D).max())

    def test_all_solve_systems(self):
        A = _spd(80)
        f = factorize_simplicial(A)
        rng = np.random.default_rng(1)
        b = rng.standard_normal(80)
        D = A.to_scipy().toarray()
        x = solve(f, b, "A")
        assert residual_norm(A, x, b) < 1e-14
        # composition identities
        for sys_ in ["L", "Lt", "D", "LD", "DLt", "LDLt", "P", "Pt"]:
            y = solve(f, b, sys_)
            assert y.shape == b.shape
        # P/Pt are inverse permutations
        assert np.allclose(solve(f, solve(f, b, "P"), "Pt"), b)
        # A == Pt(LDLt(P b))
        z = solve(f, solve(f, solve(f, b, "P"), "LDLt"), "Pt")
        assert np.allclose(z, x)

    def test_not_posdef_graceful(self):
        M = sp.csc_matrix(np.array([[2.0, 0, 0], [0, -5.0, 0], [0, 0, 3.0]]))
        cm = default_common()
        f = factorize_simplicial(SparseCSC.from_scipy(M), common=cm, ll=True)
        from suitesparse_tpu.core.status import Status
        assert cm.status == Status.NOT_POSDEF
        assert not f.ok and 0 <= f.minor < 3

    def test_dbound_perturbation(self):
        M = sp.csc_matrix(np.diag([1.0, 1e-30, 2.0]))
        cm = default_common()
        cm.cholesky.dbound = 1e-12
        f = factorize_simplicial(SparseCSC.from_scipy(M), common=cm)
        from suitesparse_tpu.core.status import Status
        assert cm.status == Status.DSMALL
        assert f.D[np.argmin(np.abs(f.D))] == pytest.approx(1e-12)

    def test_rcond_and_logdet(self):
        A = _spd(40)
        f = factorize_simplicial(A, ll=True)
        D = A.to_scipy().toarray()
        assert f.logdet() == pytest.approx(np.linalg.slogdet(D)[1], rel=1e-8)
        assert 0 < rcond(f) <= 1

    def test_multi_rhs(self):
        A = _spd(60)
        f = factorize_simplicial(A)
        B = np.random.default_rng(2).standard_normal((60, 4))
        X = solve(f, B)
        assert np.abs(A.to_scipy() @ X - B).max() < 1e-10


class TestSupernodal:
    @pytest.mark.parametrize("gen,arg", [("laplacian_2d", 12),
                                         ("laplacian_3d", 7),
                                         ("random_spd", 300)])
    def test_matches_simplicial_oracle(self, gen, arg):
        A = getattr(generators, gen)(arg)
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        sym = analyze(A, cm)
        ss = super_symbolic(A, sym, cm)
        f = factorize_super(A, sym, ss, common=cm)
        assert f.ok
        # supernode partition invariants
        assert ss.super[0] == 0 and ss.super[-1] == A.ncol
        assert np.all(np.diff(ss.super) >= 1)
        # factor equals the simplicial oracle computed with the same perm
        L = f.to_simplicial().L_scipy().toarray()
        D = A.to_scipy().toarray()
        P = D[np.ix_(f.perm, f.perm)]
        assert np.abs(L @ L.T - P).max() < 1e-10 * np.abs(D).max()

    def test_solve_and_residual(self):
        A = generators.laplacian_3d(8)
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        sym = analyze(A, cm)
        ss = super_symbolic(A, sym, cm)
        f = factorize_super(A, sym, ss, common=cm)
        rng = np.random.default_rng(5)
        b = rng.standard_normal(A.ncol)
        x = solve_super(f, b)
        assert residual_norm(A, x, b) < 1e-14
        B = rng.standard_normal((A.ncol, 3))
        X = solve_super(f, B)
        assert residual_norm(A, X[:, 1], B[:, 1]) < 1e-14
        # L / Lt round trip
        y = solve_super(f, b, "L")
        z = solve_super(f, y, "Lt")
        assert np.allclose(z, solve_super(f, b, "LLt"))

    def test_refactorize_same_pattern(self):
        """klu_refactor-style reuse: same pattern, new values, no re-analysis."""
        A1 = _spd(150, seed=1)
        A2 = SparseCSC(A1.indptr.copy(), A1.indices.copy(),
                       A1.data * 2.0 + 0.0, A1.shape, stype=A1.stype)
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        sym = analyze(A1, cm)
        ss = super_symbolic(A1, sym, cm)
        plan = build_plan(ss)
        f1 = factorize_super(A1, sym, ss, plan, cm)
        f2 = factorize_super(A2, sym, ss, plan, cm)
        b = np.random.default_rng(0).standard_normal(150)
        assert residual_norm(A1, solve_super(f1, b), b) < 1e-13
        assert residual_norm(A2, solve_super(f2, b), b) < 1e-13

    def test_not_posdef_detected(self):
        n = 50
        S = generators.random_spd(n, 0.1, seed=2).to_scipy().tolil()
        S[n // 2, n // 2] = -100.0
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        A = SparseCSC.from_scipy(S.tocsc())
        sym = analyze(A, cm)
        ss = super_symbolic(A, sym, cm)
        f = factorize_super(A, sym, ss, common=cm)
        from suitesparse_tpu.core.status import Status
        assert cm.status == Status.NOT_POSDEF
        assert not f.ok

    def test_float32_with_refinement(self):
        A = generators.laplacian_2d(14)
        b = np.random.default_rng(7).standard_normal(A.ncol)
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        x = spsolve_chol(A, b, cm, dtype=np.float32, refine_steps=3)
        assert residual_norm(A, x, b) < 1e-12  # refinement recovers f64 bar


class TestAPI:
    def test_cholesky_auto_and_solver_handle(self):
        A = generators.laplacian_2d(10)
        solver = cholesky(A)
        b = np.ones(A.ncol)
        x = solver.solve(b)
        assert residual_norm(A, x, b) < 1e-13
        # refactorize with scaled values reuses symbolic
        A2 = SparseCSC(A.indptr, A.indices, A.data * 3.0, A.shape, stype=A.stype)
        solver.refactorize(A2)
        x2 = solver.solve(b)
        assert residual_norm(A2, x2, b) < 1e-13
        assert np.allclose(x2, x / 3.0, atol=1e-10)

    def test_spsolve_matches_scipy(self):
        A = _spd(90, seed=4)
        b = np.random.default_rng(4).standard_normal(90)
        import scipy.sparse.linalg as spla
        x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
        x = spsolve_chol(A, b)
        assert np.allclose(x, x_ref, rtol=1e-8)


class TestRowfac:
    """Incremental row factorization (cholmod_rowfac / rowfac_mask)."""

    def _spd(self, n, seed):
        rng = np.random.default_rng(seed)
        B = sp.random(n, n, density=0.08, random_state=rng, format="csc")
        return SparseCSC.from_scipy((B @ B.T + n * sp.identity(n)).tocsc())

    def test_incremental_matches_full(self):
        from suitesparse_tpu.cholesky import (alloc_factor, rowfac,
                                              factorize_simplicial)
        A = self._spd(60, 0)
        full = factorize_simplicial(A)
        f = alloc_factor(A)
        f = rowfac(A, f, 0, 25)
        assert f.nrows_done == 25
        f = rowfac(A, f, 25, 60)
        assert f.ok
        assert np.allclose(f.Lx, full.Lx)
        assert np.allclose(f.D, full.D)
        b = np.arange(60, dtype=float)
        x = solve(f, b)
        assert residual_norm(A, x, b) < 1e-12

    def test_wrong_start_raises(self):
        from suitesparse_tpu.cholesky import alloc_factor, rowfac
        from suitesparse_tpu.core.status import SparseError
        A = self._spd(20, 1)
        f = alloc_factor(A)
        with pytest.raises(SparseError):
            rowfac(A, f, 5, 10)

    def test_rowfac_mask_equals_masked_matrix(self):
        from suitesparse_tpu.cholesky import alloc_factor, rowfac_mask
        A = self._spd(40, 2)
        mask = np.zeros(40, dtype=bool)
        mask[[3, 17, 29]] = True
        f = alloc_factor(A)
        f = rowfac_mask(A, f, 0, 40, mask)
        # oracle: A with masked rows/cols replaced by identity rows
        S = A.to_scipy().tolil()
        for i in np.where(mask)[0]:
            S[i, :] = 0.0
            S[:, i] = 0.0
            S[i, i] = 1.0
        Am = SparseCSC.from_scipy(S.tocsc())
        b = np.ones(40)
        x = solve(f, b)
        assert residual_norm(Am, x, b) < 1e-12
