"""Serialization, SLIP exact solve, Check module, solve extras."""
from fractions import Fraction

import numpy as np
import pytest
import scipy.sparse as sp

from suitesparse_tpu.cholesky import (analyze, factorize_simplicial,
                                      factorize_super, lsolve_pattern,
                                      resymbol, solve, solve2, solve_super,
                                      spsolve, super_symbolic)
from suitesparse_tpu.core import (check_factor, check_parent, check_perm,
                                  check_sparse, print_common, print_factor,
                                  print_sparse)
from suitesparse_tpu.core.common import default_common
from suitesparse_tpu.core.sparse import SparseCSC
from suitesparse_tpu.io import generators
from suitesparse_tpu.lu import (klu_analyze, klu_factor, klu_solve,
                                slip_backslash)
from suitesparse_tpu.utils import (load_factor, load_klu, load_sparse,
                                   load_super_factor, save_factor, save_klu,
                                   save_sparse, save_super_factor)


class TestSerialize:
    def test_sparse_roundtrip(self, tmp_path):
        A = generators.random_unsym(30, 0.1, seed=1)
        save_sparse(tmp_path / "a.npz", A)
        B = load_sparse(tmp_path / "a.npz")
        assert np.allclose(B.to_scipy().toarray(), A.to_scipy().toarray())

    def test_factor_roundtrip(self, tmp_path):
        A = generators.random_spd(25, 0.15, seed=2)
        f = factorize_simplicial(A)
        save_factor(tmp_path / "f.npz", f)
        f2 = load_factor(tmp_path / "f.npz")
        b = np.ones(25)
        assert np.allclose(solve(f, b), solve(f2, b))

    def test_super_factor_roundtrip(self, tmp_path):
        A = generators.laplacian_2d(9)
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        sym = analyze(A, cm)
        ss = super_symbolic(A, sym, cm)
        f = factorize_super(A, sym, ss, common=cm)
        save_super_factor(tmp_path / "sf.npz", f)
        f2 = load_super_factor(tmp_path / "sf.npz")
        b = np.ones(81)
        assert np.allclose(solve_super(f, b), solve_super(f2, b))

    def test_klu_roundtrip(self, tmp_path):
        A = generators.random_unsym(35, 0.08, seed=3)
        num = klu_factor(A, klu_analyze(A))
        save_klu(tmp_path / "k.npz", num)
        num2 = load_klu(tmp_path / "k.npz")
        b = np.ones(35)
        assert np.allclose(klu_solve(num, b), klu_solve(num2, b))

    def test_umf_numeric_roundtrip(self, tmp_path):
        """umfpack_save_numeric / load_numeric: loaded object is standalone
        for solve (umfpack_save_numeric.c:33)."""
        from suitesparse_tpu.lu import umf_numeric, umf_solve, umf_symbolic
        from suitesparse_tpu.utils import load_umf_numeric, save_umf_numeric
        A = generators.random_unsym(60, 0.06, seed=11)
        num = umf_numeric(A, umf_symbolic(A))
        save_umf_numeric(tmp_path / "u.npz", num)
        num2 = load_umf_numeric(tmp_path / "u.npz")
        b = np.arange(60, dtype=float)
        for system in ("A", "At"):
            x1 = umf_solve(num, b, system, A=A)
            x2 = umf_solve(num2, b, system, A=A)
            assert np.allclose(x1, x2)

    def test_umf_numeric_roundtrip_btf(self, tmp_path):
        """Round-trip through the BTF/singleton recursion."""
        import scipy.sparse as sp
        from suitesparse_tpu.lu import umf_numeric, umf_solve, umf_symbolic
        from suitesparse_tpu.utils import load_umf_numeric, save_umf_numeric
        rng = np.random.default_rng(5)
        n1, n2 = 9, 14
        M = sp.lil_matrix((n1 + n2, n1 + n2))
        M[:n1, :n1] = rng.standard_normal((n1, n1)) + 4 * np.eye(n1)
        M[n1:, n1:] = rng.standard_normal((n2, n2)) + 4 * np.eye(n2)
        M[2, n1 + 3] = 1.0
        A = SparseCSC.from_scipy(M.tocsc())
        num = umf_numeric(A, umf_symbolic(A))
        assert num.bnums is not None
        save_umf_numeric(tmp_path / "ub.npz", num)
        num2 = load_umf_numeric(tmp_path / "ub.npz")
        b = np.ones(n1 + n2)
        assert np.allclose(umf_solve(num, b, A=A), umf_solve(num2, b, A=A))

    def test_umf_symbolic_roundtrip(self, tmp_path):
        """umfpack_save_symbolic: loaded symbolic accepts a fresh numeric
        factorization (new values, same pattern)."""
        from suitesparse_tpu.lu import umf_numeric, umf_solve, umf_symbolic
        from suitesparse_tpu.utils import (load_umf_symbolic,
                                           save_umf_symbolic)
        A = generators.random_unsym(50, 0.07, seed=13)
        S = umf_symbolic(A)
        save_umf_symbolic(tmp_path / "s.npz", S)
        S2 = load_umf_symbolic(tmp_path / "s.npz")
        A2 = SparseCSC(A.indptr, A.indices, A.data * 2.5, A.shape)
        num = umf_numeric(A2, S2)
        b = np.ones(50)
        x = umf_solve(num, b, A=A2)
        from suitesparse_tpu.cholesky import residual_norm
        assert residual_norm(A2, x, b) < 1e-10

    def test_wrong_kind_rejected(self, tmp_path):
        from suitesparse_tpu.core.status import SparseError
        A = generators.random_spd(10, 0.3, seed=4)
        save_sparse(tmp_path / "a.npz", A)
        with pytest.raises(SparseError):
            load_factor(tmp_path / "a.npz")


class TestSlip:
    def test_exact_integer_solve(self):
        rng = np.random.default_rng(5)
        n = 25
        M = sp.random(n, n, density=0.2, random_state=rng, format="csc")
        M.data = np.round(M.data * 9)
        M = sp.csc_matrix(M + 7 * sp.identity(n))
        A = SparseCSC.from_scipy(M)
        b = rng.integers(-9, 9, n).astype(float)
        x = slip_backslash(A, b)
        D = M.toarray()
        res = [sum(Fraction(D[i, j].item()) * x[j] for j in range(n))
               - Fraction(b[i].item()) for i in range(n)]
        assert all(r == 0 for r in res)       # EXACT zero residual

    def test_pivot_schemes(self):
        A = generators.random_unsym(15, 0.2, seed=6)
        b = np.ones(15)
        for scheme in ("smallest", "largest", "first", "diagonal"):
            x = slip_backslash(A, b, pivot=scheme)
            xf = np.array([float(v) for v in x])
            assert np.abs(A.to_scipy() @ xf - b).max() < 1e-9

    def test_singular_exact(self):
        from suitesparse_tpu.core.status import SparseError
        S = sp.csc_matrix(np.array([[1.0, 2.0], [2.0, 4.0]]))
        with pytest.raises(SparseError):
            slip_backslash(SparseCSC.from_scipy(S), np.ones(2))


class TestCheckModule:
    def test_checks(self):
        A = generators.random_spd(20, 0.2, seed=7)
        assert check_sparse(A)
        f = factorize_simplicial(A)
        assert check_factor(f)
        assert check_perm(f.perm, 20)
        assert check_parent(f.symbolic.parent)
        assert not check_perm([0, 0, 1], 3)

    def test_print_routing(self):
        lines = []
        cm = default_common()
        cm.print_func = lines.append
        cm.print_level = 4
        A = generators.random_spd(5, 0.5, seed=8)
        print_sparse(A, "A", cm)
        print_factor(factorize_simplicial(A, common=cm), "L", cm)
        print_common(cm)
        assert any("5-by-5" in l for l in lines)
        assert any("LDL'" in l for l in lines)


class TestSolveExtras:
    def test_spsolve_sparse_rhs(self):
        A = generators.random_spd(30, 0.15, seed=9)
        f = factorize_simplicial(A)
        B = SparseCSC.from_scipy(sp.random(30, 3, density=0.2,
                                 random_state=np.random.default_rng(10),
                                 format="csc"))
        X = spsolve(f, B)
        assert np.abs(A.to_scipy() @ X.to_scipy().toarray()
                      - B.to_scipy().toarray()).max() < 1e-10

    def test_solve2_subset_matches_full(self):
        A = generators.random_spd(40, 0.1, seed=11)
        f = factorize_simplicial(A)
        b = np.zeros(40)
        bset = np.array([3, 17, 25])
        b[bset] = [1.0, -2.0, 0.5]
        x_full = solve(f, b)
        x_sub, xset = solve2(f, b, bset)
        assert np.allclose(x_sub, x_full, atol=1e-12)
        assert set(np.nonzero(np.round(x_full, 12))[0]).issubset(set(xset.tolist()))

    def test_lsolve_pattern(self):
        A = generators.random_spd(20, 0.15, seed=12)
        f = factorize_simplicial(A)
        B = SparseCSC.from_scipy(sp.random(20, 1, density=0.2,
                                 random_state=np.random.default_rng(13),
                                 format="csc"))
        patt = lsolve_pattern(f, B, 0)
        # oracle: nonzeros of the actual forward solve
        b = B.to_scipy().toarray().ravel()
        pb = b[f.perm]
        from suitesparse_tpu.cholesky import lsolve
        y = lsolve(f, pb)
        assert set(np.nonzero(y)[0]).issubset(set(patt.tolist()))

    def test_resymbol(self):
        A = generators.random_spd(25, 0.2, seed=14)
        f = factorize_simplicial(A)
        A2 = A.drop(0.05)   # prune small entries
        f2 = resymbol(A2, f)
        b = np.ones(25)
        assert np.abs(A2.to_scipy().toarray() @ solve(f2, b) - b).max() < 1e-8


class TestMatlabToolsRemainder:
    """Round-3 MATLAB_Tools closure: sparseinv / meshnd / ssmult-sfmult."""

    def test_sparseinv_matches_dense_inverse_on_pattern(self):
        from suitesparse_tpu.io.fixtures import load
        from suitesparse_tpu.models.sparseinv import sparseinv
        for name in ("west0067", "bcsstk01"):
            A = load(name)
            if A.stype:
                A = A.to_full_storage()
            Z, Zp = sparseinv(A)
            S = np.linalg.inv(A.to_scipy().toarray())
            mask = Zp.toarray()
            err = (np.abs(np.where(mask, Z.toarray() - S, 0.0)).max()
                   / np.abs(S).max())
            assert err < 1e-10, name
            # substantial coverage (the reference guarantees the full
            # diagonal only in its Cholesky mode)
            assert Zp.nnz > A.nnz

    def test_meshnd_ordering_beats_natural(self):
        from suitesparse_tpu.models.meshnd import meshnd, meshsparse
        import scipy.sparse as sp
        G, p, pinv, Gnew = meshnd(8, 8)
        assert sorted(p.tolist()) == list(range(64))
        assert (pinv[p] == np.arange(64)).all()
        A = meshsparse(G, 5)
        assert A.shape == (64, 64)
        S = A.to_scipy() + 4.1 * sp.eye(64)          # SPD shift
        from suitesparse_tpu.cholesky import analyze
        from suitesparse_tpu.core.sparse import SparseCSC
        Ac = SparseCSC.from_scipy(S.tocsc())
        sym_nat = analyze(Ac, perm=np.arange(64))
        sym_nd = analyze(Ac, perm=p)
        assert sym_nd.lnz <= sym_nat.lnz             # ND reduces fill

    def test_meshnd_3d(self):
        from suitesparse_tpu.models.meshnd import meshnd, meshsparse
        G, p, pinv, Gnew = meshnd(4, 4, 4)
        assert G.shape == (4, 4, 4)
        A = meshsparse(G, 7)
        assert A.shape == (64, 64)
        d = A.to_scipy().diagonal()
        assert d.max() == 6 and d.min() == 3          # corner/interior degs

    def test_ssmult_sfmult(self):
        import scipy.sparse as sp
        from suitesparse_tpu.models.ssmult import sfmult, ssmult
        rng = np.random.default_rng(0)
        Sa = sp.random(30, 25, 0.2, random_state=rng).tocsc()
        Sb = sp.random(25, 28, 0.2, random_state=rng).tocsc()
        A = SparseCSC.from_scipy(Sa)
        B = SparseCSC.from_scipy(Sb)
        C = ssmult(A, B)
        assert abs(C.to_scipy() - Sa @ Sb).max() < 1e-12
        Ct = ssmult(A, A, at=True)
        assert abs(Ct.to_scipy() - Sa.T @ Sa).max() < 1e-12
        X = rng.standard_normal((25, 3))
        Y = sfmult(A, X)
        assert np.allclose(Y, Sa @ X)
        Yt = sfmult(A, rng.standard_normal(30), at=True)
        assert Yt.shape == (25,)
