"""Ordering-stack tests (SURVEY.md §7.7 quality bar: fill within variance
of good minimum-degree orderings)."""
import numpy as np
import pytest
import scipy.sparse as sp

from suitesparse_tpu.core.sparse import SparseCSC
from suitesparse_tpu.io import generators
from suitesparse_tpu.ordering import (amd, amd_info, amd_valid, camd, ccolamd,
                                      colamd, csymamd, symamd)
from suitesparse_tpu.ordering.amd import _amd_python, _symmetric_pattern_nodiag
from suitesparse_tpu.utils.native import has_native


def _lu_fill(S, q):
    """nnz(L+U) of scipy LU of S[:, q] with partial pivoting (fill oracle)."""
    import scipy.sparse.linalg as spla
    lu = spla.splu(S.tocsc()[:, q].tocsc(), permc_spec="NATURAL",
                   diag_pivot_thresh=1.0)
    return lu.L.nnz + lu.U.nnz


class TestAMD:
    def test_native_available(self):
        assert has_native(), "native libsstpu.so must build in this environment"

    @pytest.mark.parametrize("gen,args", [
        ("laplacian_2d", (15,)),
        ("laplacian_3d", (8,)),
        ("random_spd", (150, 0.05)),
        ("random_spd", (80, 0.2)),
    ])
    def test_valid_permutation(self, gen, args):
        A = getattr(generators, gen)(*args)
        p = amd(A)
        assert amd_valid(A.ncol, p)

    def test_quality_matches_exact_min_degree(self):
        """AMD fill must be within 10% of exact minimum degree."""
        for A in [generators.laplacian_2d(16),
                  generators.random_spd(150, 0.04, seed=1),
                  generators.laplacian_3d(7)]:
            p1 = amd(A)
            ip, ii = _symmetric_pattern_nodiag(A)
            p2 = _amd_python(ip, ii, A.ncol)
            l1 = amd_info(A, p1)["lnz"]
            l2 = amd_info(A, p2)["lnz"]
            assert l1 <= 1.10 * l2, (l1, l2)

    def test_beats_natural_on_grids(self):
        A = generators.laplacian_2d(24)
        nat = amd_info(A, np.arange(A.ncol))["lnz"]
        got = amd_info(A, amd(A))["lnz"]
        assert got < 0.6 * nat

    def test_dense_row_postponed(self):
        # arrow matrix: one dense row/col; AMD must order it last
        # (hub degree n-1 must exceed max(16, 10*sqrt(n)) => n >= 102)
        n = 200
        D = sp.lil_matrix((n, n))
        D.setdiag(2.0)
        D[0, :] = 1.0
        D[:, 0] = 1.0
        for i in range(n - 1):
            D[i, i + 1] = D[i + 1, i] = 0.5
        A = SparseCSC.from_scipy(D.tocsc())
        p = amd(A)
        # node 0 is the dense hub: postponement must put it in the final
        # end-game clique (exact last slot can go to an indistinguishable
        # supervariable member, which is valid minimum-degree behavior)
        assert np.where(p == 0)[0][0] >= n - 5

    def test_singleton_and_empty(self):
        A = SparseCSC.from_scipy(sp.identity(5).tocsc())
        assert amd_valid(5, amd(A))
        import suitesparse_tpu.core.sparse as cs
        assert len(amd(cs.spzeros(0, 0))) == 0

    def test_camd_constraints_contiguous(self):
        A = generators.laplacian_2d(10)
        cm = (np.arange(100) % 4).astype(np.int64)
        p = camd(A, cm)
        assert amd_valid(100, p)
        sets = cm[p]
        assert np.all(np.diff(sets) >= 0)

    def test_deterministic(self):
        A = generators.random_spd(120, 0.05, seed=9)
        p1, p2 = amd(A), amd(A)
        assert np.array_equal(p1, p2)


class TestCOLAMD:
    def test_valid_and_reduces_lu_fill(self):
        rng = np.random.default_rng(0)
        S = sp.random(200, 200, density=0.02, random_state=rng, format="csc")
        S = S + sp.identity(200)
        A = SparseCSC.from_scipy(S.tocsc())
        q = colamd(A)
        assert amd_valid(200, q)
        fill_nat = _lu_fill(S, np.arange(200))
        fill_col = _lu_fill(S, q)
        assert fill_col < fill_nat

    def test_colamd_vs_scipy_colamd(self):
        """Within 25% of SuperLU's COLAMD fill on random matrices."""
        import scipy.sparse.linalg as spla
        rng = np.random.default_rng(3)
        S = sp.random(300, 300, density=0.015, random_state=rng, format="csc")
        S = S + sp.identity(300)
        A = SparseCSC.from_scipy(S.tocsc())
        q = colamd(A)
        ours = _lu_fill(S, q)
        lu = spla.splu(S.tocsc(), permc_spec="COLAMD", diag_pivot_thresh=1.0)
        theirs = lu.L.nnz + lu.U.nnz
        assert ours < 1.25 * theirs, (ours, theirs)

    def test_symamd_equals_quality_of_amd(self):
        A = generators.laplacian_2d(12)
        assert amd_info(A, symamd(A))["lnz"] <= 1.05 * amd_info(A, amd(A))["lnz"]

    def test_ccolamd_constraints(self):
        rng = np.random.default_rng(5)
        S = sp.random(80, 80, density=0.05, random_state=rng, format="csc")
        A = SparseCSC.from_scipy((S + sp.identity(80)).tocsc())
        cm = (np.arange(80) % 3).astype(np.int64)
        q = ccolamd(A, cm)
        assert amd_valid(80, q)
        assert np.all(np.diff(cm[q]) >= 0)

    def test_csymamd_constraints(self):
        A = generators.laplacian_2d(9)
        cm = (np.arange(81) // 27).astype(np.int64)
        q = csymamd(A, cm)
        assert amd_valid(81, q)
        assert np.all(np.diff(cm[q]) >= 0)

    def test_dense_row_pruning(self):
        # a matrix with one full row: A'A would be completely dense without
        # pruning; colamd must still run fast and return a valid perm
        n = 400
        S = sp.random(n, n, density=0.01,
                      random_state=np.random.default_rng(7)).tolil()
        S[3, :] = 1.0
        A = SparseCSC.from_scipy(S.tocsc())
        q = colamd(A)
        assert amd_valid(n, q)


class TestNativeColamd:
    """Row-merge native COLAMD (native/src/colamd.cc)."""

    def test_native_is_active_and_valid(self):
        from suitesparse_tpu.ordering.colamd import _native_colamd
        from suitesparse_tpu.utils import native
        if not native.has_native():
            pytest.skip("no toolchain")
        A = generators.random_unsym(300, 0.02, seed=5)
        p = _native_colamd(A, 10.0, 10.0)
        assert p is not None
        assert sorted(p.tolist()) == list(range(300))

    def test_fill_quality_vs_superlu(self):
        """Genuine COLAMD objective: nnz(L+U) within 20% of SuperLU's
        COLAMD on a random LU problem (and often better)."""
        import scipy.sparse.linalg as spla
        from suitesparse_tpu.ordering.colamd import _native_colamd
        from suitesparse_tpu.utils import native
        if not native.has_native():
            pytest.skip("no toolchain")
        rng = np.random.default_rng(1)
        S = (sp.random(800, 800, density=0.005, random_state=rng,
                       format="csc", dtype=np.float64)
             + sp.identity(800, format="csc")).tocsc()
        A = SparseCSC.from_scipy(S)
        p = _native_colamd(A, 10.0, 10.0)
        ours = spla.splu(S[:, p].tocsc(), permc_spec="NATURAL")
        ref = spla.splu(S, permc_spec="COLAMD")
        assert (ours.L.nnz + ours.U.nnz) < 1.2 * (ref.L.nnz + ref.U.nnz)

    def test_rectangular_and_dense_rows(self):
        from suitesparse_tpu.ordering.colamd import _native_colamd
        from suitesparse_tpu.utils import native
        if not native.has_native():
            pytest.skip("no toolchain")
        rng = np.random.default_rng(2)
        S = sp.random(400, 250, density=0.01, random_state=rng,
                      format="lil")
        S[7, :] = 1.0          # dense row: must be dropped, not blow up
        S[:, 3] = 1.0          # dense column: ordered last
        A = SparseCSC.from_scipy(sp.csc_matrix(S))
        p = _native_colamd(A, 10.0, 10.0)
        assert sorted(p.tolist()) == list(range(250))
        assert p[-1] == 3      # the dense column lands at the end

    def test_empty_and_duplicates(self):
        from suitesparse_tpu.ordering.colamd import _native_colamd
        from suitesparse_tpu.utils import native
        if not native.has_native():
            pytest.skip("no toolchain")
        indptr = np.array([0, 2, 2, 4], dtype=np.int64)
        indices = np.array([0, 0, 1, 2], dtype=np.int64)  # dup in col 0
        A = SparseCSC(indptr, indices, None, (3, 3))
        p = _native_colamd(A, 10.0, 10.0)
        assert sorted(p.tolist()) == [0, 1, 2]
