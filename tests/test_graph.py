"""Graph/structure kernel tests — the correctness bedrock (SURVEY.md §7.2).

Oracles: brute-force dense reimplementations and scipy.sparse.csgraph.
"""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from suitesparse_tpu.core.sparse import SYM_UPPER, SparseCSC
from suitesparse_tpu.graph import (btf_order, col_counts, dmperm, ereach,
                                   etree, maxtrans, postorder, reach,
                                   strongcomp, tree_levels)


def _spd_pattern(n, d=0.25, seed=0):
    rng = np.random.default_rng(seed)
    S = sp.random(n, n, density=d, random_state=rng)
    S = S + S.T + sp.identity(n)
    return sp.triu(S).tocsc()


def _etree_dense_oracle(Afull):
    """parent[j] = min{i > j : L[i,j] != 0} via dense Cholesky fill
    simulation (textbook definition)."""
    n = Afull.shape[0]
    pattern = (Afull != 0)
    L = np.zeros((n, n), dtype=bool)
    for j in range(n):
        rows = pattern[:, j] | L[:, :j][:, L[j, :j]].any(axis=1) if j else pattern[:, j]
        L[:, j] = rows
        L[:j, j] = False
    parent = np.full(n, -1)
    for j in range(n):
        below = np.where(L[j + 1:, j])[0]
        if len(below):
            parent[j] = j + 1 + below[0]
    return parent


def _chol_fill_pattern(Afull):
    """Boolean lower-triangular fill pattern of the Cholesky factor."""
    n = Afull.shape[0]
    A = (Afull != 0).astype(float) + n * np.eye(n)
    # symbolic fill via right-looking elimination on the boolean pattern
    P = (Afull != 0)
    P = P | P.T | np.eye(n, dtype=bool)
    L = np.tril(P).copy()
    for k in range(n):
        rows = np.where(L[:, k])[0]
        rows = rows[rows > k]
        for a in rows:
            L[rows[rows >= a], a] = True  # wrong orientation guard below
    # redo cleanly: classic symbolic elimination
    L = np.tril(P).copy()
    for k in range(n):
        rows = np.where(L[k + 1:, k])[0] + k + 1
        for ii, a in enumerate(rows):
            L[rows[ii:], a] = True
    return L


class TestEtree:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_etree_vs_fill_oracle(self, seed):
        U = _spd_pattern(12, seed=seed)
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        parent = etree(A)
        full = (U + U.T).toarray()
        L = _chol_fill_pattern(full)
        n = 12
        expect = np.full(n, -1)
        for j in range(n):
            below = np.where(L[j + 1:, j])[0]
            if len(below):
                expect[j] = j + 1 + below[0]
        assert np.array_equal(parent, expect)

    def test_col_etree_equals_etree_of_ata(self):
        rng = np.random.default_rng(5)
        S = sp.random(15, 10, density=0.3, random_state=rng, format="csc")
        A = SparseCSC.from_scipy(S)
        pc = etree(A, col=True)
        AtA = (S.T @ S).tocsc()
        U = sp.triu(AtA).tocsc()
        As = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        assert np.array_equal(pc, etree(As))

    def test_postorder_valid(self):
        U = _spd_pattern(20, seed=7)
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        parent = etree(A)
        post = postorder(parent)
        assert sorted(post.tolist()) == list(range(20))
        # every node appears after all its descendants
        pos = np.empty(20, dtype=int)
        pos[post] = np.arange(20)
        for j in range(20):
            if parent[j] != -1:
                assert pos[j] < pos[parent[j]]

    def test_tree_levels(self):
        parent = np.array([1, 2, -1, 2])
        assert np.array_equal(tree_levels(parent), [2, 1, 0, 1])


class TestCounts:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_col_counts_vs_dense_fill(self, seed):
        n = 14
        U = _spd_pattern(n, seed=seed)
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        parent = etree(A)
        post = postorder(parent)
        cc = col_counts(A, parent, post)
        L = _chol_fill_pattern((U + U.T).toarray())
        assert np.array_equal(cc, L.sum(axis=0))

    def test_ereach_matches_row_pattern(self):
        n = 10
        U = _spd_pattern(n, seed=9)
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        parent = etree(A)
        L = _chol_fill_pattern((U + U.T).toarray())
        for k in range(n):
            er = ereach(A, k, parent)
            expect = np.where(L[k, :k])[0]
            assert np.array_equal(er, expect), f"row {k}"


class TestBTF:
    def test_maxtrans_full_rank(self):
        rng = np.random.default_rng(11)
        for seed in range(5):
            S = sp.random(12, 12, density=0.3, random_state=rng, format="csc")
            S = S + sp.identity(12)  # guarantees perfect matching exists
            A = SparseCSC.from_scipy(S.tocsc())
            match, nmatch = maxtrans(A)
            assert nmatch == 12
            # match is a valid assignment: match[j] is a row in column j
            for j in range(12):
                rows = A.indices[A.indptr[j]:A.indptr[j + 1]]
                assert match[j] in rows
            assert len(set(match.tolist())) == 12

    def test_maxtrans_equals_scipy_structural_rank(self):
        rng = np.random.default_rng(13)
        for seed in range(8):
            S = sp.random(15, 15, density=0.12, random_state=rng, format="csc")
            A = SparseCSC.from_scipy(S)
            _, nmatch = maxtrans(A)
            assert nmatch == csgraph.structural_rank(S)

    def test_strongcomp_vs_scipy(self):
        rng = np.random.default_rng(17)
        for seed in range(5):
            S = sp.random(20, 20, density=0.08, random_state=rng, format="csc")
            S = S + sp.identity(20)
            n_scipy, labels = csgraph.connected_components(S, connection="strong")
            p, rblocks = strongcomp(S.indptr.astype(np.int64),
                                    S.indices.astype(np.int64), 20)
            assert len(rblocks) - 1 == n_scipy
            # nodes in the same scipy component must be in the same block
            blk = np.empty(20, dtype=int)
            for b in range(len(rblocks) - 1):
                blk[p[rblocks[b]:rblocks[b + 1]]] = b
            for i in range(20):
                for j in range(20):
                    if labels[i] == labels[j]:
                        assert blk[i] == blk[j]

    def test_btf_block_upper_triangular(self):
        rng = np.random.default_rng(19)
        for seed in range(6):
            S = sp.random(18, 18, density=0.1, random_state=rng, format="csc")
            S = S + sp.identity(18)
            A = SparseCSC.from_scipy(S.tocsc())
            res = btf_order(A)
            assert res.nmatch == 18
            C = A.permute(res.p, res.q).to_scipy().toarray()
            # diagonal of each block must be zero-free (matching)
            assert np.all(np.abs(np.diag(C)) > 0)
            # entries strictly below the block diagonal must be zero
            blk = np.empty(18, dtype=int)
            for b in range(res.nblocks):
                blk[res.r[b]:res.r[b + 1]] = b
            ii, jj = np.nonzero(C)
            assert np.all(blk[ii] <= blk[jj]), f"seed {seed}"

    def test_btf_structurally_singular(self):
        # column of zeros -> structural rank n-1, still returns permutations
        S = sp.random(10, 10, density=0.3, random_state=np.random.default_rng(3),
                      format="csc").tolil()
        S[:, 4] = 0
        A = SparseCSC.from_scipy(S.tocsc())
        res = btf_order(A)
        assert res.nmatch <= 9
        assert sorted(res.p.tolist()) == list(range(10))
        assert sorted(res.q.tolist()) == list(range(10))

    def test_dmperm_square_full_rank(self):
        rng = np.random.default_rng(23)
        S = sp.random(12, 12, density=0.2, random_state=rng, format="csc")
        S = S + sp.identity(12)
        A = SparseCSC.from_scipy(S.tocsc())
        res = dmperm(A)
        assert res.structural_rank == 12
        assert sorted(res.p.tolist()) == list(range(12))
        assert sorted(res.q.tolist()) == list(range(12))

    def test_dmperm_rectangular(self):
        rng = np.random.default_rng(29)
        S = sp.random(8, 12, density=0.3, random_state=rng, format="csc")
        A = SparseCSC.from_scipy(S)
        res = dmperm(A)
        assert res.structural_rank == csgraph.structural_rank(S)
        assert sorted(res.p.tolist()) == list(range(8))
        assert sorted(res.q.tolist()) == list(range(12))


class TestReach:
    def test_reach_lower_triangular(self):
        # G = pattern of a lower triangular L; reach = nonzeros of L\b
        rng = np.random.default_rng(31)
        n = 12
        L = sp.tril(sp.random(n, n, density=0.25, random_state=rng) + sp.identity(n)).tocsc()
        b = sp.random(n, 1, density=0.2, random_state=rng).tocsc()
        got = reach(L.indptr.astype(np.int64), L.indices.astype(np.int64),
                    b.indptr.astype(np.int64), b.indices.astype(np.int64), 0)
        # oracle: solve with dense forward substitution on pattern
        x = np.zeros(n, dtype=bool)
        x[b.indices] = True
        for j in range(n):
            if x[j]:
                rows = L.indices[L.indptr[j]:L.indptr[j + 1]]
                x[rows] = True
        assert set(got.tolist()) == set(np.where(x)[0].tolist())
        # topological: j before any i that depends on j
        pos = {int(v): i for i, v in enumerate(got)}
        for j in got:
            for p in range(L.indptr[j], L.indptr[j + 1]):
                i = int(L.indices[p])
                if i != j and i in pos:
                    assert pos[int(j)] < pos[i]
