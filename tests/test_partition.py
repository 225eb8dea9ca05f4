"""Partitioner + nested dissection tests (Mongoose/CHOLMOD-Partition
equivalents)."""
import numpy as np
import pytest

from suitesparse_tpu.graph import EdgeCutOptions, edge_cut, vertex_separator
from suitesparse_tpu.io import generators
from suitesparse_tpu.ordering import amd, amd_info, bisect, nested_dissection


class TestEdgeCut:
    def test_grid_bisection_quality(self):
        A = generators.laplacian_2d(20)
        res = edge_cut(A)
        # each grid edge has weight 2 in A+A'; a perfect bisection cuts 20
        # edges; allow 2x slack
        assert res.cut_cost <= 2 * 2 * 20
        assert res.imbalance < 0.13
        assert set(np.unique(res.partition)) <= {0, 1}

    def test_balance_constraint(self):
        A = generators.laplacian_2d(16)
        res = edge_cut(A, EdgeCutOptions(tolerance=0.05))
        frac = (res.partition == 0).mean()
        assert 0.40 <= frac <= 0.60

    def test_vertex_separator_separates(self):
        A = generators.laplacian_2d(14)
        left, right, sep = vertex_separator(A)
        assert len(left) + len(right) + len(sep) == A.ncol
        # no direct edges between left and right
        S = A.to_scipy().tocsr()
        lset = set(left.tolist())
        rset = set(right.tolist())
        for v in left:
            cols = S.indices[S.indptr[v]:S.indptr[v + 1]]
            assert not (set(cols.tolist()) & rset)

    def test_tiny_graphs(self):
        import scipy.sparse as sp
        from suitesparse_tpu.core.sparse import SparseCSC
        for n in (1, 2, 3):
            A = SparseCSC.from_scipy(sp.identity(n).tocsc())
            res = edge_cut(A)
            assert len(res.partition) == n


class TestNesdis:
    def test_valid_permutation_and_fill(self):
        A = generators.laplacian_3d(10)
        p = nested_dissection(A, nd_small=80)
        assert sorted(p.tolist()) == list(range(A.ncol))
        # within 2x of AMD fill (parity bar tightens in later rounds)
        l_nd = amd_info(A, p)["lnz"]
        l_amd = amd_info(A, amd(A))["lnz"]
        assert l_nd < 2.0 * l_amd

    def test_separator_constraint_structure(self):
        A = generators.laplacian_2d(16)
        p, cmem = nested_dissection(A, nd_small=50, return_cmember=True)
        # separators must be ordered after their subtrees: constraint ids
        # ascend along the permutation
        assert np.all(np.diff(cmem[p]) >= 0)

    def test_bisect_membership(self):
        A = generators.laplacian_2d(12)
        m = bisect(A)
        assert set(np.unique(m)) <= {0, 1, 2}
        assert (m == 2).sum() < A.ncol // 3
