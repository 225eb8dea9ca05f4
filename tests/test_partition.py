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


class TestQPWaterdance:
    """QP gradient projection + napsack projection (Mongoose_QPGradProj /
    Mongoose_QPNapsack / Mongoose_Waterdance equivalents)."""

    def test_napsack_projection_feasible(self):
        from suitesparse_tpu.graph.partition import _napsack_project
        rng = np.random.default_rng(0)
        for _ in range(20):
            n = 50
            y = rng.standard_normal(n) * 2
            a = rng.random(n) + 0.1
            lo, hi = 0.4 * a.sum() * 0.5, 0.6 * a.sum() * 0.5
            x = _napsack_project(y, a, lo, hi)
            assert np.all(x >= -1e-12) and np.all(x <= 1 + 1e-12)
            assert lo - 1e-6 * a.sum() <= a @ x <= hi + 1e-6 * a.sum()

    def test_napsack_projection_identity_inside(self):
        from suitesparse_tpu.graph.partition import _napsack_project
        y = np.array([0.2, 0.8, 0.5])
        a = np.ones(3)
        x = _napsack_project(y, a, 1.0, 2.0)
        assert np.allclose(x, y)   # already feasible -> unchanged

    def test_qp_only_partition(self):
        A = generators.laplacian_2d(24)
        res = edge_cut(A, EdgeCutOptions(use_fm=False, random_seed=1,
                                         qp_iters=60, waterdance_rounds=3))
        assert res.cut_cost <= 4 * 2 * 24      # sane cut without FM
        assert res.imbalance < 0.13

    def test_waterdance_no_worse_than_fm(self):
        A = generators.laplacian_2d(20)
        fm = edge_cut(A, EdgeCutOptions(use_qp=False, random_seed=2))
        wd = edge_cut(A, EdgeCutOptions(random_seed=2))
        assert wd.cut_cost <= fm.cut_cost + 1e-9
