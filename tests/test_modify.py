"""CHOLMOD/Modify tests: updown, rowadd, rowdel round trips vs fresh
factorization."""
import numpy as np
import pytest
import scipy.sparse as sp

from suitesparse_tpu.cholesky import (factorize_simplicial, residual_norm,
                                      rowadd, rowdel, solve, updown,
                                      updown_solve)
from suitesparse_tpu.core.sparse import SparseCSC
from suitesparse_tpu.core.status import SparseError
from suitesparse_tpu.io import generators


class TestUpdown:
    def test_rank1_and_rank3_update(self):
        A = generators.random_spd(50, 0.08, seed=0)
        f = factorize_simplicial(A)
        rng = np.random.default_rng(1)
        for k in (1, 3):
            C = sp.random(50, k, density=0.15, random_state=rng, format="csc")
            f2 = updown(f, SparseCSC.from_scipy(C), update=True)
            A2 = SparseCSC.from_scipy((A.to_scipy() + C @ C.T).tocsc())
            b = rng.standard_normal(50)
            assert residual_norm(A2, solve(f2, b), b) < 1e-13

    def test_update_then_downdate_identity(self):
        A = generators.random_spd(40, 0.1, seed=2)
        f = factorize_simplicial(A)
        C = sp.random(40, 2, density=0.2,
                      random_state=np.random.default_rng(3), format="csc")
        Cs = SparseCSC.from_scipy(C)
        f3 = updown(updown(f, Cs, True), Cs, False)
        b = np.ones(40)
        assert residual_norm(A, solve(f3, b), b) < 1e-12

    def test_downdate_to_indefinite_raises(self):
        A = generators.random_spd(20, 0.2, seed=4)
        f = factorize_simplicial(A)
        # C C' with huge values -> A - CC' indefinite
        C = sp.csc_matrix(100.0 * np.ones((20, 1)))
        with pytest.raises(SparseError):
            updown(f, SparseCSC.from_scipy(C), update=False)

    def test_updown_solve(self):
        A = generators.random_spd(30, 0.15, seed=5)
        f = factorize_simplicial(A)
        C = sp.random(30, 1, density=0.3,
                      random_state=np.random.default_rng(6), format="csc")
        b = np.arange(30, dtype=float)
        f2, x = updown_solve(f, SparseCSC.from_scipy(C), b, update=True)
        A2 = SparseCSC.from_scipy((A.to_scipy() + C @ C.T).tocsc())
        assert residual_norm(A2, x, b) < 1e-13

    def test_pattern_growth(self):
        """Update with entries outside L's pattern must grow the factor."""
        A = SparseCSC.from_scipy(sp.diags([4.0] * 30).tocsc())
        f = factorize_simplicial(A)
        C = sp.csc_matrix((np.array([1.0, 1.0]), (np.array([2, 27]),
                                                  np.array([0, 0]))),
                          shape=(30, 1))
        f2 = updown(f, SparseCSC.from_scipy(C), True)
        A2 = SparseCSC.from_scipy((A.to_scipy() + C @ C.T).tocsc())
        b = np.ones(30)
        assert residual_norm(A2, solve(f2, b), b) < 1e-14


class TestRowAddDel:
    def test_round_trip(self):
        A = generators.random_spd(40, 0.1, seed=7)
        f = factorize_simplicial(A)
        b = np.random.default_rng(8).standard_normal(40)
        j = 13
        fd = rowdel(f, j)
        Ad = A.to_scipy().tolil()
        colj = A.to_scipy()[:, j].toarray().ravel()
        Ad[j, :] = 0
        Ad[:, j] = 0
        Ad[j, j] = 1.0
        Ads = SparseCSC.from_scipy(Ad.tocsc())
        assert residual_norm(Ads, solve(fd, b), b) < 1e-12
        cj = SparseCSC.from_scipy(sp.csc_matrix(colj.reshape(-1, 1)))
        fa = rowadd(fd, j, cj)
        assert residual_norm(A, solve(fa, b), b) < 1e-12

    def test_rowadd_requires_column_shape(self):
        A = generators.random_spd(10, 0.3, seed=9)
        f = factorize_simplicial(A)
        bad = SparseCSC.from_scipy(sp.identity(10).tocsc())
        with pytest.raises(SparseError):
            rowadd(f, 0, bad)
