"""SPQR-class sparse QR tests (reference model: SPQR/Tcov + qrdemo)."""
import numpy as np
import pytest
import scipy.sparse as sp

from suitesparse_tpu.core.common import default_common
from suitesparse_tpu.core.sparse import SparseCSC
from suitesparse_tpu.qr import qr_factorize, qr_rsolve, qr_solve, qr_symbolic


def _rand_tall(m, n, d, seed):
    rng = np.random.default_rng(seed)
    S = sp.random(m, n, density=d, random_state=rng, format="csc")
    S = S + sp.csc_matrix((np.ones(n) * 0.5,
                           (rng.integers(0, m, n), np.arange(n))),
                          shape=(m, n))
    return S.tocsc()


class TestQR:
    @pytest.mark.parametrize("m,n,d,seed", [(60, 40, 0.2, 0),
                                            (150, 90, 0.06, 1),
                                            (80, 80, 0.1, 2)])
    def test_least_squares_matches_lstsq(self, m, n, d, seed):
        S = _rand_tall(m, n, d, seed)
        A = SparseCSC.from_scipy(S)
        b = np.random.default_rng(seed).standard_normal(m)
        x = qr_solve(A, b)
        x_ref, *_ = np.linalg.lstsq(S.toarray(), b, rcond=None)
        assert np.linalg.norm(S @ x - b) == pytest.approx(
            np.linalg.norm(S @ x_ref - b), rel=1e-9)
        assert np.abs(x - x_ref).max() < 1e-9

    def test_r_factor_valid(self):
        """R from the factorization satisfies ||A'A - R'R|| small."""
        S = _rand_tall(70, 45, 0.15, 3)
        A = SparseCSC.from_scipy(S)
        cm = default_common()
        Ssym = qr_symbolic(A, cm)
        num = qr_factorize(A, Ssym)
        # reconstruct R from panels
        ss = Ssym.ss
        h = np.asarray(num.Rbuf)
        n = 45
        R = np.zeros((n, n))
        for s in range(ss.nsuper):
            ms, ns_ = ss.panel_shape(s)
            Np, Mp = int(ss.panel_Np[s]), int(ss.panel_Mp[s])
            o = int(ss.panel_off[s])
            pn = h[o:o + Mp * Np].reshape(Mp, Np)
            j1 = int(ss.super[s])
            rows_s = ss.rows_of(s)
            vals = np.concatenate([pn[:ns_, :], pn[Np:Np + (ms - ns_), :]],
                                  axis=0)
            for t in range(ns_):
                R[j1 + t, rows_s] = vals[:, t]
        AtA = (S.T @ S).toarray()
        p = Ssym.sym.perm
        assert np.abs(R.T @ R - AtA[np.ix_(p, p)]).max() < 1e-8

    def test_rank_detection(self):
        rng = np.random.default_rng(4)
        S = sp.random(50, 30, density=0.3, random_state=rng).tolil()
        S[:, 7] = S[:, 3]       # duplicate column -> rank 29
        A = SparseCSC.from_scipy(S.tocsc())
        cm = default_common()
        x = qr_solve(A, rng.standard_normal(50), cm)
        assert cm.info["qr_rank"] == 29
        from suitesparse_tpu.core.status import Status
        assert cm.status == Status.SINGULAR
        assert np.isfinite(x).all()

    def test_multi_rhs(self):
        S = _rand_tall(60, 35, 0.2, 5)
        A = SparseCSC.from_scipy(S)
        B = np.random.default_rng(5).standard_normal((60, 3))
        X = qr_solve(A, B)
        X_ref, *_ = np.linalg.lstsq(S.toarray(), B, rcond=None)
        assert np.abs(X - X_ref).max() < 1e-9

    def test_underdetermined_raises(self):
        S = _rand_tall(20, 40, 0.3, 6)[:20, :]
        A = SparseCSC.from_scipy(sp.csc_matrix(S))
        with pytest.raises(NotImplementedError):
            qr_solve(A, np.ones(20))

    def test_tol_override(self):
        S = _rand_tall(40, 25, 0.3, 7)
        A = SparseCSC.from_scipy(S)
        cm = default_common()
        qr_solve(A, np.ones(40), cm, tol=1e30)   # everything "dead"
        assert cm.info["qr_rank"] == 0
