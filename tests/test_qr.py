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

    def test_min2norm_underdetermined(self):
        """m < n: qr_solve gives the minimum 2-norm solution (QR of A')."""
        rng = np.random.default_rng(6)
        S = _rand_tall(40, 20, 0.3, 6).T.tocsc()    # 20 x 40, full row rank
        A = SparseCSC.from_scipy(sp.csc_matrix(S))
        b = rng.standard_normal(20)
        x = qr_solve(A, b)
        assert np.linalg.norm(S @ x - b, np.inf) < 1e-8
        x_ref = np.linalg.pinv(S.toarray()) @ b      # min-norm solution
        assert np.linalg.norm(x) == pytest.approx(np.linalg.norm(x_ref),
                                                  rel=1e-8)
        assert np.abs(x - x_ref).max() < 1e-8

    def test_tol_override(self):
        S = _rand_tall(40, 25, 0.3, 7)
        A = SparseCSC.from_scipy(S)
        cm = default_common()
        qr_solve(A, np.ones(40), cm, tol=1e30)   # everything "dead"
        assert cm.info["qr_rank"] == 0


class TestQmult:
    """SuiteSparseQR_qmult equivalents (keep_q=True retains front Qs)."""

    def _factor(self, m=50, n=30, d=0.2, seed=8):
        S = _rand_tall(m, n, d, seed)
        A = SparseCSC.from_scipy(S)
        Ssym = qr_symbolic(A)
        num = qr_factorize(A, Ssym, keep_q=True)
        return S, A, Ssym, num

    def test_qtx_isometry_and_inverse(self):
        from suitesparse_tpu.qr import qr_qmult
        S, A, Ssym, num = self._factor()
        rng = np.random.default_rng(8)
        X = rng.standard_normal((50, 2))
        Y = qr_qmult(num, X, "QTX")
        # isometry: norms preserved columnwise
        assert np.linalg.norm(Y, axis=0) == pytest.approx(
            np.linalg.norm(X, axis=0), rel=1e-10)
        # Q (Q' X) == X
        Xr = qr_qmult(num, Y, "QX")
        assert np.abs(Xr - X).max() < 1e-10

    def test_qtx_reproduces_r(self):
        """Q'A (cols permuted) has R in its pivotal rows."""
        from suitesparse_tpu.qr import qr_qmult, qr_q
        S, A, Ssym, num = self._factor(40, 25, 0.25, 9)
        p = Ssym.sym.perm
        QtA = qr_qmult(num, S[:, p].toarray(), "QTX")
        n = 25
        # below-pivotal rows of Q'A must vanish (R is upper-triangular n x n)
        assert np.abs(QtA[n:]).max() < 1e-9
        assert np.abs(np.tril(QtA[:n], -1)).max() < 1e-9
        # explicit Q: A[:,p] == Q_econ R
        Q = qr_q(num, econ=True)
        assert np.abs(Q @ QtA[:n] - S[:, p].toarray()).max() < 1e-9
        # orthonormal columns
        assert np.abs(Q.T @ Q - np.eye(Q.shape[1])).max() < 1e-10

    def test_xqt_xq_transposed_methods(self):
        from suitesparse_tpu.qr import qr_qmult
        S, A, Ssym, num = self._factor(35, 20, 0.3, 10)
        rng = np.random.default_rng(10)
        X = rng.standard_normal((4, 35))
        XQ = qr_qmult(num, X, "XQ")          # (4, n_out)
        back = qr_qmult(num, XQ, "XQT")      # X Q Q' = X
        assert np.abs(back - X).max() < 1e-10

    def test_qtb_matches_carried(self):
        """qmult(QTX, b) pivotal rows == the carried Q'b from factorize."""
        from suitesparse_tpu.qr import qr_qmult
        S = _rand_tall(45, 30, 0.2, 11)
        A = SparseCSC.from_scipy(S)
        b = np.random.default_rng(11).standard_normal(45)
        Ssym = qr_symbolic(A)
        num = qr_factorize(A, Ssym, b=b, keep_q=True)
        y = qr_qmult(num, b, "QTX")
        assert np.abs(y[:30] - num.qtb[:, 0]).max() < 1e-8

    def test_complex_qr_solve_and_qmult(self):
        """Complex least squares + unitary qmult (SPQR <Complex> variant)."""
        from suitesparse_tpu.qr import qr_qmult
        rng = np.random.default_rng(13)
        S = _rand_tall(50, 30, 0.2, 13).astype(complex)
        S = S + 1j * sp.random(50, 30, density=0.1, random_state=rng,
                               format="csc")
        S = S.tocsc()
        A = SparseCSC.from_scipy(S)
        b = rng.standard_normal(50) + 1j * rng.standard_normal(50)
        x = qr_solve(A, b)
        x_ref, *_ = np.linalg.lstsq(S.toarray(), b, rcond=None)
        assert np.abs(x - x_ref).max() < 1e-8
        num = qr_factorize(A, qr_symbolic(A), keep_q=True)
        X = rng.standard_normal((50, 2)) + 1j * rng.standard_normal((50, 2))
        Y = qr_qmult(num, X, "QTX")
        assert np.linalg.norm(Y, axis=0) == pytest.approx(
            np.linalg.norm(X, axis=0), rel=1e-10)      # unitary
        assert np.abs(qr_qmult(num, Y, "QX") - X).max() < 1e-10

    def test_complex_min2norm(self):
        from suitesparse_tpu.qr import qr_min2norm
        rng = np.random.default_rng(14)
        S = _rand_tall(45, 25, 0.25, 14).T.astype(complex)   # 25 x 45
        S = (S + 1j * sp.random(25, 45, density=0.1, random_state=rng)).tocsc()
        A = SparseCSC.from_scipy(S)
        b = rng.standard_normal(25) + 1j * rng.standard_normal(25)
        x = qr_min2norm(A, b)
        assert np.linalg.norm(S @ x - b, np.inf) < 1e-8
        x_ref = np.linalg.pinv(S.toarray()) @ b
        assert np.abs(x - x_ref).max() < 1e-8

    def test_qmult_requires_keep_q(self):
        from suitesparse_tpu.qr import qr_qmult
        from suitesparse_tpu.core.status import SparseError
        S = _rand_tall(30, 20, 0.3, 12)
        A = SparseCSC.from_scipy(S)
        num = qr_factorize(A, qr_symbolic(A))
        with pytest.raises(SparseError):
            qr_qmult(num, np.ones(30), "QTX")


class TestSpqrRank:
    """spqr_rank utilities (MATLAB_Tools/spqr_rank analogs)."""

    def test_null_basis_wide(self):
        from suitesparse_tpu.models import spqr_null
        S = _rand_tall(40, 22, 0.3, 80).T.tocsc()     # 22 x 40, rank 22
        A = SparseCSC.from_scipy(S)
        N = spqr_null(A)
        assert N.shape == (40, 18)
        assert np.abs(S @ N).max() < 1e-8             # A N = 0
        assert np.abs(N.T @ N - np.eye(18)).max() < 1e-10   # orthonormal

    def test_null_empty_for_full_rank_tall(self):
        from suitesparse_tpu.models import spqr_null, spqr_rank
        S = _rand_tall(50, 30, 0.2, 81)
        A = SparseCSC.from_scipy(S)
        assert spqr_null(A).shape == (30, 0)
        assert spqr_rank(A) == 30

    def test_pinv_matches_numpy(self):
        from suitesparse_tpu.models import spqr_pinv
        rng = np.random.default_rng(82)
        # wide full-rank
        S = _rand_tall(45, 25, 0.25, 82).T.tocsc()
        A = SparseCSC.from_scipy(S)
        b = rng.standard_normal(25)
        x = spqr_pinv(A, b)
        assert np.abs(x - np.linalg.pinv(S.toarray()) @ b).max() < 1e-8
        # tall rank-deficient (duplicated column)
        T = _rand_tall(50, 30, 0.3, 83).tolil()
        T[:, 7] = T[:, 3]
        T = T.tocsc()
        A2 = SparseCSC.from_scipy(T)
        b2 = rng.standard_normal(50)
        x2 = spqr_pinv(A2, b2)
        ref = np.linalg.pinv(T.toarray()) @ b2
        assert np.abs(x2 - ref).max() < 1e-6

    def test_rank_deficient_rank(self):
        from suitesparse_tpu.models import spqr_rank
        T = _rand_tall(40, 25, 0.3, 84).tolil()
        T[:, 5] = 2.0 * T[:, 1]
        A = SparseCSC.from_scipy(T.tocsc())
        assert spqr_rank(A) == 24
