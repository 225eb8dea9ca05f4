"""spqr_rank-style rank/null-space utilities (MATLAB_Tools/spqr_rank,
SURVEY.md §2 item 29).

The MATLAB package builds basic solutions, null-space bases, and
pseudoinverse solves on top of SPQR's rank-revealing QR (spqr_basic.m,
spqr_null.m, spqr_pinv.m, spqr_cod.m).  Same composition here on the
TPU multifrontal QR: the orthogonal factor is applied through
qr_qmult's front replay, so the null basis is exactly orthonormal by
construction.  The MATLAB package sharpens rank decisions with subspace
iteration (spqr_ssi); we report the R-diagonal rank with the SPQR
tolerance and document the basic variant (exact for structural rank
deficiency, approximate near the tolerance).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.common import Common, default_common
from ..core.sparse import SparseCSC
from ..qr.spqr import (_q_out_layout, qr_factorize, qr_qmult, qr_solve,
                       qr_symbolic)


def spqr_basic(A: SparseCSC, b: np.ndarray,
               common: Optional[Common] = None,
               tol: Optional[float] = None) -> np.ndarray:
    """Basic (sparse) least-squares solution: dead columns zeroed
    (spqr_basic.m semantics; == SuiteSparseQR backslash for m >= n)."""
    return qr_solve(A, b, common=common, tol=tol)


def _null_factor(A: SparseCSC, common=None, tol=None):
    """QR of A^H with retained Q, plus the slots spanning null(A)."""
    cm = common or default_common()
    Af = A.to_full_storage() if A.stype != 0 else A
    At = Af.transpose(values=True, conjugate=True)
    S = qr_symbolic(At, cm)
    num = qr_factorize(At, S, common=cm, tol=tol, keep_q=True)
    out_maps, n_out, passthrough = _q_out_layout(S)
    # LIVE slots = output rows actually produced by the front replay (the
    # isometry's range); Q restricted to them is an orthogonal basis of the
    # input space.  null(A) = live slots minus the independent pivotal
    # slots (|diag(R)| > tol).
    live = np.zeros(n_out, dtype=bool)
    for row in out_maps:
        for od in row:
            v = od[od >= 0]
            live[v] = True
    live[n_out - len(passthrough):] = True
    ncols = S.n                      # pivotal slot count (columns of A^H)
    diag = np.zeros(ncols)
    ss = S.ss
    h = np.asarray(num.Rbuf)
    for s in range(ss.nsuper):
        ms, ns_ = ss.panel_shape(s)
        Np, Mp = int(ss.panel_Np[s]), int(ss.panel_Mp[s])
        o = int(ss.panel_off[s])
        pn = h[o:o + Mp * Np].reshape(Mp, Np)
        j1 = int(ss.super[s])
        diag[j1:j1 + ns_] = np.abs(np.diag(pn[:ns_, :ns_]))
    independent = np.zeros(n_out, dtype=bool)
    independent[:ncols] = diag > num.tol
    null_slots = np.nonzero(live & ~independent)[0]
    return num, S, null_slots, n_out


def spqr_null(A: SparseCSC, common: Optional[Common] = None,
              tol: Optional[float] = None) -> np.ndarray:
    """Orthonormal basis N of null(A) (A @ N == 0, N^H N = I), dense
    (n, n-rank) — spqr_null.m via QR of A^H + front-replay Q application."""
    num, S, slots, n_out = _null_factor(A, common, tol)
    if len(slots) == 0:
        return np.zeros((A.shape[1], 0))
    E = np.zeros((n_out, len(slots)))
    E[slots, np.arange(len(slots))] = 1.0
    return qr_qmult(num, E, "QX")


def spqr_pinv(A: SparseCSC, b: np.ndarray,
              common: Optional[Common] = None,
              tol: Optional[float] = None) -> np.ndarray:
    """Pseudoinverse solve x = pinv(A) b (spqr_pinv.m): the basic
    least-squares solution with its null-space component projected out —
    N is orthonormal so the projector is I - N N^H."""
    x = spqr_basic(A, b, common=common, tol=tol) if A.shape[0] >= A.shape[1] \
        else qr_solve(A, b, common=common, tol=tol)
    N = spqr_null(A, common=common, tol=tol)
    if N.shape[1] == 0:
        return x
    if x.ndim == 1:
        return x - N @ (np.conj(N).T @ x)
    return x - N @ (np.conj(N).T @ x)


def spqr_rank(A: SparseCSC, common: Optional[Common] = None,
              tol: Optional[float] = None) -> int:
    """Numerical rank estimate from the rank-revealing QR
    (|diag(R)| > tol, tol = 20(m+n)·eps·max‖col‖ by default)."""
    cm = common or default_common()
    Af = A.to_full_storage() if A.stype != 0 else A
    work = Af if Af.shape[0] >= Af.shape[1] else \
        Af.transpose(values=True, conjugate=True)
    S = qr_symbolic(work, cm)
    num = qr_factorize(work, S, common=cm, tol=tol)
    return num.rank
