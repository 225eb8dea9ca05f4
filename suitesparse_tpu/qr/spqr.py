"""SPQR-class multifrontal sparse QR on TPU.

Reference behavior targeted (SPQR, SURVEY.md §2 item 20, §3.4):
symbolic analysis = supernodal analysis of A'A (spqr_analyze.cpp uses
cholmod_analyze_p2); numeric = per-front dense Householder QR with child
contribution blocks assembled in staircase form (spqr_front.cpp); rank
detection with tol = 20*(m+n)*eps*max column 2-norm
(SuiteSparseQR_definitions.h:28, spqr_tol.cpp); least-squares solve via
Q'b carried through the factorization + R backsolve (SuiteSparseQR<Entry>).

TPU-first re-architecture: fronts at the same elimination-tree level are
batched into padded shape buckets and factorized with one batched
jnp.linalg.qr per bucket (MXU); the staircase assembly (A rows with
leftmost column in the front + children's C blocks) is precomputed as
static scatter maps at analyze time; R is stored in the same flat packed
panel layout as the Cholesky engine (R^T shares L's pattern on A'A).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.common import Common, default_common
from ..core.sparse import INDEX, SparseCSC, SYM_UPPER
from ..core.status import SparseError, Status
from ..cholesky.supernodal import SuperSymbolic, super_symbolic, _pad_dim
from ..cholesky.symbolic import Symbolic, analyze
from ..cholesky.super_numeric import sorted_scatter_maps


def _sorted_pair(bq, key: str, src: np.ndarray, dst: np.ndarray):
    """Cache (src, dst) reordered by destination so the assembly scatter can
    promise sorted+unique indices (vectorized one-pass update on TPU; same
    lowering trick as the Cholesky extend-add, NOTES_ROUND1.md)."""
    maps = getattr(bq, key)
    if maps is None:
        dst = np.asarray(dst)
        order = np.argsort(dst, kind="stable")
        maps = (np.asarray(src)[order].astype(INDEX),
                dst[order].astype(INDEX))
        setattr(bq, key, maps)
    return maps


def _sorted_drop(bq, key: str, dst: np.ndarray, trash: int):
    """Cache (src, dst) maps for an output scatter whose pad entries point
    at the single trash slot: drop pads on the host, sort by destination."""
    maps = getattr(bq, key)
    if maps is None:
        flat = np.asarray(dst).reshape(-1)
        maps = sorted_scatter_maps(np.where(flat == trash, -1, flat))
        setattr(bq, key, maps)
    return maps


@dataclasses.dataclass
class _QRBucket:
    sids: np.ndarray
    FR: int                   # padded front rows
    FC: int                   # padded front cols
    Np: int                   # padded pivotal column count
    # assembly maps (flat indices into the level workspace of this bucket)
    a_src: np.ndarray         # indices into the A-value vector
    a_dst: np.ndarray         # -> workspace flat positions
    c_src: np.ndarray         # indices into the C buffer
    c_dst: np.ndarray
    b_rows: np.ndarray        # (B, FR) original A-row id carried into front
                              # rows (for stacking B), -1 = child/pad row
    c_brow_src: np.ndarray    # C carried-B buffer sources (flat)
    c_brow_dst: np.ndarray    # -> (b, front_row) flattened positions
    # outputs
    r_dst: np.ndarray         # (B, FC, Np): workspace R rows -> R panel flat
    c_out_dst: np.ndarray     # (B, FR, FC): C-block rows -> C buffer flat
    cb_out_dst: np.ndarray    # (B, FR): C-rows -> carried-B buffer row (+1-based? -1 pad)
    colidx: np.ndarray        # (B, Np) global pivotal columns (n = pad)
    rowidx: np.ndarray        # (B, FCmNp) global beyond cols (n = pad)
    ns: np.ndarray            # (B,) true pivotal widths
    fr: np.ndarray            # (B,) true front row counts
    # cached sorted scatter maps (built lazily by _sorted_pair/_sorted_drop;
    # declared so slots=True/frozen variants would not silently break them)
    _a_maps: tuple = None
    _c_maps: tuple = None
    _cb_maps: tuple = None
    _r_maps: tuple = None
    _cout_maps: tuple = None
    _cbout_maps: tuple = None


@dataclasses.dataclass
class QRSymbolic:
    m: int
    n: int
    sym: Symbolic             # of the A'A pattern (perm = column ordering)
    ss: SuperSymbolic
    levels: list              # list[list[_QRBucket]]
    total_R: int              # flat R panel storage (ss.total)
    total_C: int              # flat C buffer size
    c_off: np.ndarray         # per supernode offset into C buffer
    cb_off: np.ndarray        # per supernode offset into carried-B rows
    total_CB: int             # total carried-B rows
    arow_of_front: list       # per supernode: A-row ids assembled there


def qr_symbolic(A: SparseCSC, common: Optional[Common] = None) -> QRSymbolic:
    cm = common or default_common()
    cm.checkpoint("qr_symbolic")
    m, n = A.shape
    if A.stype != 0:
        A = A.to_full_storage()
    import scipy.sparse as sp

    S = A.to_scipy().tocsc()
    # structural A'A (ones, not values: numeric cancellation or explicit
    # zeros must not shrink the analysis pattern below the assembly maps)
    Spat = sp.csc_matrix((np.ones(S.nnz), S.indices.copy(),
                          S.indptr.copy()), shape=S.shape)
    AtA = (Spat.T @ Spat).tocsc()
    U = sp.triu(AtA).tocsc()
    Asym = SparseCSC(U.indptr.astype(INDEX), U.indices.astype(INDEX),
                     np.ones(U.nnz), U.shape, stype=SYM_UPPER)
    cm.cholesky.supernodal = "supernodal"
    sym = analyze(Asym, cm)
    ss = super_symbolic(Asym, sym, cm)

    p = sym.perm                      # column ordering
    Ap = SparseCSC.from_scipy(S[:, p].tocsc())   # A with permuted cols
    # leftmost column (in permuted order) of each row
    ApT = Ap.to_scipy().tocsr()
    leftmost = np.full(m, -1, dtype=INDEX)
    for i in range(m):
        lo, hi = ApT.indptr[i], ApT.indptr[i + 1]
        if hi > lo:
            leftmost[i] = ApT.indices[lo:hi].min()
    rows_list = [ss.rows_of(s) for s in range(ss.nsuper)]
    arow_of_front: list[np.ndarray] = []
    for s in range(ss.nsuper):
        j1, j2 = int(ss.super[s]), int(ss.super[s + 1])
        sel = np.where((leftmost >= j1) & (leftmost < j2))[0]
        arow_of_front.append(sel.astype(INDEX))

    # bottom-up front row counts and C-block sizes
    nsuper = ss.nsuper
    crows = np.zeros(nsuper, dtype=INDEX)
    frows = np.zeros(nsuper, dtype=INDEX)
    children: list[list[int]] = [[] for _ in range(nsuper)]
    for s in range(nsuper):
        pnt = int(ss.sn_parent[s])
        if pnt != -1:
            children[pnt].append(s)
    for s in range(nsuper):           # postorder: children first (s ascending)
        ms, ns = ss.panel_shape(s)
        fr = len(arow_of_front[s]) + sum(int(crows[c]) for c in children[s])
        frows[s] = fr
        ccols = ms - ns
        crows[s] = max(0, min(fr - ns, ccols)) if ccols > 0 else 0

    c_off = np.zeros(nsuper + 1, dtype=INDEX)
    np.cumsum([int(crows[s]) * (ss.panel_shape(s)[0] - ss.panel_shape(s)[1])
               for s in range(nsuper)], out=c_off[1:])
    cb_off = np.zeros(nsuper + 1, dtype=INDEX)
    np.cumsum(crows, out=cb_off[1:])

    # buckets per level
    Ap_csc = Ap
    levels_out = []
    for level in ss.levels:
        groups: dict[tuple, list[int]] = {}
        for s in level.tolist():
            ms, ns = ss.panel_shape(s)
            key = (_pad_dim(max(int(frows[s]), 1)), _pad_dim(ms), _pad_dim(ns))
            groups.setdefault(key, []).append(s)
        buckets = []
        for (FR, FC, Np), sids in sorted(groups.items()):
            B = len(sids)
            a_src, a_dst, c_src, c_dst = [], [], [], []
            cb_src, cb_dst = [], []
            b_rows = np.full((B, FR), -1, dtype=INDEX)
            r_dst = np.full((B, FC, Np), ss.total, dtype=INDEX)
            c_out_dst = np.full((B, FR, FC), int(c_off[-1]), dtype=INDEX)
            cb_out_dst = np.full((B, FR), int(cb_off[-1]), dtype=INDEX)
            colidx = np.full((B, Np), n, dtype=INDEX)
            rowidx = np.full((B, FC), n, dtype=INDEX)
            ns_arr = np.zeros(B, dtype=INDEX)
            fr_arr = np.zeros(B, dtype=INDEX)
            for b, s in enumerate(sids):
                ms, ns = ss.panel_shape(s)
                j1 = int(ss.super[s])
                rows_s = rows_list[s]
                ns_arr[b] = ns
                fr_arr[b] = int(frows[s])
                colidx[b, :ns] = j1 + np.arange(ns)
                beyond = rows_s[ns:]
                rowidx[b, :ms - ns] = beyond
                colpos = {int(c): k for k, c in enumerate(rows_s)}
                base = b * FR * FC
                # A rows stack first (entry maps built in the pass below)
                for rofs, r in enumerate(arow_of_front[s]):
                    b_rows[b, rofs] = r
                # children C blocks
                crofs = len(arow_of_front[s])
                for c in children[s]:
                    ccols_c = ss.panel_shape(c)[0] - ss.panel_shape(c)[1]
                    rows_c_beyond = rows_list[c][ss.panel_shape(c)[1]:]
                    colmap = np.array([colpos[int(x)] for x in rows_c_beyond],
                                      dtype=INDEX)
                    for rr in range(int(crows[c])):
                        srcrow = int(c_off[c]) + rr * ccols_c
                        dstrow = base + (crofs + rr) * FC
                        c_src.extend(range(srcrow, srcrow + ccols_c))
                        c_dst.extend((dstrow + colmap).tolist())
                        cb_src.append(int(cb_off[c]) + rr)
                        cb_dst.append(b * FR + crofs + rr)
                    crofs += int(crows[c])
                # R output: workspace row t (t < min(fr, ms)) col k ->
                # R panel (padded normalized layout): Rpanel[norm(k), t]
                o = int(ss.panel_off[s])
                NpS = int(ss.panel_Np[s])
                for t in range(min(int(frows[s]), ms, ns)):
                    for k in range(t, ms):
                        nk = k if k < ns else NpS + (k - ns)
                        r_dst[b, k, t] = o + nk * NpS + t
                # C out: workspace rows ns..ns+crows, cols ns.. -> C buffer
                ccols_s = ms - ns
                for rr in range(int(crows[s])):
                    for k in range(ccols_s):
                        c_out_dst[b, ns + rr, ns + k] = (int(c_off[s])
                                                         + rr * ccols_s + k)
                    cb_out_dst[b, ns + rr] = int(cb_off[s]) + rr
            # A entry maps (vectorized per bucket using the CSR)
            for b, s in enumerate(sids):
                rows_s = rows_list[s]
                colpos = {int(c): k for k, c in enumerate(rows_s)}
                base = b * FR * FC
                for rofs, r in enumerate(arow_of_front[s]):
                    lo, hi = int(ApT.indptr[r]), int(ApT.indptr[r + 1])
                    for t in range(lo, hi):
                        cpos = colpos[int(ApT.indices[t])]
                        a_src.append(t)
                        a_dst.append(base + rofs * FC + cpos)
            buckets.append(_QRBucket(
                sids=np.array(sids, dtype=INDEX), FR=FR, FC=FC, Np=Np,
                a_src=np.array(a_src, dtype=INDEX),
                a_dst=np.array(a_dst, dtype=INDEX),
                c_src=np.array(c_src, dtype=INDEX),
                c_dst=np.array(c_dst, dtype=INDEX),
                b_rows=b_rows,
                c_brow_src=np.array(cb_src, dtype=INDEX),
                c_brow_dst=np.array(cb_dst, dtype=INDEX),
                r_dst=r_dst, c_out_dst=c_out_dst, cb_out_dst=cb_out_dst,
                colidx=colidx, rowidx=rowidx, ns=ns_arr, fr=fr_arr))
        levels_out.append(buckets)
    return QRSymbolic(m=m, n=n, sym=sym, ss=ss, levels=levels_out,
                      total_R=ss.total, total_C=int(c_off[-1]),
                      c_off=c_off, cb_off=cb_off, total_CB=int(cb_off[-1]),
                      arow_of_front=arow_of_front)


@dataclasses.dataclass
class QRNumeric:
    symbolic: QRSymbolic
    Rbuf: jax.Array           # flat R panels (+1 trash)
    qtb: np.ndarray           # Q'b top rows per pivotal column, (n, k)
    rank: int
    tol: float
    dtype: object
    # per-(level, bucket) complete-mode front Q blocks (B, FR, FR), host —
    # the TPU-native analog of SPQR's Householder (H/HTau/HPinv) storage;
    # present only when factorized with keep_q=True (enables qr_qmult).
    Qs: Optional[list] = None

    @property
    def ok(self) -> bool:
        return self.rank == min(self.symbolic.m, self.symbolic.n)


def qr_factorize(A: SparseCSC, S: QRSymbolic, b: Optional[np.ndarray] = None,
                 common: Optional[Common] = None, tol: Optional[float] = None,
                 dtype=None, keep_q: bool = False) -> QRNumeric:
    """Numeric multifrontal QR; optionally carries B through to give Q'B
    (the SPQR backslash path).

    keep_q=True retains the per-front complete-mode Q blocks so Q can be
    applied after the fact (qr_qmult / SuiteSparseQR_qmult,
    SPQR/Source/SuiteSparseQR_qmult.cpp) — the TPU-native equivalent of
    returning Q in Householder form."""
    cm = common or default_common()
    cm.checkpoint("qr_factorize")
    cm.tic("qr_factorize")
    if dtype is None:
        platform = next(iter(jnp.zeros(1).devices())).platform
        dtype = (np.float64 if platform == "cpu" and jax.config.jax_enable_x64
                 else np.float32)
    m, n = S.m, S.n
    import scipy.sparse as sp
    Sc = A.to_scipy().tocsc()[:, S.sym.perm]
    ApT = Sc.tocsr()
    if np.iscomplexobj(ApT.data) and not np.issubdtype(np.dtype(dtype),
                                                       np.complexfloating):
        dtype = np.complex64 if np.dtype(dtype) == np.float32 else np.complex128
    avals = jnp.asarray(ApT.data.astype(dtype))

    is_complex = np.issubdtype(np.dtype(dtype), np.complexfloating)
    # default tol = 20*(m+n)*eps*max column 2-norm (spqr_tol.cpp)
    if tol is None:
        tol = cm.qr.tol
    if tol is None:
        colnorm = np.sqrt(np.asarray(abs(Sc).power(2).sum(axis=0)).ravel())
        eps = np.finfo(np.dtype(dtype).type(0).real.dtype).eps
        tol = 20.0 * (m + n) * eps * max(colnorm.max(initial=0.0), 1e-300)

    bk = None
    k = 1
    host_dt = np.complex128 if is_complex else np.float64
    if b is not None:
        b = np.asarray(b, dtype=host_dt)
        bk = b.reshape(m, -1)
        k = bk.shape[1]

    Rbuf = jnp.full(S.total_R + 1, 0.0, dtype=dtype)
    Cbuf = jnp.zeros(S.total_C + 1, dtype=dtype)
    CBbuf = jnp.zeros((S.total_CB + 1, k), dtype=dtype)
    qtb = np.zeros((n, k), dtype=host_dt)
    rank = 0
    Qs: Optional[list] = [] if keep_q else None

    for li, lv in enumerate(S.levels):
        if keep_q:
            Qs.append([])
        for bq in lv:
            B = len(bq.sids)
            W = jnp.zeros(B * bq.FR * bq.FC, dtype=dtype)
            if len(bq.a_src):
                asrc, adst = _sorted_pair(bq, "_a_maps", bq.a_src, bq.a_dst)
                W = W.at[jnp.asarray(adst)].set(
                    avals[jnp.asarray(asrc)], indices_are_sorted=True,
                    unique_indices=True, mode="promise_in_bounds")
            if len(bq.c_src):
                csrc, cdst = _sorted_pair(bq, "_c_maps", bq.c_src, bq.c_dst)
                W = W.at[jnp.asarray(cdst)].set(
                    Cbuf[jnp.asarray(csrc)], indices_are_sorted=True,
                    unique_indices=True, mode="promise_in_bounds")
            F = W.reshape(B, bq.FR, bq.FC)
            # carried B block
            WB = jnp.zeros((B * bq.FR, k), dtype=dtype)
            if bk is not None:
                br = bq.b_rows.reshape(-1)
                ok = br >= 0
                WB = WB.at[jnp.asarray(np.where(ok)[0])].set(
                    jnp.asarray(bk[br[ok]], dtype=dtype),
                    indices_are_sorted=True, unique_indices=True,
                    mode="promise_in_bounds")
            if len(bq.c_brow_src):
                cbsrc, cbdst = _sorted_pair(bq, "_cb_maps", bq.c_brow_src,
                                            bq.c_brow_dst)
                WB = WB.at[jnp.asarray(cbdst)].set(
                    CBbuf[jnp.asarray(cbsrc)], indices_are_sorted=True,
                    unique_indices=True, mode="promise_in_bounds")
            FB = WB.reshape(B, bq.FR, k)

            Q, R = jnp.linalg.qr(F, mode="complete" if keep_q else "reduced")
            if keep_q:
                Qs[-1].append(np.asarray(Q))           # (B, FR, FR)
            QtB = jnp.einsum("brm,brk->bmk", jnp.conj(Q), FB,
                             preferred_element_type=dtype)
            mn = R.shape[1]
            # write R rows into panels (pad rows beyond are zero)
            rd = bq.r_dst  # (B, FC, Np) maps (col k, row t) -> flat
            # R[t, k] -> rd[b, k, t]
            Rt = R.transpose(0, 2, 1)                  # (B, FC, mn)
            npad = bq.r_dst.shape[2]
            Rt = Rt[:, :, :npad] if mn >= npad else jnp.pad(
                Rt, ((0, 0), (0, 0), (0, npad - mn)))
            rsrc, rdst = _sorted_drop(bq, "_r_maps", rd, S.total_R)
            Rbuf = Rbuf.at[jnp.asarray(rdst)].set(
                Rt.reshape(-1)[jnp.asarray(rsrc)], indices_are_sorted=True,
                unique_indices=True, mode="promise_in_bounds")
            # C block + carried rows into buffers
            cd = bq.c_out_dst                          # (B, FR, FC)
            Rfull = jnp.zeros((B, bq.FR, bq.FC), dtype=dtype)
            Rfull = Rfull.at[:, :mn, :].set(R)
            osrc, odst = _sorted_drop(bq, "_cout_maps", cd, S.total_C)
            Cbuf = Cbuf.at[jnp.asarray(odst)].set(
                Rfull.reshape(-1)[jnp.asarray(osrc)], indices_are_sorted=True,
                unique_indices=True, mode="promise_in_bounds")
            QtBfull = jnp.zeros((B, bq.FR, k), dtype=dtype)
            QtBfull = QtBfull.at[:, :mn, :].set(QtB)
            bsrc, bdst = _sorted_drop(bq, "_cbout_maps", bq.cb_out_dst,
                                      S.total_CB)
            CBbuf = CBbuf.at[jnp.asarray(bdst)].set(
                QtBfull.reshape(B * bq.FR, k)[jnp.asarray(bsrc)],
                indices_are_sorted=True, unique_indices=True,
                mode="promise_in_bounds")
            # qtb top rows (host accumulate)
            if bk is not None:
                qtb_h = np.asarray(QtB)
                for bi in range(B):
                    ns_b = int(bq.ns[bi])
                    cols = bq.colidx[bi, :ns_b]
                    take = min(ns_b, qtb_h.shape[1])
                    qtb[cols[:take]] = qtb_h[bi, :take, :]
    # rank from |diag(R)|
    h = np.asarray(Rbuf)
    ss = S.ss
    diag = np.zeros(n, dtype=host_dt)
    for s in range(ss.nsuper):
        ms, ns_ = ss.panel_shape(s)
        Np, Mp = int(ss.panel_Np[s]), int(ss.panel_Mp[s])
        o = int(ss.panel_off[s])
        pn = h[o:o + Mp * Np].reshape(Mp, Np)
        j1 = int(ss.super[s])
        diag[j1:j1 + ns_] = np.diag(pn[:ns_, :ns_])
    rank = int((np.abs(diag) > tol).sum())
    cm.status = Status.OK if rank == min(m, n) else Status.SINGULAR
    cm.info.update({"qr_rank": rank, "qr_tol": tol,
                    "qr_time": cm.toc("qr_factorize")})
    return QRNumeric(symbolic=S, Rbuf=Rbuf, qtb=qtb, rank=rank, tol=tol,
                     dtype=dtype, Qs=Qs)


# ---------------------------------------------------------------------------
# Applying Q after the fact (SuiteSparseQR_qmult, SPQR qmult methods
# SuiteSparseQR_definitions.h:32-36: QTX / QX / XQT / XQ)
# ---------------------------------------------------------------------------

def _q_out_layout(S: QRSymbolic):
    """Global output-row layout of Q'X.

    The multifrontal orthogonal map sends the m input rows to:
      rows 0..n-1     — R's rows, aligned with the (permuted) columns;
      then per-front residual slots (front rows beyond pivot+carried —
      zero rows of R, the least-squares residual space);
      then passthrough slots for A rows never assembled (structurally
      zero rows of A, on which Q acts as identity).
    Fronts with fewer rows than pivotal columns leave their dead pivotal
    slots structurally zero, so the map is an isometry R^m -> R^{n_out}
    with n_out >= m (n_out == m when every pivotal slot is populated).
    Returns (out_dst per level/bucket (B, FR) with -1 = carried/pad row,
    n_out, passthrough_rows).
    """
    cached = getattr(S, "_q_layout", None)
    if cached is not None:
        return cached
    n = S.n
    res_base = n
    out_maps = []
    assembled = []
    for lv in S.levels:
        row = []
        for bq in lv:
            B, FR = len(bq.sids), bq.FR
            od = np.full((B, FR), -1, dtype=INDEX)
            for b in range(B):
                fr = int(bq.fr[b])
                ns_b = int(bq.ns[b])
                npiv = min(ns_b, fr)
                od[b, :npiv] = bq.colidx[b, :npiv]
                ncarry = int((bq.cb_out_dst[b] < S.total_CB).sum())
                nres = max(0, fr - ns_b - ncarry)
                if nres:
                    od[b, ns_b + ncarry:fr] = res_base + np.arange(nres)
                    res_base += nres
            row.append(od)
        out_maps.append(row)
    for rows in S.arow_of_front:
        assembled.append(rows)
    assembled = (np.concatenate(assembled) if assembled
                 else np.empty(0, dtype=INDEX))
    passthrough = np.setdiff1d(np.arange(S.m, dtype=INDEX), assembled)
    n_out = res_base + len(passthrough)
    S._q_layout = (out_maps, int(n_out), passthrough)
    return S._q_layout


def qr_qmult(num: QRNumeric, X: np.ndarray, method: str = "QTX") -> np.ndarray:
    """Apply the orthogonal factor: Q'X, QX, XQ', or XQ
    (SuiteSparseQR_qmult; requires qr_factorize(..., keep_q=True)).

    Q'X maps (m, k) -> (n_out, k) in the _q_out_layout row order;
    QX maps (n_out, k) -> (m, k).  qmult(QX, qmult(QTX, X)) == X.
    """
    if num.Qs is None:
        raise SparseError(Status.INVALID,
                          "qr_qmult needs qr_factorize(..., keep_q=True)")
    if method == "XQT":      # X Q^H = (Q X^H)^H
        return np.conj(qr_qmult(num, np.conj(np.asarray(X)).T, "QX")).T
    if method == "XQ":       # X Q = (Q^H X^H)^H
        return np.conj(qr_qmult(num, np.conj(np.asarray(X)).T, "QTX")).T
    if method not in ("QTX", "QX"):
        raise ValueError(f"unknown qmult method {method!r}")
    S = num.symbolic
    out_maps, n_out, passthrough = _q_out_layout(S)
    dt = np.result_type(np.asarray(X).dtype, num.dtype, np.float64)
    X = np.asarray(X, dtype=dt)
    one_d = X.ndim == 1
    Xk = X.reshape(X.shape[0], -1)
    k = Xk.shape[1]
    CB = np.zeros((S.total_CB + 1, k), dtype=dt)

    if method == "QTX":
        if Xk.shape[0] != S.m:
            raise ValueError(f"QTX expects {S.m} rows, got {Xk.shape[0]}")
        Y = np.zeros((n_out, k), dtype=dt)
        if len(passthrough):
            Y[n_out - len(passthrough):] = Xk[passthrough]
        for li, lv in enumerate(S.levels):
            for bi, bq in enumerate(lv):
                B, FR = len(bq.sids), bq.FR
                Q = num.Qs[li][bi]
                FB = np.zeros((B * FR, k), dtype=dt)
                br = bq.b_rows.reshape(-1)
                ok = br >= 0
                FB[np.where(ok)[0]] = Xk[br[ok]]
                if len(bq.c_brow_src):
                    FB[bq.c_brow_dst] = CB[bq.c_brow_src]
                QtB = np.einsum("brm,brk->bmk", np.conj(Q.astype(dt)),
                                FB.reshape(B, FR, k))
                flat = QtB.reshape(B * FR, k)
                # invalid slots point at the trash row (== total_CB)
                CB[bq.cb_out_dst.reshape(-1)] = flat
                od = out_maps[li][bi].reshape(-1)
                ok2 = od >= 0
                Y[od[ok2]] = flat[ok2]
        return Y[:, 0] if one_d else Y

    # QX: reverse replay, root first
    if Xk.shape[0] != n_out:
        raise ValueError(f"QX expects {n_out} rows, got {Xk.shape[0]}")
    Y = np.zeros((S.m, k), dtype=dt)
    if len(passthrough):
        Y[passthrough] = Xk[n_out - len(passthrough):]
    for li in range(len(S.levels) - 1, -1, -1):
        for bi, bq in enumerate(S.levels[li]):
            B, FR = len(bq.sids), bq.FR
            Q = num.Qs[li][bi]
            OutB = np.zeros((B * FR, k), dtype=dt)
            od = out_maps[li][bi].reshape(-1)
            ok2 = od >= 0
            OutB[ok2] = Xk[od[ok2]]
            cbd = bq.cb_out_dst.reshape(-1)
            okc = cbd < S.total_CB
            OutB[okc] = CB[cbd[okc]]
            BQ = np.einsum("brm,bmk->brk", Q.astype(dt),
                           OutB.reshape(B, FR, k))
            flat = BQ.reshape(B * FR, k)
            br = bq.b_rows.reshape(-1)
            ok = br >= 0
            Y[br[ok]] = flat[np.where(ok)[0]]
            if len(bq.c_brow_src):
                CB[bq.c_brow_src] = flat[bq.c_brow_dst]
    return Y[:, 0] if one_d else Y


def qr_q(num: QRNumeric, econ: bool = True) -> np.ndarray:
    """Explicit dense orthogonal factor (SuiteSparseQR's 'output Q as a
    sparse matrix' option; dense here — intended for modest m).  econ=True
    returns the first n columns (A[:,E] = Q_econ @ R)."""
    S = num.symbolic
    Qt = qr_qmult(num, np.eye(S.m), "QTX")     # (n_out, m) = Q^H
    Q = np.conj(Qt).T
    return Q[:, :S.n] if econ and S.n <= Q.shape[1] else Q


def qr_rsolve(num: QRNumeric, c: np.ndarray, dead_zero: bool = True) -> np.ndarray:
    """x = R \\ c in the permuted column space; dead columns get x=0
    (SPQR basic solution convention)."""
    S = num.symbolic
    ss = S.ss
    n = S.n
    h = np.asarray(num.Rbuf)
    dt = np.result_type(h.dtype, np.float64)
    x = np.array(c, dtype=dt, copy=True)
    one_d = x.ndim == 1
    xk = x.reshape(n, -1)
    for s in range(ss.nsuper - 1, -1, -1):
        ms, ns_ = ss.panel_shape(s)
        Np, Mp = int(ss.panel_Np[s]), int(ss.panel_Mp[s])
        o = int(ss.panel_off[s])
        pn = h[o:o + Mp * Np].reshape(Mp, Np).astype(dt)
        j1 = int(ss.super[s])
        rows_s = ss.rows_of(s)
        beyond = rows_s[ns_:]
        R11t = pn[:ns_, :ns_]       # R11^T (ns x ns), lower triangular
        R12t = pn[Np:Np + (ms - ns_), :ns_]   # R12^T ((ms-ns) x ns)
        rhs = xk[j1:j1 + ns_]
        if len(beyond):
            rhs = rhs - R12t.T @ xk[beyond]
        d = np.diag(R11t)
        dead = np.abs(d) <= num.tol
        # solve R11 y = rhs  (R11 = R11t.T upper triangular)
        import scipy.linalg as sla
        R11 = R11t.T.copy()
        if dead.any():
            R11[dead, :] = 0.0
            R11[:, dead] = 0.0
            R11[dead, dead] = 1.0
            rhs = rhs.copy()
            rhs[dead] = 0.0
        y = sla.solve_triangular(R11, rhs, lower=False)
        xk[j1:j1 + ns_] = y
    return x.reshape(-1) if one_d else xk


def qr_rtsolve(num: QRNumeric, c: np.ndarray) -> np.ndarray:
    """y = R^H \\ c (forward substitution on the adjoint of the upper
    factor, in the permuted column space); dead columns (|diag| <= tol)
    get y=0 — the spqr_rsolve transpose path used by min2norm."""
    S = num.symbolic
    ss = S.ss
    n = S.n
    h = np.asarray(num.Rbuf)
    dt = np.result_type(h.dtype, np.float64)
    x = np.array(c, dtype=dt, copy=True)
    one_d = x.ndim == 1
    xk = x.reshape(n, -1)
    import scipy.linalg as sla
    for s in range(ss.nsuper):
        ms, ns_ = ss.panel_shape(s)
        Np, Mp = int(ss.panel_Np[s]), int(ss.panel_Mp[s])
        o = int(ss.panel_off[s])
        # panels store R^T; conjugate gives R^H blocks
        pn = np.conj(h[o:o + Mp * Np].reshape(Mp, Np).astype(dt))
        j1 = int(ss.super[s])
        beyond = ss.rows_of(s)[ns_:]
        R11h = pn[:ns_, :ns_].copy()          # R11^H, lower triangular
        rhs = xk[j1:j1 + ns_].copy()
        d = np.diag(R11h)
        dead = np.abs(d) <= num.tol
        if dead.any():
            R11h[dead, :] = 0.0
            R11h[:, dead] = 0.0
            R11h[dead, dead] = 1.0
            rhs[dead] = 0.0
        y = sla.solve_triangular(R11h, rhs, lower=True)
        xk[j1:j1 + ns_] = y
        if len(beyond):
            R12h = pn[Np:Np + (ms - ns_), :ns_]   # (R^H) rows beyond cols
            xk[beyond] -= R12h @ y
    return x.reshape(-1) if one_d else xk


def qr_min2norm(A: SparseCSC, b: np.ndarray,
                common: Optional[Common] = None,
                tol: Optional[float] = None) -> np.ndarray:
    """Minimum 2-norm solution of an underdetermined system Ax=b (m < n):
    QR of A^H (SuiteSparseQR_min2norm) — A^H P = Q R, so A = P' R^H Q^H
    and x = Q (R^{-H} P'b) lies in A's row space."""
    cm = common or default_common()
    m, n = A.shape
    Af = A.to_full_storage() if A.stype != 0 else A
    At = Af.transpose(values=True, conjugate=True)
    S = qr_symbolic(At, cm)
    num = qr_factorize(At, S, common=cm, tol=tol, keep_q=True)
    dt = np.result_type(num.dtype, np.float64)
    b = np.asarray(b, dtype=dt)
    one_d = b.ndim == 1
    bk = b.reshape(m, -1)
    z = qr_rtsolve(num, bk[S.sym.perm])       # R^H z = P' b
    _, n_out, _ = _q_out_layout(S)
    zfull = np.zeros((n_out, bk.shape[1]), dtype=dt)
    zfull[:m] = z                              # pivotal slots = rows of R
    x = qr_qmult(num, zfull, "QX")
    return x[:, 0] if one_d else x


def qr_solve(A: SparseCSC, b: np.ndarray,
             common: Optional[Common] = None,
             tol: Optional[float] = None) -> np.ndarray:
    """SuiteSparseQR-style backslash: least squares min ||Ax - b||_2 for
    m >= n (rank-deficient A gets the basic solution, dead columns zeroed);
    minimum 2-norm solution via QR of A' for m < n
    (SPQR/Source/SuiteSparseQR.cpp backslash dispatch)."""
    cm = common or default_common()
    m, n = A.shape
    if m < n:
        return qr_min2norm(A, b, common=cm, tol=tol)
    S = qr_symbolic(A, cm)
    num = qr_factorize(A, S, b=b, common=cm, tol=tol)
    xq = np.asarray(qr_rsolve(num, num.qtb if np.asarray(b).ndim > 1
                              else num.qtb[:, 0]))
    x = np.empty_like(xq)
    x[S.sym.perm] = xq
    return x
