"""UMFPACK-class multifrontal LU on TPU.

Reference behavior targeted (UMFPACK, SURVEY.md §2 item 15, §3.2):
3-phase symbolic/numeric/solve with auto strategy selection
(umfpack_qsymbolic.c:1232-1247: symmetric strategy iff pattern symmetry
>= 0.5 and nzdiag >= 0.9n), threshold partial pivoting, BLAS3 frontal
updates (umf_blas3_update.c), and iterative refinement (umf_solve.c:194-269).

TPU-first re-architecture (SURVEY.md §7.5 — NOT the reference's design):
UMFPACK's dynamic pivot search + growable fronts are hostile to XLA's
static shapes.  We instead:
  1. statically pivot rows once on the host — maximum-transversal matching
     (+ scaling) puts large entries on the diagonal (unsymmetric strategy);
     the symmetric strategy keeps rows in place with diagonal preference;
  2. symmetrize the pattern of B = PAQ and reuse the *supernodal Cholesky
     machinery* (partition, panels, level schedule, static extend-add maps)
     with an LU twist: two flat buffers (L and U^T panels share the same
     maps by pattern symmetry);
  3. pivot *within* each diagonal block only (restricted partial pivoting,
     batched jax.lax.linalg.lu on the MXU) — the update C = L21 @ U12
     is unchanged by block-local pivoting, so the static maps survive;
  4. recover full accuracy with iterative refinement at solve time (the
     reference's own fallback, max-steps default 2).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.common import Common, default_common
from ..core.sparse import INDEX, SparseCSC, SYM_UPPER, invert_permutation
from ..core.status import SparseError, Status
from ..graph import maxtrans
from ..cholesky.supernodal import SuperSymbolic, super_symbolic
from ..cholesky.symbolic import Symbolic, analyze
from ..cholesky.super_numeric import (NumericPlan, build_plan, _set_cols,
                                      _sub_rows)


@dataclasses.dataclass
class UmfSingletons:
    """Singleton/BTF decomposition payload (umf_singletons analog,
    umfpack_qsymbolic.c:1081-1100, generalized to full BTF): PAQ is block
    upper triangular; 1x1 blocks are singleton pivots, each larger block
    carries its own inner UmfSymbolic."""

    p: np.ndarray               # BTF row perm
    q: np.ndarray               # BTF col perm
    r: np.ndarray               # block boundaries (nblocks+1)
    subs: list                  # per block: None (1x1) or (UmfSymbolic, Ablk)


@dataclasses.dataclass
class UmfSymbolic:
    """Reusable symbolic object (umfpack_*_symbolic analog)."""

    n: int
    strategy: str               # "symmetric" | "unsymmetric" | "btf"
    rowmatch: np.ndarray        # static row matching (row i of A -> position)
    sym: Symbolic               # fill ordering etc. of the symmetrized pattern
    ss: SuperSymbolic
    plan: NumericPlan
    a_scatter_L: np.ndarray     # flat dst for entries i >= j (L buffer)
    a_scatter_U: np.ndarray     # flat dst for entries i < j  (U^T buffer)
    a_perm_rows: np.ndarray     # final row perm: B = A[a_perm_rows, :][:, qcol]
    a_perm_cols: np.ndarray
    sym_ratio: float
    nzdiag: int
    singles: Optional[UmfSingletons] = None


def _max_product_matching(A: SparseCSC):
    """MC64-class maximum-product matching: a perfect matching maximizing
    prod |a_{match(j), j}|, via exact min-weight bipartite matching on
    -log(|a|/colmax) costs (Jonker-Volgenant).  The static-pivot analog of
    Duff-Koster MC64 job=4, the standard GESP pre-pivoting.  Returns the
    column->row match or None (structurally singular / unavailable)."""
    try:
        from scipy.sparse.csgraph import min_weight_full_bipartite_matching
    except ImportError:                        # pragma: no cover
        return None
    import scipy.sparse as sp
    n = A.ncol
    absd = np.abs(A.data).astype(np.float64)
    col = np.repeat(np.arange(n, dtype=INDEX), np.diff(A.indptr))
    colmax = np.zeros(n)
    np.maximum.at(colmax, col, absd)
    colmax[colmax == 0] = 1.0
    w = -np.log(np.maximum(absd, 1e-300) / colmax[col]) + 1e-12
    Cw = sp.csc_matrix((w, A.indices, A.indptr), shape=A.shape)
    try:
        r, c = min_weight_full_bipartite_matching(Cw.tocsr())
    except Exception:
        return None
    if len(r) < n:
        return None
    match = np.empty(n, dtype=INDEX)
    match[c] = r
    return match


def _weighted_matching(A: SparseCSC) -> tuple[np.ndarray, int]:
    """MC64-flavored static pivot selection: a perfect matching using only
    *large* entries when one exists.

    The reference relies on dynamic threshold partial pivoting
    (umf_local_search.c); our static-pivot design needs large diagonal
    entries up front.  First choice is the exact maximum-product matching
    (above); the fallback runs structural maxtrans on progressively relaxed
    thresholded patterns (|a_ij| >= t * max|col j|) and keeps the strictest
    level that still yields a maximum matching.
    """
    if A.data is None:
        return maxtrans(A)
    m = _max_product_matching(A)
    if m is not None:
        return m, A.ncol
    n = A.ncol
    colmax = np.zeros(n)
    for j in range(n):
        lo, hi = int(A.indptr[j]), int(A.indptr[j + 1])
        if hi > lo:
            colmax[j] = np.abs(A.data[lo:hi]).max()
    col = np.repeat(np.arange(n, dtype=INDEX), np.diff(A.indptr))
    absval = np.abs(A.data)
    _, full_rank = maxtrans(A)
    best = None
    for t in (0.5, 0.1, 0.01, 0.001, 0.0):
        keep = absval >= t * colmax[col]
        if t == 0.0:
            keep[:] = True
        indptr = np.zeros(n + 1, dtype=INDEX)
        np.add.at(indptr, col[keep] + 1, 1)
        np.cumsum(indptr, out=indptr)
        sub = SparseCSC(indptr, A.indices[keep], None, A.shape)
        m, nm = maxtrans(sub)
        if nm == full_rank:
            best = (m, nm)
            break
        best = (m, nm)
    return best


def umf_symbolic(A: SparseCSC, common: Optional[Common] = None) -> UmfSymbolic:
    """Strategy selection + static row matching + symmetrized supernodal
    analysis (umfpack_qsymbolic equivalent)."""
    cm = common or default_common()
    cm.checkpoint("umf_symbolic")
    n = A.ncol
    if A.nrow != n:
        raise SparseError(Status.INVALID, "umf LU needs a square matrix")
    from ..core.sparse import symmetry
    sym_ratio, nzdiag = symmetry(A)
    opts = cm.lu

    # -- singleton pruning (umf_singletons generalized to BTF blocks) ------
    if opts.singletons and n > 1:
        from ..graph.btf import btf_order
        bt = btf_order(A)
        nb = len(bt.r) - 1
        if nb > 1:
            import copy
            import scipy.sparse as sp
            Spq = A.to_scipy().tocsc()[bt.p][:, bt.q].tocsc()
            cm2 = copy.deepcopy(cm)
            cm2.lu.singletons = False
            cm2.disarm()
            subs = []
            for k in range(nb):
                r0, r1 = int(bt.r[k]), int(bt.r[k + 1])
                if r1 - r0 == 1:
                    subs.append(None)
                else:
                    Ablk = SparseCSC.from_scipy(
                        sp.csc_matrix(Spq[r0:r1, r0:r1]))
                    subs.append((umf_symbolic(Ablk, cm2), Ablk))
            cm.info["umf_btf_blocks"] = nb
            return UmfSymbolic(
                n=n, strategy="btf", rowmatch=None, sym=None, ss=None,
                plan=None, a_scatter_L=None, a_scatter_U=None,
                a_perm_rows=bt.p, a_perm_cols=bt.q,
                sym_ratio=sym_ratio, nzdiag=nzdiag,
                singles=UmfSingletons(p=bt.p, q=bt.q,
                                      r=np.asarray(bt.r, dtype=INDEX),
                                      subs=subs))
    if opts.strategy == "auto":
        strategy = ("symmetric"
                    if sym_ratio >= opts.sym_threshold
                    and nzdiag >= opts.nzdiag_threshold * n
                    else "unsymmetric")
    else:
        strategy = opts.strategy

    if strategy == "symmetric":
        rowmatch = np.arange(n, dtype=INDEX)
    else:
        match, nmatch = _weighted_matching(A)
        if nmatch < n:
            # structurally singular: complete arbitrarily (graceful; numeric
            # phase will flag SINGULAR)
            free = np.setdiff1d(np.arange(n, dtype=INDEX), match[match >= 0])
            k = 0
            for j in range(n):
                if match[j] < 0:
                    match[j] = free[k]
                    k += 1
        rowmatch = match          # column j's matched row
    # B = A with matched rows moved onto the diagonal: B[j, :] ... we permute
    # rows so row rowmatch[j] sits at position j
    rperm = rowmatch              # position j <- row rowmatch[j]
    B = A.permute(rperm, None)

    # symmetrized pattern for the fill analysis — STRUCTURAL, not
    # value-based: explicit stored zeros are entries (umfpack keeps them;
    # a value-based `!= 0` here would shrink the analysis pattern below
    # the scatter maps' pattern and collide slots — seen on west0479)
    import scipy.sparse as sp
    S = B.to_scipy()
    Spat = sp.csc_matrix(
        (np.ones(S.nnz), S.indices.copy(), S.indptr.copy()), shape=S.shape)
    Ssym = (Spat + Spat.T).astype(np.float64)
    U = sp.triu(Ssym).tocsc()
    Asym = SparseCSC(U.indptr.astype(INDEX), U.indices.astype(INDEX),
                     U.data, U.shape, stype=SYM_UPPER)
    cm.cholesky.supernodal = "supernodal"
    sym = analyze(Asym, cm)
    ss = super_symbolic(Asym, sym, cm)
    plan = build_plan(ss)

    # full-A scatter maps: B2 = B[perm, perm] entries (i, j):
    #   i >= j -> L buffer at s(j): off + local(i)*ns + (j - j1)
    #   i <  j -> U^T buffer at s(i): off + local(j)*ns + (i - j1)
    p = sym.perm
    B2 = B.permute(p, p).sort_indices()
    cols = np.repeat(np.arange(n, dtype=INDEX), np.diff(B2.indptr))
    rows = B2.indices
    rows_list = [ss.rows_of(s) for s in range(ss.nsuper)]
    sup = ss.super

    def _dst(rr, cc):
        # entry (row rr, col cc) -> padded-panel position in supernode of cc
        s_of = ss.col_to_super[cc]
        out = np.empty(len(rr), dtype=INDEX)
        for s in np.unique(s_of):
            m = s_of == s
            loc = np.searchsorted(rows_list[s], rr[m])
            out[m] = ss.flat_pos(s, loc, cc[m] - int(sup[s]))
        return out

    low = rows >= cols
    dstL = np.full(len(rows), -1, dtype=INDEX)
    dstU = np.full(len(rows), -1, dtype=INDEX)
    dstL[low] = _dst(rows[low], cols[low])
    up = ~low
    # U^T: entry (i, j), i<j stored at supernode of i, local index of j
    dstU[up] = _dst(cols[up], rows[up])

    return UmfSymbolic(n=n, strategy=strategy, rowmatch=rowmatch, sym=sym,
                       ss=ss, plan=plan, a_scatter_L=dstL, a_scatter_U=dstU,
                       a_perm_rows=rperm[p] if strategy != "symmetric" else p,
                       a_perm_cols=p, sym_ratio=sym_ratio, nzdiag=nzdiag)


# ---------------------------------------------------------------------------
# Numeric phase: LU level steps
# ---------------------------------------------------------------------------

def _lu_level_step(Lb, Ub, bucket_arrays, bucket_meta):
    """Factor one level: batched block-LU with restricted pivoting.

    Extend-add uses the sorted-segment formulation (see the Cholesky
    engine): C scatters into the L buffer and C^T into the U^T buffer
    through the same sorted/unique maps.

    Returns updated buffers and the per-bucket pivot permutations.
    """
    pivs = []
    for (pe, rmask, cmask, src, ids, dst), (Np, Mb, base, B) in zip(
            bucket_arrays, bucket_meta):
        Mp = Np + Mb
        PL = jax.lax.dynamic_slice(Lb, (base,), (B * Mp * Np,)).reshape(B, Mp, Np)
        PU = jax.lax.dynamic_slice(Ub, (base,), (B * Mp * Np,)).reshape(B, Mp, Np)
        Tlow = PL[:, :Np, :]                  # lower + diag of front block
        Tup = PU[:, :Np, :]                   # strictly-lower of U^T block
        T = Tlow + jnp.tril(Tup, -1).transpose(0, 2, 1)
        T = T + jax.vmap(jnp.diag)(pe.astype(Lb.dtype))
        lu, _, perm = jax.lax.linalg.lu(T)    # P T = L U; perm: (B, Np)
        pivs.append(perm)
        L11 = jnp.tril(lu, -1) + jnp.eye(Np, dtype=Lb.dtype)[None]
        U11 = jnp.triu(lu)
        if Mb:
            A21 = PL[:, Np:, :]               # (B, Mb, Np)
            A12t = PU[:, Np:, :]              # (B, Mb, Np) = A12^T
            # permute A12 rows by block pivots = permute A12^T columns
            A12t = jnp.take_along_axis(A12t, perm[:, None, :], axis=2)
            # L21 = A21 U11^{-1}
            L21 = jax.lax.linalg.triangular_solve(
                U11, A21, left_side=False, lower=False)
            # U12 = L11^{-1} A12  => U12^T = A12^T L11^{-T}
            U12t = jax.lax.linalg.triangular_solve(
                L11, A12t, left_side=False, lower=True, transpose_a=True)
            # C = L21 @ U12 : (B, Mb, Mb)
            C = jnp.einsum("bik,bjk->bij", L21, U12t,
                           preferred_element_type=Lb.dtype)
            newL = jnp.concatenate([lu, L21], axis=1)
            newU = jnp.concatenate([jnp.zeros_like(lu), U12t], axis=1)
        else:
            newL = lu
            newU = jnp.zeros_like(lu)
        mask = rmask[:, :, None] * cmask[:, None, :]
        Lb = jax.lax.dynamic_update_slice(Lb, (newL * mask).reshape(-1), (base,))
        Ub = jax.lax.dynamic_update_slice(Ub, (newU * mask).reshape(-1), (base,))
        if Mb and src.shape[0]:
            K = dst.shape[0]
            cu = C.reshape(-1)[src]
            seg = jax.ops.segment_sum(cu, ids, num_segments=K,
                                      indices_are_sorted=True)
            Lb = Lb.at[dst].add(-seg, indices_are_sorted=True,
                                unique_indices=True, mode="promise_in_bounds")
            ct = C.transpose(0, 2, 1).reshape(-1)[src]
            segt = jax.ops.segment_sum(ct, ids, num_segments=K,
                                       indices_are_sorted=True)
            Ub = Ub.at[dst].add(-segt, indices_are_sorted=True,
                                unique_indices=True, mode="promise_in_bounds")
    return Lb, Ub, pivs


@functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0, 1))
def _lu_run_levels(Lb, Ub, level_arrays, meta):
    all_pivs = []
    for li in range(len(meta)):
        Lb, Ub, pivs = _lu_level_step(Lb, Ub, level_arrays[li], meta[li])
        all_pivs.append(tuple(pivs))
    return Lb, Ub, tuple(all_pivs)


@dataclasses.dataclass
class UmfNumeric:
    symbolic: UmfSymbolic
    Lb: jax.Array
    Ub: jax.Array
    pivs: tuple                  # per level, per bucket: (B, Np) permutations
    Rs: np.ndarray               # row scaling of original A
    dtype: object
    singular: bool
    # BTF/singleton payload: per-block inner numerics (None for 1x1) plus
    # the permuted matrix for singleton pivots and off-diagonal gaxpy
    bnums: Optional[list] = None
    bAs: Optional[list] = None   # per block: the current-value submatrix
    Spq_csc: object = None
    Spq_csr: object = None
    # matched-diagonal column scaling (GESP two-sided equilibration);
    # the factored matrix is diag(1/Rs)[rows] A [cols] diag(1/Cs)
    Cs: Optional[np.ndarray] = None

    @property
    def ok(self) -> bool:
        return not self.singular


def umf_numeric(A: SparseCSC, S: UmfSymbolic,
                common: Optional[Common] = None, dtype=None) -> UmfNumeric:
    cm = common or default_common()
    cm.checkpoint("umf_numeric")
    cm.tic("umf_numeric")
    if dtype is None:
        platform = next(iter(jnp.zeros(1).devices())).platform
        use64 = platform == "cpu" and jax.config.jax_enable_x64
        if A.data is not None and np.iscomplexobj(A.data):
            dtype = np.complex128 if use64 else np.complex64
        else:
            dtype = np.float64 if use64 else np.float32
    n = S.n

    # -- BTF/singleton path: factor each block, keep PAQ for the solve ----
    if S.singles is not None:
        import scipy.sparse as sp
        sg = S.singles
        Spq = A.to_scipy().tocsc()[sg.p][:, sg.q].tocsc()
        bnums = []
        bAs = []
        singular = False
        tiny = np.finfo(np.float64).tiny
        for k, sub in enumerate(sg.subs):
            r0, r1 = int(sg.r[k]), int(sg.r[k + 1])
            if sub is None:
                piv = Spq[r0, r0]
                if abs(piv) < tiny:
                    singular = True
                bnums.append(None)
                bAs.append(None)
            else:
                ssym, _ = sub
                # refactorization: values come from the CURRENT matrix
                # (pattern fixed, umfpack numeric-reuse contract)
                Ablk = SparseCSC.from_scipy(sp.csc_matrix(Spq[r0:r1, r0:r1]))
                bn = umf_numeric(Ablk, ssym, cm, dtype=dtype)
                singular |= bn.singular
                bnums.append(bn)
                bAs.append(Ablk)
        cm.status = Status.SINGULAR if singular else Status.OK
        t = cm.toc("umf_numeric")
        cm.info.update({"umf_numeric_time": t, "umf_strategy": "btf"})
        return UmfNumeric(symbolic=S, Lb=None, Ub=None, pivs=None,
                          Rs=np.ones(n), dtype=dtype, singular=singular,
                          bnums=bnums, bAs=bAs, Spq_csc=Spq,
                          Spq_csr=Spq.tocsr())
    # row scaling (umfpack default: sum scaling, umfpack.h)
    from .klu import _row_scale
    Rs = _row_scale(A, cm.lu.scale)
    import scipy.sparse as sp
    Asc = sp.diags(1.0 / Rs) @ A.to_scipy().tocsr()
    B2 = sp.csc_matrix(Asc)[S.a_perm_rows, :][:, S.a_perm_cols].tocsc()
    B2.sort_indices()
    # column scaling by the matched diagonal (GESP/MC64 duals analog):
    # makes every static pivot 1 after two-sided scaling, which keeps the
    # restricted-pivot factorization well-conditioned on hard matrices
    if S.strategy != "symmetric" and cm.lu.scale != "none":
        Cs = np.abs(B2.diagonal())
        Cs[(Cs == 0) | ~np.isfinite(Cs)] = 1.0
        B2 = (B2 @ sp.diags(1.0 / Cs)).tocsc()
        B2.sort_indices()
    else:
        Cs = np.ones(n)

    vals = B2.data.astype(dtype)
    # sorted+unique assembly sets (see cholesky.super_numeric.sorted_scatter_maps)
    from ..cholesky.super_numeric import sorted_scatter_maps
    maps = getattr(S, "_a_sorted", None)
    if maps is None:
        maps = (sorted_scatter_maps(S.a_scatter_L),
                sorted_scatter_maps(S.a_scatter_U))
        S._a_sorted = maps
    (srcL, dstL), (srcU, dstU) = maps
    vj = jnp.asarray(vals)
    Lb = jnp.zeros(S.plan.total + 1, dtype=dtype)
    Ub = jnp.zeros(S.plan.total + 1, dtype=dtype)
    Lb = Lb.at[jnp.asarray(dstL)].set(vj[jnp.asarray(srcL)],
                                      indices_are_sorted=True,
                                      unique_indices=True,
                                      mode="promise_in_bounds")
    Ub = Ub.at[jnp.asarray(dstU)].set(vj[jnp.asarray(srcU)],
                                      indices_are_sorted=True,
                                      unique_indices=True,
                                      mode="promise_in_bounds")

    level_arrays = S.plan.arrays_segsum(dtype)
    Lb, Ub, pivs = _lu_run_levels(Lb, Ub, level_arrays, S.plan.meta)
    Lb.block_until_ready()
    t = cm.toc("umf_numeric")
    singular = bool(jnp.isnan(Lb).any() or jnp.isinf(Lb).any())
    if not singular:
        # zero/denormal pivot check on diag(U) (umfpack's singular warning)
        h = np.asarray(Lb)
        ss = S.ss
        for s in range(ss.nsuper):
            ms, ns = ss.panel_shape(s)
            Np, Mp = int(ss.panel_Np[s]), int(ss.panel_Mp[s])
            o = int(ss.panel_off[s])
            d = np.diag(h[o:o + Mp * Np].reshape(Mp, Np)[:ns, :ns])
            if np.any(np.abs(d) < np.finfo(np.float64).tiny):
                singular = True
                break
    cm.status = Status.SINGULAR if singular else Status.OK
    cm.info.update({"umf_numeric_time": t, "umf_strategy": S.strategy})
    return UmfNumeric(symbolic=S, Lb=Lb, Ub=Ub, pivs=pivs, Rs=Rs,
                      dtype=dtype, singular=singular, Cs=Cs)


# ---------------------------------------------------------------------------
# Solve
# ---------------------------------------------------------------------------

def _solve_arrays(S: UmfSymbolic, dtype):
    return S.plan.solve_arrays(dtype)


@functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(1,))
def _lu_lsolve_impl(Lb, x, pivs, level_arrays, meta):
    """Forward: y = L \\ (P_blk x) — per-supernode block pivots applied,
    unit-lower solve, updates pushed into below rows (UMFPACK_L family)."""
    for li in range(len(meta)):
        for bi, ((pe, cidx, ridx, c_src, c_dst, r_src, r_ids, r_dst),
                 (Np, Mb, base, B)) in enumerate(
                zip(level_arrays[li], meta[li])):
            Mp = Np + Mb
            perm = pivs[li][bi]
            PL = jax.lax.dynamic_slice(Lb, (base,), (B * Mp * Np,)).reshape(B, Mp, Np)
            lu = PL[:, :Np, :]
            L11 = jnp.tril(lu, -1) + jax.vmap(jnp.diag)(
                jnp.ones_like(pe))
            xc = x[cidx]                                  # (B, Np, k)
            xc = jnp.take_along_axis(xc, perm[:, :, None], axis=1)
            xc = jax.lax.linalg.triangular_solve(L11, xc, left_side=True,
                                                 lower=True,
                                                 unit_diagonal=True)
            x = _set_cols(x, xc, c_src, c_dst)
            if Mb and r_src.shape[0]:
                L21 = PL[:, Np:, :]
                upd = jnp.einsum("bmc,bck->bmk", L21, xc,
                                 preferred_element_type=x.dtype)
                x = _sub_rows(x, upd, r_src, r_ids, r_dst)
    return x


@functools.partial(jax.jit, static_argnums=(5,), donate_argnums=(2,))
def _lu_usolve_impl(Lb, Ub, x, pivs, level_arrays, meta):
    """Backward: y = U \\ x (UMFPACK_U family)."""
    for li in range(len(meta) - 1, -1, -1):
        for bi, ((pe, cidx, ridx, c_src, c_dst, r_src, r_ids, r_dst),
                 (Np, Mb, base, B)) in enumerate(
                zip(level_arrays[li], meta[li])):
            Mp = Np + Mb
            PL = jax.lax.dynamic_slice(Lb, (base,), (B * Mp * Np,)).reshape(B, Mp, Np)
            lu = PL[:, :Np, :]
            U11 = jnp.triu(lu) + jax.vmap(jnp.diag)(pe.astype(x.dtype))
            xc = x[cidx]
            if Mb:
                PU = jax.lax.dynamic_slice(Ub, (base,), (B * Mp * Np,)).reshape(B, Mp, Np)
                U12t = PU[:, Np:, :]
                xr = x[ridx]
                xc = xc - jnp.einsum("bmc,bmk->bck", U12t, xr,
                                     preferred_element_type=x.dtype)
            xc = jax.lax.linalg.triangular_solve(U11, xc, left_side=True,
                                                 lower=False)
            x = _set_cols(x, xc, c_src, c_dst)
    return x


@functools.partial(jax.jit, static_argnums=(5, 6), donate_argnums=(2,))
def _lu_utsolve_impl(Lb, Ub, x, pivs, level_arrays, meta, conj=False):
    """Forward: y = U^{T (or H)} \\ x — U' is lower (UMFPACK_Ut family)."""
    cj = jnp.conj if conj else (lambda a: a)
    for li in range(len(meta)):
        for bi, ((pe, cidx, ridx, c_src, c_dst, r_src, r_ids, r_dst),
                 (Np, Mb, base, B)) in enumerate(
                zip(level_arrays[li], meta[li])):
            Mp = Np + Mb
            PL = jax.lax.dynamic_slice(Lb, (base,), (B * Mp * Np,)).reshape(B, Mp, Np)
            lu = cj(PL[:, :Np, :])
            U11 = jnp.triu(lu) + jax.vmap(jnp.diag)(pe.astype(x.dtype))
            xc = x[cidx]
            xc = jax.lax.linalg.triangular_solve(U11, xc, left_side=True,
                                                 lower=False, transpose_a=True)
            x = _set_cols(x, xc, c_src, c_dst)
            if Mb and r_src.shape[0]:
                PU = jax.lax.dynamic_slice(Ub, (base,), (B * Mp * Np,)).reshape(B, Mp, Np)
                U12t = cj(PU[:, Np:, :])         # (B, Mb, Np) = U12'
                upd = jnp.einsum("bmc,bck->bmk", U12t, xc,
                                 preferred_element_type=x.dtype)
                x = _sub_rows(x, upd, r_src, r_ids, r_dst)
    return x


@functools.partial(jax.jit, static_argnums=(4, 5), donate_argnums=(1,))
def _lu_ltsolve_impl(Lb, x, pivs, level_arrays, meta, conj=False):
    """Backward: y = P_blk' (L^{T (or H)} \\ x) — block pivots undone last
    per supernode (UMFPACK_Lt family)."""
    cj = jnp.conj if conj else (lambda a: a)
    for li in range(len(meta) - 1, -1, -1):
        for bi, ((pe, cidx, ridx, c_src, c_dst, r_src, r_ids, r_dst),
                 (Np, Mb, base, B)) in enumerate(
                zip(level_arrays[li], meta[li])):
            Mp = Np + Mb
            perm = pivs[li][bi]
            PL = jax.lax.dynamic_slice(Lb, (base,), (B * Mp * Np,)).reshape(B, Mp, Np)
            lu = cj(PL[:, :Np, :])
            L11 = jnp.tril(lu, -1) + jax.vmap(jnp.diag)(jnp.ones_like(pe))
            xc = x[cidx]
            if Mb:
                L21 = cj(PL[:, Np:, :])
                xr = x[ridx]
                xc = xc - jnp.einsum("bmc,bmk->bck", L21, xr,
                                     preferred_element_type=x.dtype)
            xc = jax.lax.linalg.triangular_solve(L11, xc, left_side=True,
                                                 lower=True, transpose_a=True,
                                                 unit_diagonal=True)
            # undo block pivot: rows were permuted by perm at factor time,
            # so scatter back through the inverse permutation
            inv = jnp.argsort(perm, axis=1)
            xc = jnp.take_along_axis(xc, inv[:, :, None], axis=1)
            x = _set_cols(x, xc, c_src, c_dst)
    return x


def _lu_solve_impl(Lb, Ub, x, pivs, level_arrays, meta):
    x = _lu_lsolve_impl(Lb, x, pivs, level_arrays, meta)
    return _lu_usolve_impl(Lb, Ub, x, pivs, level_arrays, meta)


def _lu_tsolve_impl(Lb, Ub, x, pivs, level_arrays, meta, conj=False):
    """(PAQ)^{T or H} y = z: forward with U', backward with L'."""
    x = _lu_utsolve_impl(Lb, Ub, x, pivs, level_arrays, meta, conj)
    return _lu_ltsolve_impl(Lb, x, pivs, level_arrays, meta, conj)


def _klu_escalate(num, A, bk, system, cm):
    """Accuracy escape hatch (ACCURACY.md, VERDICT round-2 item 5): when
    iterative refinement stalls above cm.lu.escalate_omega, the static
    row-pivot order cannot reach the reference's threshold-partial-pivoting
    accuracy class (umf_local_search.c), so re-solve through the native KLU
    Gilbert-Peierls path whose pivoting is value-dependent.  The KLU factor
    is cached on the numeric object; refactors with the same numeric object
    reuse it only if values are unchanged, so callers passing new values
    build a new UmfNumeric (the normal umf_numeric flow).
    Returns x or None when this system cannot be escalated."""
    is_c = np.issubdtype(np.dtype(num.dtype), np.complexfloating)
    if system == "A":
        transpose = False
    elif system in ("At", "Aat") and not is_c:
        transpose = True
    else:
        return None
    from . import klu as _klu
    cached = getattr(num, "_klu_esc", None)
    if cached is None:
        sy = _klu.klu_analyze(A, cm)
        nu = _klu.klu_factor(A, sy, cm)
        cached = nu
        try:
            num._klu_esc = nu
        except Exception:
            pass
    x = _klu.klu_solve(cached, bk, transpose=transpose)
    cm.info["umf_escalated"] = True
    return x.reshape(bk.shape)


def umf_solve(num: UmfNumeric, b: np.ndarray, system: str = "A",
              refine: Optional[int] = None, A: Optional[SparseCSC] = None,
              common: Optional[Common] = None) -> np.ndarray:
    """umfpack_*_solve: the full solve-system set (umfpack.h:379-394).

    With B = P R^{-1} A Q = L U (block pivots folded into L):
      "A"    A x = b            "At"   A^H x = b      "Aat"  A^T x = b
      "Pt_L" P'L x = b          "L"    L x = b
      "Lt_P" L^H P x = b        "Lat_P" L^T P x = b
      "Lt"   L^H x = b          "Lat"  L^T x = b
      "U_Qt" U Q' x = b         "U"    U x = b
      "Ut_Q" U^H Q x = b        "Uat_Q" U^T Q x = b
      "Ut"   U^H x = b          "Uat"  U^T x = b
    Iterative refinement (max cm.lu.refine_steps, omega criteria of
    umf_solve.c:194-269) applies to the A/At/Aat systems when the original
    A is supplied."""
    cm = common or default_common()
    cm.checkpoint("umf_solve")
    S = num.symbolic
    n = S.n
    host_dt = np.result_type(num.dtype, np.asarray(b).dtype, np.float64)
    if not np.issubdtype(host_dt, np.complexfloating):
        host_dt = np.float64
    b = np.asarray(b, dtype=host_dt)
    one_d = b.ndim == 1
    bk = b.reshape(n, -1)
    k = bk.shape[1]
    is_c = np.issubdtype(np.dtype(num.dtype), np.complexfloating)

    if num.bnums is not None:
        if system not in ("A", "At", "Aat"):
            raise SparseError(
                Status.NOT_AVAILABLE,
                f"factor system {system!r} unavailable on the BTF/singleton "
                f"path (blocks > 1); use A/At/Aat")
        solve_fn = functools.partial(_btf_block_solve, num, system=system)
        x = solve_fn(bk)
        steps = cm.lu.refine_steps if refine is None else refine
        if steps and A is not None:
            Ssc = A.to_scipy()
            Ssc = Ssc.conj().T if system == "At" else (
                Ssc.T if system == "Aat" else Ssc)
            anorm = A.norm(np.inf)
            best_x, best_omega = x, np.inf
            for it in range(steps):
                r = bk - Ssc @ x
                omega = np.abs(r).max() / max(
                    anorm * np.abs(x).max() + np.abs(bk).max(), 1e-300)
                cm.info[f"umf_omega_{it}"] = float(omega)
                if not np.isfinite(omega) or omega >= best_omega:
                    x = best_x        # diverging/stagnating: keep the best
                    break             # (umf_solve.c stopping rule)
                best_x, best_omega = x, omega
                if omega < 1e-14:
                    break
                x = x + solve_fn(r)
            esc = cm.lu.escalate_omega
            if esc and not best_omega <= esc:
                x2 = _klu_escalate(num, A, bk, system, cm)
                if x2 is not None:
                    x = x2
        return x.reshape(-1) if one_d else x

    la = _solve_arrays(S, num.dtype)
    meta = S.plan.meta

    def _pad(z):
        x = jnp.zeros((n + 1, k), dtype=num.dtype)
        return x.at[:n, :].set(jnp.asarray(z, dtype=num.dtype))

    def _lsolve(z):
        return np.asarray(_lu_lsolve_impl(num.Lb, _pad(z), num.pivs, la,
                                          meta)[:n], dtype=host_dt)

    def _usolve(z):
        return np.asarray(_lu_usolve_impl(num.Lb, num.Ub, _pad(z), num.pivs,
                                          la, meta)[:n], dtype=host_dt)

    def _ltsolve(z, conj):
        return np.asarray(_lu_ltsolve_impl(num.Lb, _pad(z), num.pivs, la,
                                           meta, conj and is_c)[:n],
                          dtype=host_dt)

    def _utsolve(z, conj):
        return np.asarray(_lu_utsolve_impl(num.Lb, num.Ub, _pad(z), num.pivs,
                                           la, meta, conj and is_c)[:n],
                          dtype=host_dt)

    Cs = num.Cs if num.Cs is not None else np.ones(n)

    def one_solve(rhs):
        # A = R (PAQ-indexed B C);  Ax=b  <=>  B w = (b/R)[rows],
        # x[cols] = w / C   (B is the two-sided-scaled factored matrix)
        z = (rhs / num.Rs[:, None])[S.a_perm_rows, :]
        y = _usolve(_lsolve(z))
        out = np.empty((n, k), dtype=host_dt)
        out[S.a_perm_cols, :] = y / Cs[:, None]
        return out

    def one_tsolve(rhs, conj):
        # A^{H/T} x = b  <=>  B^{H/T} (P R x) = C^{-1} Q'b; Rs and Cs are
        # real so the scalings need no conjugation
        z = rhs[S.a_perm_cols, :] / Cs[:, None]
        y = _ltsolve(_utsolve(z, conj), conj)
        out = np.empty((n, k), dtype=host_dt)
        out[S.a_perm_rows, :] = y
        return out / num.Rs[:, None]

    if system == "A":
        solve_fn = one_solve
    elif system in ("At", "Aat"):
        solve_fn = lambda rhs: one_tsolve(rhs, system == "At")
    elif system in ("Pt_L", "L"):
        z = bk[S.a_perm_rows] if system == "Pt_L" else bk
        x = _lsolve(z)
        return x[:, 0] if one_d else x
    elif system in ("Lt_P", "Lat_P", "Lt", "Lat"):
        y = _ltsolve(bk, system in ("Lt_P", "Lt"))
        if system.endswith("_P"):
            out = np.empty((n, k), dtype=host_dt)
            out[S.a_perm_rows, :] = y
            y = out
        return y[:, 0] if one_d else y
    elif system in ("U_Qt", "U"):
        y = _usolve(bk)
        if system == "U_Qt":
            out = np.empty((n, k), dtype=host_dt)
            out[S.a_perm_cols, :] = y
            y = out
        return y[:, 0] if one_d else y
    elif system in ("Ut_Q", "Uat_Q", "Ut", "Uat"):
        y = _utsolve(bk, system in ("Ut_Q", "Ut"))
        if system.endswith("_Q"):
            # U^{H} (Q x) = b: x = Q^{-1} y (gather through the col perm)
            y = y[S.a_perm_cols]
        return y[:, 0] if one_d else y
    else:
        raise SparseError(Status.INVALID, f"unknown system {system!r}")

    x = solve_fn(bk)
    steps = cm.lu.refine_steps if refine is None else refine
    if steps and A is not None:
        Ssc = A.to_scipy()
        if system == "At":
            Ssc = Ssc.conj().T
        elif system == "Aat":
            Ssc = Ssc.T
        anorm = A.norm(np.inf)
        best_x, best_omega = x, np.inf
        for it in range(steps):
            r = bk - Ssc @ x
            omega = np.abs(r).max() / max(
                anorm * np.abs(x).max() + np.abs(bk).max(), 1e-300)
            cm.info[f"umf_omega_{it}"] = float(omega)
            if not np.isfinite(omega) or omega >= best_omega:
                x = best_x            # diverging/stagnating: keep the best
                break                 # (umf_solve.c stopping rule)
            best_x, best_omega = x, omega
            if omega < 1e-14:
                break
            x = x + solve_fn(r)
        esc = cm.lu.escalate_omega
        if esc and not best_omega <= esc:
            x2 = _klu_escalate(num, A, bk, system, cm)
            if x2 is not None:
                x = x2
    return x.reshape(-1) if one_d else x


def _btf_block_solve(num: UmfNumeric, bk: np.ndarray,
                     system: str = "A") -> np.ndarray:
    """Block substitution over the BTF form (klu_solve.c:207-219 shape).

    M = PAQ is block UPPER triangular.  "A": solve M y = P b backward over
    blocks with off-diagonal gaxpy, x = Q y.  "At"/"Aat": M^{H/T} z = Q' b
    forward over blocks, x = P' z."""
    S = num.symbolic
    sg = S.singles
    n = S.n
    kk = bk.shape[1]
    host_dt = bk.dtype
    nb = len(sg.r) - 1
    tiny = np.finfo(np.float64).tiny
    y = np.zeros((n, kk), dtype=host_dt)
    out = np.empty((n, kk), dtype=host_dt)

    def inner(idx, rhs, sys):
        bn = num.bnums[idx]
        return umf_solve(bn, rhs, system=sys,
                         A=num.bAs[idx]).reshape(rhs.shape)

    if system == "A":
        b2 = bk[sg.p]
        Srow = num.Spq_csr
        for kblk in range(nb - 1, -1, -1):
            r0, r1 = int(sg.r[kblk]), int(sg.r[kblk + 1])
            rhs = b2[r0:r1] - Srow[r0:r1, r1:] @ y[r1:]
            if r1 - r0 == 1:
                piv = num.Spq_csc[r0, r0]
                y[r0] = rhs / (piv if abs(piv) >= tiny else tiny)
            else:
                y[r0:r1] = inner(kblk, rhs, "A")
        out[sg.q] = y
        return out

    # transpose systems: M^{H/T} z = b[q], forward over blocks
    conj = system == "At"
    b2 = bk[sg.q]
    Scol = num.Spq_csc
    for kblk in range(nb):
        r0, r1 = int(sg.r[kblk]), int(sg.r[kblk + 1])
        above = Scol[:r0, r0:r1]
        upd = (above.conj() if conj else above).T @ y[:r0] if r0 else 0.0
        rhs = b2[r0:r1] - upd
        if r1 - r0 == 1:
            piv = Scol[r0, r0]
            piv = np.conj(piv) if conj else piv
            y[r0] = rhs / (piv if abs(piv) >= tiny else tiny)
        else:
            y[r0:r1] = inner(kblk, rhs, system)
    out[sg.p] = y
    return out


def umf_wsolve(num: UmfNumeric, b: np.ndarray, W=None, system: str = "A",
               **kw) -> np.ndarray:
    """umfpack_*_wsolve: identical to umf_solve — the caller-provided
    workspace contract (umfpack_wsolve.h) is meaningless under XLA buffer
    management; W is accepted and ignored for API compatibility."""
    return umf_solve(num, b, system=system, **kw)


def umf_lunz(num: UmfNumeric) -> tuple[int, int]:
    """umfpack_get_lunz analog: structural nnz of L and U, counted as the
    nonzero entries of the numeric panels (the padded dense-panel layout
    stores explicit zeros; the reference counts pattern entries)."""
    if num.bnums is not None:
        lnz = unz = sum(1 for bn in num.bnums if bn is None)
        for bn in num.bnums:
            if bn is not None:
                l2, u2 = umf_lunz(bn)
                lnz += l2
                unz += u2
        return lnz, unz
    # panel layout: Lb's diagonal block holds L (strict lower, unit diag
    # implicit) and U11 (upper); Lb below holds L21; Ub below holds U12'
    Lb = np.asarray(num.Lb)
    Ub = np.asarray(num.Ub)
    lnz = unz = 0
    for level in num.symbolic.plan.meta:
        for (Np, Mb, base, B) in level:
            Mp = Np + Mb
            PL = Lb[base:base + B * Mp * Np].reshape(B, Mp, Np)
            lu = PL[:, :Np, :]
            lnz += int(np.count_nonzero(np.tril(lu, -1))) + B * Np
            lnz += int(np.count_nonzero(PL[:, Np:, :]))
            unz += int(np.count_nonzero(np.triu(lu)))
            if Mb:
                PU = Ub[base:base + B * Mp * Np].reshape(B, Mp, Np)
                unz += int(np.count_nonzero(PU[:, Np:, :]))
    return lnz, unz


def _perm_parity(p) -> float:
    """Sign of a permutation vector (determinant of its permutation
    matrix), by cycle counting: sign = (-1)^(n - #cycles)."""
    p = np.asarray(p, dtype=np.int64)
    n = p.size
    seen = np.zeros(n, dtype=bool)
    sign = 1.0
    for i in range(n):
        if seen[i]:
            continue
        j, length = i, 0
        while not seen[j]:
            seen[j] = True
            j = int(p[j])
            length += 1
        if length % 2 == 0:
            sign = -sign
    return sign


def umf_determinant(num: UmfNumeric) -> tuple[float, float]:
    """umfpack_get_determinant: (mantissa, exponent10) of det(A).

    Permutation parity is accounted exactly (umfpack_get_determinant.c):
    fill/matching row+col perms, BTF perms, and the per-block partial
    pivots each contribute their sign.
    """
    if num.bnums is not None:
        # product over blocks: 1x1 pivots and inner determinants;
        # det(A) = parity(p)·parity(q)·prod(det(diag blocks of PAQ))
        sg = num.symbolic.singles
        logdet = 0.0
        sign = _perm_parity(sg.p) * _perm_parity(sg.q)
        for k, bn in enumerate(num.bnums):
            r0 = int(sg.r[k])
            if bn is None:
                piv = num.Spq_csc[r0, r0]
                sign *= np.sign(piv) if piv != 0 else 0.0
                logdet += np.log(max(abs(piv),
                                     np.finfo(np.float64).tiny))
            else:
                m_k, e_k = umf_determinant(bn)
                sign *= np.sign(m_k) if not np.iscomplexobj(np.asarray(m_k)) \
                    else m_k / max(abs(m_k), 1e-300)
                logdet += np.log(max(abs(m_k), 1e-300)) + e_k * np.log(10.0)
        e = np.floor(logdet / np.log(10.0))
        m = sign * np.exp(logdet - e * np.log(10.0))
        if np.iscomplexobj(m):
            return complex(m), float(e)
        return float(m), float(e)
    S = num.symbolic
    ss = S.ss
    h = np.asarray(num.Lb)
    logdet = 0.0
    # det(A) = parity(a_perm_rows)·parity(a_perm_cols)·parity(block pivots)
    #          · prod(diag U) · prod(Rs)
    sign = _perm_parity(S.a_perm_rows) * _perm_parity(S.a_perm_cols)
    for level_pivs in num.pivs:
        for pv in level_pivs:
            for row in np.asarray(pv):
                sign *= _perm_parity(row)
    for s in range(ss.nsuper):
        ms, ns = ss.panel_shape(s)
        Np, Mp = int(ss.panel_Np[s]), int(ss.panel_Mp[s])
        o = int(ss.panel_off[s])
        panel = h[o:o + Mp * Np].reshape(Mp, Np)
        d = np.diag(panel[:ns, :ns])
        sign *= np.prod(np.sign(d))
        logdet += np.sum(np.log(np.abs(d)))
    # two-sided scaling: the factored matrix is R^{-1} A C^{-1} (permuted),
    # so det(A) = det(B) · prod(Rs) · prod(Cs)
    logdet += np.sum(np.log(num.Rs))
    if num.Cs is not None:
        logdet += np.sum(np.log(num.Cs))
    e = np.floor(logdet / np.log(10.0))
    m = sign * np.exp(logdet - e * np.log(10.0))
    if np.iscomplexobj(m):
        return complex(m), float(e)
    return float(m), float(e)
