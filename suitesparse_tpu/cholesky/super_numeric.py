"""Supernodal numeric factorization + solves on TPU (JAX/XLA).

TPU-first re-architecture of CHOLMOD's supernodal numeric phase
(CHOLMOD/Supernodal/t_cholmod_super_numeric.c): instead of the reference's
left-looking per-supernode BLAS calls (SYRK :682 / GEMM :708 / POTRF :864 /
TRSM :997) with dynamically computed relative maps (:596-640), we run a
*right-looking, level-scheduled, batched* plan:

  * the whole factor lives in one flat panel buffer `Lx` (plus 1 trash slot);
  * supernodes at the same elimination-tree depth are independent; each
    level is one jitted step: gather panels into shape buckets (padded to
    MXU-friendly sizes), batched POTRF (jnp.linalg.cholesky) + TRSM
    (triangular_solve) on the MXU, batched SYRK for the outer-product
    update, then ONE scatter-add into ancestor panels through the static
    index maps precomputed at analyze time (the kernelAddUpdate idea,
    reference CHOLMOD/GPU/cholmod_gpu_kernels.cu:17-66, made fully static);
  * solves are the same level schedule with batched TRSM/GEMV.

Everything is static-shape: a (pattern, dtype, #rhs) triple compiles once
and is reused across refactorizations — the analog of the reference's
symbolic reuse contract, but at the XLA-program level.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.common import Common, default_common
from ..core.sparse import INDEX, SparseCSC
from ..core.status import Status
from .supernodal import SuperSymbolic, _pad_dim
from .symbolic import Symbolic, _force_upper


@dataclasses.dataclass
class _Bucket:
    sids: np.ndarray        # supernode ids in this bucket
    Np: int                 # padded column count
    Mb: int                 # padded below-row count
    gather: np.ndarray      # (B, Np+Mb, Np) int32 flat idx into Lx, -1 = pad
    padeye: np.ndarray      # (B, Np) 1.0 where padded diagonal row
    dest: np.ndarray        # (B, Mb, Mb) int32 flat idx (trash for invalid)
    colidx: np.ndarray      # (B, Np) global column index (n = trash)
    rowidx: np.ndarray      # (B, Mb) global below-row index (n = trash)


@dataclasses.dataclass
class NumericPlan:
    """Static per-pattern plan: buckets per level + assembly scatter."""

    ss: SuperSymbolic
    levels: list[list[_Bucket]]
    total: int
    n: int


def build_plan(ss: SuperSymbolic) -> NumericPlan:
    n, total = ss.n, ss.total
    trash = total
    off = ss.panel_off
    sup = ss.super
    levels_out: list[list[_Bucket]] = []
    rows_of = [ss.rows_of(s) for s in range(ss.nsuper)]
    for level in ss.levels:
        groups: dict[tuple[int, int], list[int]] = {}
        for s in level.tolist():
            ms, ns = ss.panel_shape(s)
            mb = ms - ns
            key = (_pad_dim(ns), _pad_dim(mb) if mb else 0)
            groups.setdefault(key, []).append(s)
        buckets = []
        for (Np, Mb), sids in sorted(groups.items()):
            B = len(sids)
            gather = np.full((B, Np + Mb, Np), -1, dtype=np.int64)
            padeye = np.zeros((B, Np), dtype=np.float64)
            dest = np.full((B, Mb, Mb), trash, dtype=np.int64)
            colidx = np.full((B, Np), n, dtype=np.int64)
            rowidx = np.full((B, Mb), n, dtype=np.int64)
            for b, s in enumerate(sids):
                ms, ns = ss.panel_shape(s)
                mb = ms - ns
                o = int(off[s])
                j1 = int(sup[s])
                # normalized layout: rows 0..Np = diag block, Np.. = below
                r_idx = np.arange(ns)
                c_idx = np.arange(ns)
                gather[b, :ns, :ns] = o + r_idx[:, None] * ns + c_idx[None, :]
                if mb:
                    rb = np.arange(mb)
                    gather[b, Np:Np + mb, :ns] = (o + (ns + rb)[:, None] * ns
                                                  + c_idx[None, :])
                padeye[b, ns:] = 1.0
                colidx[b, :ns] = j1 + c_idx
                r = rows_of[s][ns:]          # below rows (global)
                if mb:
                    rowidx[b, :mb] = r
                    # dest[a, c] for a >= c: position of (r[a], r[c])
                    t_of = ss.col_to_super[r]
                    for t in np.unique(t_of):
                        rows_t = rows_of[t]
                        ns_t = int(sup[t + 1] - sup[t])
                        o_t = int(off[t])
                        j1_t = int(sup[t])
                        loc = np.searchsorted(rows_t, r)
                        # validity of each local row (row present in panel t)
                        ok = (loc < len(rows_t))
                        loc_c = np.clip(loc, 0, max(len(rows_t) - 1, 0))
                        ok &= rows_t[loc_c] == r
                        cols_here = np.where(t_of == t)[0]
                        for c in cols_here:
                            d = o_t + loc_c * ns_t + (int(r[c]) - j1_t)
                            col_valid = ok & (np.arange(mb) >= c)
                            dest[b, :mb, c] = np.where(col_valid, d, trash)
            buckets.append(_Bucket(np.array(sids, dtype=INDEX), Np, Mb,
                                   gather, padeye, dest, colidx, rowidx))
        levels_out.append(buckets)
    return NumericPlan(ss=ss, levels=levels_out, total=total, n=n)


# ---------------------------------------------------------------------------
# Factorization
# ---------------------------------------------------------------------------

def _level_step(Lx, bucket_data):
    """One level: factor all buckets, scatter updates. Traced by jit."""
    for g, pe, d in bucket_data:
        Bsz, Mp, Np = g.shape
        Mb = Mp - Np
        safe = jnp.maximum(g, 0)
        P = jnp.where(g >= 0, Lx[safe], 0.0)
        T = P[:, :Np, :]                        # (B, Np, Np) lower part
        Tfull = T + jnp.tril(T, -1).transpose(0, 2, 1)
        Tfull = Tfull + jax.vmap(jnp.diag)(pe.astype(Lx.dtype))
        C = jnp.linalg.cholesky(Tfull)          # (B, Np, Np) lower
        if Mb:
            Bm = P[:, Np:, :]
            # X C^T = Bm  =>  X = Bm C^{-T}
            Bm = jax.lax.linalg.triangular_solve(
                C, Bm, left_side=False, lower=True, transpose_a=True)
            U = jnp.einsum("bik,bjk->bij", Bm, Bm,
                           preferred_element_type=Lx.dtype)
            newP = jnp.concatenate([C, Bm], axis=1)
            Lx = Lx.at[d.reshape(-1)].add(-U.reshape(-1), mode="drop")
        else:
            newP = C
        gd = jnp.where(g >= 0, g, Lx.shape[0] - 1)
        Lx = Lx.at[gd.reshape(-1)].set(newP.reshape(-1), mode="drop")
    return Lx


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _run_levels(Lx, level_arrays, nlevels):
    for li in range(nlevels):
        Lx = _level_step(Lx, level_arrays[li])
    return Lx


@dataclasses.dataclass
class SuperFactor:
    """Numeric supernodal factor: flat panel buffer + plan (PAP' = LL')."""

    plan: NumericPlan
    Lx: jax.Array               # (total+1,) packed panels + trash slot
    perm: np.ndarray
    minor: int
    dtype: object

    @property
    def n(self) -> int:
        return self.plan.n

    @property
    def ok(self) -> bool:
        return self.minor == self.n

    def to_simplicial(self):
        """cholmod_change_factor(super -> simplicial LL') equivalent."""
        from .simplicial import Factor
        ss = self.plan.ss
        n = ss.n
        Lx_h = np.asarray(self.Lx)
        cols_i: list[np.ndarray] = []
        cols_x: list[np.ndarray] = []
        Lp = np.zeros(n + 1, dtype=INDEX)
        for s in range(ss.nsuper):
            ms, ns = ss.panel_shape(s)
            rows = ss.rows_of(s)
            o = int(ss.panel_off[s])
            Pn = Lx_h[o:o + ms * ns].reshape(ms, ns)
            for c in range(ns):
                j = int(ss.super[s]) + c
                ri = rows[c:]
                vx = Pn[c:, c]
                cols_i.append(ri)
                cols_x.append(vx)
                Lp[j + 1] = len(ri)
        np.cumsum(Lp, out=Lp)
        Li = np.concatenate(cols_i) if cols_i else np.empty(0, dtype=INDEX)
        Lxs = np.concatenate(cols_x) if cols_x else np.empty(0)
        return Factor(n=n, perm=self.perm, Lp=Lp, Li=Li.astype(INDEX),
                      Lx=Lxs, D=None, is_ll=True, minor=self.minor,
                      symbolic=None)


def _assemble_values(A: SparseCSC, sym: Symbolic, ss: SuperSymbolic,
                     dtype, beta: float = 0.0) -> np.ndarray:
    """Values of tril(PAP') in the canonical order matching a_scatter_dst."""
    U = _force_upper(A) if A.stype == 0 else (A if A.stype > 0 else A.transpose())
    P = U.symperm(sym.perm, values=True).sort_indices()
    PL = P.transpose(values=True)
    PL.sort_indices()
    vals = PL.data.astype(dtype)
    if beta:
        col = np.repeat(np.arange(ss.n, dtype=INDEX), np.diff(PL.indptr))
        vals = vals + beta * (PL.indices == col)
    return vals


def factorize_super(A: SparseCSC, sym: Symbolic, ss: SuperSymbolic,
                    plan: Optional[NumericPlan] = None,
                    common: Optional[Common] = None,
                    dtype=None) -> SuperFactor:
    """Numeric supernodal LL' of PAP' (values change, pattern fixed —
    cholmod_factorize / the klu_refactor-style reuse path)."""
    cm = common or default_common()
    if dtype is None:
        # probe the default backend via an array (jax.default_backend() can
        # block on discovery of every platform plugin, e.g. a TPU tunnel)
        platform = next(iter(jnp.zeros(1).devices())).platform
        use_f64 = platform == "cpu" and jax.config.jax_enable_x64
        dtype = np.float64 if use_f64 else np.float32
    plan = plan or build_plan(ss)
    cm.tic("factorize")

    vals = _assemble_values(A, sym, ss, dtype)
    Lx = jnp.zeros(plan.total + 1, dtype=dtype)
    Lx = Lx.at[jnp.asarray(ss.a_scatter_dst)].add(jnp.asarray(vals))

    level_arrays = tuple(
        tuple((jnp.asarray(b.gather), jnp.asarray(b.padeye, dtype=dtype),
               jnp.asarray(b.dest)) for b in lv)
        for lv in plan.levels)
    Lx = _run_levels(Lx, level_arrays, len(plan.levels))
    Lx.block_until_ready()
    t = cm.toc("factorize")

    minor = plan.n
    if bool(jnp.isnan(Lx).any()):
        cm.status = Status.NOT_POSDEF
        # locate first supernode containing a NaN (host pass)
        h = np.asarray(Lx)
        for s in range(ss.nsuper):
            o = int(ss.panel_off[s])
            ms, ns = ss.panel_shape(s)
            if np.isnan(h[o:o + ms * ns]).any():
                minor = int(ss.super[s])
                break
    else:
        cm.status = Status.OK
    cm.info.update({"factor_time": t, "minor": minor,
                    "factor_gflops": 2.0 * (sym.flops if sym else 0) / max(t, 1e-12) / 1e9})
    return SuperFactor(plan=plan, Lx=Lx, perm=sym.perm, minor=minor,
                       dtype=dtype)


# ---------------------------------------------------------------------------
# Solves (cholmod_super_lsolve / super_ltsolve,
#         reference Supernodal/t_cholmod_super_solve.c:89-195)
# ---------------------------------------------------------------------------

def _solve_level_arrays(plan: NumericPlan, dtype):
    return tuple(
        tuple((jnp.asarray(b.gather), jnp.asarray(b.padeye, dtype=dtype),
               jnp.asarray(b.colidx), jnp.asarray(b.rowidx)) for b in lv)
        for lv in plan.levels)


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(1,))
def _lsolve_impl(Lx, x, nlevels, level_arrays):
    # x: (n+1, k); row n is the trash slot
    for li in range(nlevels):
        for g, pe, cidx, ridx in level_arrays[li]:
            Bsz, Mp, Np = g.shape
            Mb = Mp - Np
            safe = jnp.maximum(g, 0)
            P = jnp.where(g >= 0, Lx[safe], 0.0)
            C = P[:, :Np, :] + jax.vmap(jnp.diag)(pe.astype(Lx.dtype))
            xc = x[cidx]                     # (B, Np, k)
            xc = jax.lax.linalg.triangular_solve(C, xc, left_side=True,
                                                 lower=True)
            x = x.at[cidx].set(xc, mode="drop")
            if Mb:
                Bm = P[:, Np:, :]
                upd = jnp.einsum("bmc,bck->bmk", Bm, xc,
                                 preferred_element_type=x.dtype)
                x = x.at[ridx.reshape(-1)].add(
                    -upd.reshape(-1, upd.shape[-1]), mode="drop")
    return x


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(1,))
def _ltsolve_impl(Lx, x, nlevels, level_arrays):
    for li in range(nlevels - 1, -1, -1):
        for g, pe, cidx, ridx in level_arrays[li]:
            Bsz, Mp, Np = g.shape
            Mb = Mp - Np
            safe = jnp.maximum(g, 0)
            P = jnp.where(g >= 0, Lx[safe], 0.0)
            C = P[:, :Np, :] + jax.vmap(jnp.diag)(pe.astype(Lx.dtype))
            xc = x[cidx]                     # (B, Np, k)
            if Mb:
                Bm = P[:, Np:, :]
                xr = x[ridx]                 # (B, Mb, k)
                xc = xc - jnp.einsum("bmc,bmk->bck", Bm, xr,
                                     preferred_element_type=x.dtype)
            xc = jax.lax.linalg.triangular_solve(C, xc, left_side=True,
                                                 lower=True, transpose_a=True)
            x = x.at[cidx].set(xc, mode="drop")
    return x


def solve_super(f: SuperFactor, b: np.ndarray, system: str = "A") -> np.ndarray:
    """cholmod_solve on a supernodal factor. Systems: A, LLt, L, Lt, P, Pt."""
    plan = f.plan
    n = plan.n
    b = np.asarray(b)
    one_d = b.ndim == 1
    bk = b.reshape(n, 1) if one_d else b
    k = bk.shape[1]
    la = _solve_level_arrays(plan, f.dtype)
    perm = f.perm

    def _pad(v):
        x = jnp.zeros((n + 1, k), dtype=f.dtype)
        return x.at[:n, :].set(jnp.asarray(v, dtype=f.dtype))

    if system == "P":
        out = bk[perm]
    elif system == "Pt":
        out = np.empty_like(bk)
        out[perm] = bk
    elif system == "A":
        x = _pad(bk[perm])
        x = _lsolve_impl(f.Lx, x, len(plan.levels), la)
        x = _ltsolve_impl(f.Lx, x, len(plan.levels), la)
        xh = np.asarray(x[:n])
        out = np.empty_like(xh)
        out[perm] = xh
    elif system in ("LLt", "LDLt"):
        x = _pad(bk)
        x = _lsolve_impl(f.Lx, x, len(plan.levels), la)
        x = _ltsolve_impl(f.Lx, x, len(plan.levels), la)
        out = np.asarray(x[:n])
    elif system == "L":
        out = np.asarray(_lsolve_impl(f.Lx, _pad(bk), len(plan.levels), la)[:n])
    elif system == "Lt":
        out = np.asarray(_ltsolve_impl(f.Lx, _pad(bk), len(plan.levels), la)[:n])
    else:
        raise ValueError(f"unknown system {system!r}")
    return out.reshape(-1) if one_d else out
