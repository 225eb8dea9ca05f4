"""Pass-through (multifrontal) extend-add as pure MXU einsums.

Measured on the real v5e chip (round 2): XLA's element/row-granular
gather, scatter, and segment ops all run at 10–20 GB/s — ~50x below HBM
bandwidth — so the round-1 sorted-segment extend-add dominates the
numeric phase (185 ms of 199 ms on lap3d_28).  This module removes EVERY
irregular memory op from the extend-add:

  * classical multifrontal update flow (Duff/Reid; the reference's
    frontal assembly, t_cholmod_super_numeric.c:596-640): a child's
    Schur update goes only to its PARENT's frame; the parent accumulates
    and passes the un-owned part upward in its own update — so each
    supernode needs one (Mb x Mb) accumulator block, laid out
    bucket-contiguously like the panels (one dynamic_slice each);
  * the child->parent frame placement is a two-sided one-hot projection
    patch = W U W^T with W built on the fly from static index arrays
    ((IDXF == iota) compare — VPU), executed as batched einsums (MXU);
  * the per-parent reduction over children is folded into the same
    einsum by stacking each parent's children along a padded axis
    (block-diagonal U), so contributions sum inside the MXU contraction;
  * the parent-bucket update is then a dense region add: dynamic_slice,
    subtract, dynamic_update_slice.  No gather, no scatter, no
    segment_sum anywhere in the hot path.

Containment (child below-rows within the parent front) is the classical
multifrontal theorem; the planner asserts it per pair at analyze time.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..core.sparse import INDEX

__all__ = ["PTPlan", "build_pt_plan", "pt_numeric_program"]


@dataclasses.dataclass
class _PTGroup:
    """Children of one (level, child bucket) whose parents share one
    (parent level, parent bucket)."""

    csel: np.ndarray    # (Btp, Gmax) child slot per parent slot (pad = B)
    idxf: np.ndarray    # (Btp, Gmax, Mft) child row per frame pos (pad = Mb)
    pb_base: int        # parent bucket panel base
    pb_acc: int         # parent bucket accumulator base
    pb_B: int           # parent bucket panel count
    pb_Np: int
    pb_Mb: int
    has_acc: bool = True   # any child is itself a parent (acc term nonzero)
    _dev: tuple = None

    def device(self):
        if self._dev is None:
            self._dev = (jnp.asarray(self.csel), jnp.asarray(self.idxf))
        return self._dev


@dataclasses.dataclass
class PTPlan:
    acc_base: dict      # (level, bucket idx) -> accumulator base offset
    acc_total: int
    groups: list        # per level, per bucket: list[_PTGroup]
    flops: float        # projection flop count (diagnostic)


def build_pt_plan(plan) -> PTPlan:
    """Host planning (once per pattern): accumulator layout + child->parent
    projection maps grouped by (child bucket, parent bucket)."""
    ss = plan.ss
    nsuper = ss.nsuper
    sup = ss.super
    parent = np.asarray(ss.sn_parent)
    rows_of = [ss.rows_of(s) for s in range(nsuper)]

    # supernode -> (level, bucket idx, slot)
    where = {}
    for li, lv in enumerate(plan.levels):
        for bi, b in enumerate(lv):
            for slot, s in enumerate(b.sids.tolist()):
                where[s] = (li, bi, slot)

    # accumulator layout: mirrors the panel bucket layout with Mb x Mb
    acc_base = {}
    off = 0
    for li, lv in enumerate(plan.levels):
        for bi, b in enumerate(lv):
            acc_base[(li, bi)] = off
            off += len(b.sids) * b.Mb * b.Mb
    acc_total = off

    groups_out = []
    flops = 0.0
    for li, lv in enumerate(plan.levels):
        lv_groups = []
        for bi, b in enumerate(lv):
            Np, Mb = b.Np, b.Mb
            B = len(b.sids)
            per_parent: dict[tuple, dict[int, list]] = {}
            if Mb:
                for slot, s in enumerate(b.sids.tolist()):
                    p = int(parent[s])
                    ms, ns = ss.panel_shape(s)
                    mb = ms - ns
                    if mb == 0:
                        continue
                    assert p >= 0, "supernode with below rows lacks a parent"
                    lj, bj, slotp = where[p]
                    key = (lj, bj)
                    per_parent.setdefault(key, {}).setdefault(
                        slotp, []).append((slot, s, mb))
            bgroups = []
            for (lj, bj), slots in per_parent.items():
                pb = plan.levels[lj][bj]
                Npt, Mbt = pb.Np, pb.Mb
                Mft = Npt + Mbt
                Btp = len(pb.sids)
                Gmax = max(len(v) for v in slots.values())
                csel = np.full((Btp, Gmax), B, dtype=np.int32)
                idxf = np.full((Btp, Gmax, Mft), Mb, dtype=np.int32)
                for slotp, childs in slots.items():
                    t = int(pb.sids[slotp])
                    rows_t = rows_of[t]
                    ns_t = int(sup[t + 1] - sup[t])
                    j1_t = int(sup[t])
                    for g, (slot, s, mb) in enumerate(childs):
                        csel[slotp, g] = slot
                        ns_s = int(sup[s + 1] - sup[s])
                        r = rows_of[s][ns_s:]
                        loc = np.searchsorted(rows_t, r)
                        ok = (loc < len(rows_t))
                        locc = np.clip(loc, 0, max(len(rows_t) - 1, 0))
                        ok &= rows_t[locc] == r
                        assert ok.all(), (
                            "multifrontal containment violated: child below "
                            "rows must lie in the parent front")
                        fpos = np.where(locc < ns_t, locc,
                                        Npt + (locc - ns_t))
                        idxf[slotp, g, fpos] = np.arange(len(r),
                                                         dtype=np.int32)
                        flops += 2.0 * Mft * Mft * Mb + B * Mb * Mb
                bgroups.append(_PTGroup(
                    csel=csel, idxf=idxf, pb_base=int(pb.base),
                    pb_acc=acc_base[(lj, bj)], pb_B=Btp, pb_Np=Npt,
                    pb_Mb=Mbt))
            lv_groups.append(bgroups)
        groups_out.append(lv_groups)
    return PTPlan(acc_base=acc_base, acc_total=max(acc_total, 1),
                  groups=groups_out, flops=flops)


def _project_groups(Lx, Acc, Bm, AccIn, groups, Mb, Np, dtype):
    """Apply every child->parent projection of one child bucket.

    patch_k = Σ_g W_g (Bm_g Bm_gᵀ + acc_g) W_gᵀ
            = Y_k Y_kᵀ + A_k Ō_kᵀ     (children stacked on the contraction
                                       axis so the MXU sees G·Np / G·Mb
                                       contraction dims, not Mb)
    with Y_k = [W_g Bm_g]_g stacked, A_k = [W_g acc_g]_g, Ō_k = [W_g]_g.
    """
    for g in groups:
        csel, idxf = g.device()
        Btp, Gmax = csel.shape
        Mft = idxf.shape[2]
        Npt, Mbt = g.pb_Np, g.pb_Mb
        B = Bm.shape[0]
        # child selection one-hot: (Btp, Gmax, B) — pad slot B -> zero row
        ohc = (csel[:, :, None] ==
               jnp.arange(B, dtype=jnp.int32)).astype(dtype)
        Bsel = jnp.einsum("kgb,bmn->kgmn", ohc, Bm,
                          preferred_element_type=dtype)
        # frame placement one-hot: (Btp, Gmax, Mft, Mb) — pad row -> zero
        oh = (idxf[:, :, :, None] ==
              jnp.arange(Mb, dtype=jnp.int32)).astype(dtype)
        # Y = W B : (k, g, Mft, Np); small contraction (Mb), small output
        Y = jnp.einsum("kgfm,kgmn->kgfn", oh, Bsel,
                       preferred_element_type=dtype)
        Yst = Y.transpose(0, 2, 1, 3).reshape(Btp, Mft, Gmax * Np)
        # the Mft^2 syrk has contraction G*Np — MXU-efficient
        red = jnp.einsum("kfa,kha->kfh", Yst, Yst,
                         preferred_element_type=dtype)
        if g.has_acc:
            Asel = jnp.einsum("kgb,bmn->kgmn", ohc, AccIn,
                              preferred_element_type=dtype)
            A1 = jnp.einsum("kgfm,kgmn->kgfn", oh, Asel,
                            preferred_element_type=dtype)
            A1st = A1.transpose(0, 2, 1, 3).reshape(Btp, Mft, Gmax * Mb)
            OHst = oh.transpose(0, 2, 1, 3).reshape(Btp, Mft, Gmax * Mb)
            red = red + jnp.einsum("kfa,kha->kfh", A1st, OHst,
                                   preferred_element_type=dtype)
        # parent panel part: frame rows x first Npt cols
        Mpt = Npt + Mbt
        region = jax.lax.dynamic_slice(
            Lx, (g.pb_base,), (g.pb_B * Mpt * Npt,)).reshape(g.pb_B, Mpt,
                                                             Npt)
        region = region - red[:, :, :Npt]
        Lx = jax.lax.dynamic_update_slice(Lx, region.reshape(-1),
                                          (g.pb_base,))
        if Mbt:
            acc = jax.lax.dynamic_slice(
                Acc, (g.pb_acc,), (g.pb_B * Mbt * Mbt,)).reshape(
                    g.pb_B, Mbt, Mbt)
            acc = acc + red[:, Npt:, Npt:]
            Acc = jax.lax.dynamic_update_slice(Acc, acc.reshape(-1),
                                               (g.pb_acc,))
    return Lx, Acc


def _level_step_pt(Lx, Acc, bucket_arrays, bucket_meta, level_groups,
                   acc_bases, syrk_bf16=False):
    for (pe, rmask, cmask), (Np, Mb, base, B), groups, acc_b in zip(
            bucket_arrays, bucket_meta, level_groups, acc_bases):
        Mp = Np + Mb
        P = jax.lax.dynamic_slice(Lx, (base,), (B * Mp * Np,))
        P = P.reshape(B, Mp, Np)
        T = jnp.tril(P[:, :Np, :])        # upper may hold projection junk
        Tfull = T + jnp.tril(T, -1).transpose(0, 2, 1)
        Tfull = Tfull + jax.vmap(jnp.diag)(pe)
        C = jnp.linalg.cholesky(Tfull)
        if Mb:
            Bm = P[:, Np:, :]
            Bm = jax.lax.linalg.triangular_solve(
                C, Bm, left_side=False, lower=True, transpose_a=True)
            Bs = Bm.astype(jnp.bfloat16) if syrk_bf16 else Bm
            U = jnp.einsum("bik,bjk->bij", Bs, Bs,
                           preferred_element_type=Lx.dtype)
            acc = jax.lax.dynamic_slice(
                Acc, (acc_b,), (B * Mb * Mb,)).reshape(B, Mb, Mb)
            U = U + acc                   # children's passed-through updates
            newP = jnp.concatenate([C, Bm], axis=1)
        else:
            newP = C
        newP = newP * rmask[:, :, None] * cmask[:, None, :]
        Lx = jax.lax.dynamic_update_slice(Lx, newP.reshape(-1), (base,))
        if Mb:
            Lx, Acc = _project_groups(Lx, Acc, U, groups, Mb, Lx.dtype)
    return Lx, Acc


def pt_numeric_program(vals, a_src, a_dst, plan, pt: PTPlan, dtype,
                       syrk_bf16=False):
    """The full numeric factorization with pass-through extend-add, as one
    compiled program (jitted per (pattern, dtype))."""
    arrays = plan.arrays(dtype)        # (padeye, rowmask, colmask, dest)
    meta = plan.meta
    acc_bases = tuple(
        tuple(pt.acc_base[(li, bi)] for bi in range(len(lv)))
        for li, lv in enumerate(plan.levels))
    key = ("pt_prog", np.dtype(dtype).name, syrk_bf16)
    cache = pt.__dict__.setdefault("_progs", {})
    prog = cache.get(key)
    if prog is None:
        import functools

        @functools.partial(jax.jit, static_argnums=())
        def prog(vals, a_src, a_dst):
            Lx = jnp.zeros(plan.total + 1, dtype=dtype)
            Lx = Lx.at[a_dst].set(vals[a_src], indices_are_sorted=True,
                                  unique_indices=True,
                                  mode="promise_in_bounds")
            Acc = jnp.zeros(pt.acc_total, dtype=dtype)
            for li in range(len(meta)):
                barr = tuple(t[:3] for t in arrays[li])
                Lx, Acc = _level_step_pt(Lx, Acc, barr, meta[li],
                                         pt.groups[li], acc_bases[li],
                                         syrk_bf16)
            return Lx
        cache[key] = prog
    return prog(jnp.asarray(vals, dtype=dtype), jnp.asarray(a_src),
                jnp.asarray(a_dst))
