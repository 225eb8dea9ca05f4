"""Shape-generic "wave" numeric/solve programs: O(#distinct shapes) compile.

The unrolled programs in super_numeric.py trace one op chain per
(level, bucket) — O(#buckets) XLA ops, which explodes compile time on real
patterns (reference-default amalgamation configs produce hundreds of
buckets; see NOTES_ROUND1.md).  This module compiles the SAME schedule as
ONE ``lax.scan`` over a static instruction stream with a ``lax.switch``
over *shape classes*:

  * every bucket is split into uniform **waves** of ``W`` panels (W fixed
    per padded shape class ``(Np, Mb)``, chosen from the bucket-size
    distribution at analyze time; the panel layout reserves pad space so
    each wave is one contiguous ``dynamic_slice``);
  * all waves of a class share one traced branch body (batched POTRF /
    TRSM / SYRK + the sorted-segment extend-add), with per-wave operands
    (base offset, masks, segment maps) gathered from stacked per-class
    arrays by the wave's position;
  * the compiled program size is O(#classes), independent of the number
    of buckets/levels, so reference-default supernode granularity
    (cholmod_super_symbolic.c:475-560 nrelax={4,16,48}) compiles in
    seconds rather than minutes.

This plays the role of the reference GPU path's fixed uberkernel over a
work queue (GPUQREngine_UberKernel.cu:17-29; CHOLMOD/GPU pinned-buffer
pipeline, cholmod_core.h:984-997) — re-designed as a compiler-friendly
scan instead of a device-side scheduler.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.sparse import INDEX
from .super_numeric import NumericPlan, scatter_add_maps, sorted_scatter_maps


def _pad_to(a: np.ndarray, length: int, fill) -> np.ndarray:
    out = np.full((length,) + a.shape[1:], fill, dtype=a.dtype)
    out[:len(a)] = a
    return out


@dataclasses.dataclass
class _WaveClass:
    """Stacked per-wave operands for one (Np, Mb, W) shape class."""

    Np: int
    Mb: int
    W: int
    L: int                  # padded extend-add entry count
    K: int                  # padded extend-add segment count (>= k+1 always)
    CL: int                 # padded solve col-set length
    CK: int
    RL: int                 # padded solve row-update length
    RK: int
    base: np.ndarray        # (T,) flat offsets
    padeye: np.ndarray      # (T, W, Np)
    rowmask: np.ndarray     # (T, W, Np+Mb)
    colmask: np.ndarray     # (T, W, Np)
    src: np.ndarray         # (T, L) into U.reshape(-1)
    ids: np.ndarray         # (T, L) sorted segment ids
    dst: np.ndarray         # (T, K) sorted unique flat targets (pads in trash)
    colidx: np.ndarray      # (T, W, Np) global col index (pad = n)
    rowidx: np.ndarray      # (T, W, Mb) global row index (pad = n)
    c_src: np.ndarray       # (T, CL)
    c_dst: np.ndarray       # (T, CK)
    r_src: np.ndarray       # (T, RL)
    r_ids: np.ndarray       # (T, RL)
    r_dst: np.ndarray       # (T, RK)


@dataclasses.dataclass
class WavePlan:
    """Instruction-stream plan: classes + (class, position) per wave."""

    plan: NumericPlan
    classes: list[_WaveClass]
    instr_cls: np.ndarray   # (T,) class id per wave, schedule order
    instr_pos: np.ndarray   # (T,) position within the class stack
    buf: int                # factor buffer length (total + 1 + trash region)
    xpad: int               # extra trash rows for the solve buffer
    solve_only: bool = False  # factor extend-add maps skipped (pf program)
    _cache: dict = dataclasses.field(default_factory=dict)

    @property
    def meta(self):
        return tuple((c.Np, c.Mb, c.W, c.L, c.K, c.CL, c.CK, c.RL, c.RK)
                     for c in self.classes)

    def arrays(self, dtype):
        key = np.dtype(dtype).name
        got = self._cache.get(key)
        if got is None:
            got = tuple(
                dict(base=jnp.asarray(c.base),
                     padeye=jnp.asarray(c.padeye, dtype=dtype),
                     rowmask=jnp.asarray(c.rowmask, dtype=dtype),
                     colmask=jnp.asarray(c.colmask, dtype=dtype),
                     src=jnp.asarray(c.src), ids=jnp.asarray(c.ids),
                     dst=jnp.asarray(c.dst))
                for c in self.classes)
            self._cache[key] = got
        return got

    def solve_arrays(self, dtype):
        key = ("solve", np.dtype(dtype).name)
        got = self._cache.get(key)
        if got is None:
            got = tuple(
                dict(base=jnp.asarray(c.base),
                     padeye=jnp.asarray(c.padeye, dtype=dtype),
                     colidx=jnp.asarray(c.colidx),
                     rowidx=jnp.asarray(c.rowidx),
                     c_src=jnp.asarray(c.c_src), c_dst=jnp.asarray(c.c_dst),
                     r_src=jnp.asarray(c.r_src), r_ids=jnp.asarray(c.r_ids),
                     r_dst=jnp.asarray(c.r_dst))
                for c in self.classes)
            self._cache[key] = got
        return got

    @property
    def instr(self):
        key = "instr"
        got = self._cache.get(key)
        if got is None:
            got = (jnp.asarray(self.instr_cls), jnp.asarray(self.instr_pos))
            self._cache[key] = got
        return got


def build_wave_plan(plan: NumericPlan, solve_only: bool = False) -> WavePlan:
    """Split the per-level buckets into uniform waves and stack operands
    per shape class.  Pure host preprocessing (runs once per pattern).

    solve_only: skip the factor extend-add maps (the expensive part of this
    builder) — used when the pass-forward program (pf.py) owns the numeric
    phase and this plan only drives wave_lsolve/wave_ltsolve."""
    n, total = plan.n, plan.total
    trash = total
    if solve_only:
        import os
        # Fatter merged solve waves measured NO solve-time gain at any
        # size (lap3d_28: 11.9 vs 11.6 ms; lap3d_44: 34.4 vs 33.2) and
        # correlate with a sharply higher hit rate of the flaky
        # TPU-worker fault at lap3d_64 (NOTES_ROUND5.md §7), so merging
        # defaults OFF; set SSTPU_SOLVE_WCAP_MB (e.g. 256) to enable.
        scap = int(os.environ.get("SSTPU_SOLVE_WCAP_MB", "0")) << 20
        if not scap:
            scap = -1          # merge disabled (m stays 1)
    # pass 1: enumerate waves in schedule order
    waves = []   # (key, dict of per-wave raw pieces)
    for lv in plan.levels:
        for b in lv:
            Np, Mb, B = b.Np, b.Mb, len(b.sids)
            Mp = Np + Mb
            W = int(b.W)
            nw = -(-B // W)
            if solve_only and nw > 1:
                # Fatter solve waves (VERDICT r4 item 8): the solve's cost
                # floor is per-instruction issue (~7 ms at lap3d_28), so
                # merge a bucket's waves into as few instructions as the
                # slice-size cap allows.  The panel layout pads each
                # bucket to nw*W slots, so any merge factor m | nw keeps
                # every wave one contiguous dynamic_slice; merged pad
                # slots carry zero masks / colidx=n and are inert (same
                # contract as tail-wave padding).  Solve-only plans never
                # drive the factor extend-add, so the factor W stays
                # untouched.
                m = nw
                while m > 1 and (nw % m or m * W * Mp * Np * 4 > scap):
                    m -= 1
                W, nw = m * W, nw // m
            for w in range(nw):
                lo, hi = w * W, min((w + 1) * W, B)
                breal = hi - lo
                base_w = b.base + lo * Mp * Np
                padeye = np.ones((W, Np))
                padeye[:breal] = b.padeye[lo:hi]
                rowmask = np.zeros((W, Mp))
                rowmask[:breal] = b.rowmask[lo:hi]
                colmask = np.zeros((W, Np))
                colmask[:breal] = b.colmask[lo:hi]
                colidx = np.full((W, Np), n, dtype=INDEX)
                colidx[:breal] = b.colidx[lo:hi]
                rowidx = np.full((W, Mb), n, dtype=INDEX)
                if Mb:
                    rowidx[:breal] = b.rowidx[lo:hi]
                if Mb and not solve_only:
                    src, ids, dst = scatter_add_maps(
                        b.dest[lo:hi].reshape(-1), trash)
                else:
                    src = ids = dst = np.empty(0, dtype=INDEX)
                # solve maps (same construction as _Bucket.solve_maps)
                cflat = colidx.reshape(-1)
                c_src, c_dst = sorted_scatter_maps(
                    np.where(cflat == n, -1, cflat))
                r_src, r_ids, r_dst = scatter_add_maps(rowidx.reshape(-1), n)
                waves.append(((Np, Mb, W), dict(
                    base=base_w, padeye=padeye, rowmask=rowmask,
                    colmask=colmask, colidx=colidx, rowidx=rowidx,
                    src=src, ids=ids, dst=dst,
                    c_src=c_src, c_dst=c_dst,
                    r_src=r_src, r_ids=r_ids, r_dst=r_dst)))

    # pass 2: group by class, pad map lengths to the class max
    keys = []
    by_class: dict[tuple, list] = {}
    for key, wv in waves:
        if key not in by_class:
            by_class[key] = []
            keys.append(key)
        by_class[key].append(wv)
    cls_id = {key: i for i, key in enumerate(keys)}

    classes = []
    kmax = 1
    xkmax = 1
    for key in keys:
        Np, Mb, W = key
        ws = by_class[key]
        L = max(len(w["src"]) for w in ws)
        # always >= k+1 so padded src entries can target a pad segment
        K = (max(len(w["dst"]) for w in ws) + 1) if L else 0
        # col-set maps are 1:1 (plain scatter-set), so src/dst share a length
        CL = max(len(w["c_src"]) for w in ws)
        CK = CL
        RL = max(len(w["r_src"]) for w in ws)
        RK = (max(len(w["r_dst"]) for w in ws) + 1) if RL else 0
        kmax = max(kmax, K)
        xkmax = max(xkmax, CK, RK)

        def stack(fn):
            return np.stack([fn(w) for w in ws])

        def padmap(name, length, k_name, k_len, dst_base):
            """Pad (src-like, ids-like, dst-like) triples per wave."""
            srcs, idss, dsts = [], [], []
            for w in ws:
                s, i, d = w[name], w[name.replace("src", "ids")], w[k_name]
                k = len(d)
                srcs.append(_pad_to(s, length, 0))
                idss.append(_pad_to(i, length, max(k_len - 1, 0)))
                dpad = np.concatenate([
                    d, dst_base + 1 + np.arange(k_len - k, dtype=INDEX)])
                dsts.append(dpad.astype(INDEX))
            return np.stack(srcs), np.stack(idss), np.stack(dsts)

        if L:
            src, ids, dst = padmap("src", L, "dst", K, trash)
        else:
            T = len(ws)
            src = ids = np.zeros((T, 0), dtype=INDEX)
            dst = np.zeros((T, 0), dtype=INDEX)
        # solve col-set: plain sorted+unique scatter (no ids); pad dst into
        # distinct trash rows past n so uniqueness holds
        c_srcs, c_dsts = [], []
        for w in ws:
            ck = len(w["c_dst"])
            c_srcs.append(_pad_to(w["c_src"], CL, 0))
            c_dsts.append(np.concatenate([
                w["c_dst"], n + 1 + np.arange(CL - ck, dtype=INDEX)
            ]).astype(INDEX))
        if RL:
            r_src, r_ids, r_dst = padmap("r_src", RL, "r_dst", RK, n)
        else:
            T = len(ws)
            r_src = r_ids = np.zeros((T, 0), dtype=INDEX)
            r_dst = np.zeros((T, 0), dtype=INDEX)

        classes.append(_WaveClass(
            Np=Np, Mb=Mb, W=W, L=L, K=K, CL=CL, CK=CK, RL=RL, RK=RK,
            base=np.array([w["base"] for w in ws], dtype=INDEX),
            padeye=stack(lambda w: w["padeye"]),
            rowmask=stack(lambda w: w["rowmask"]),
            colmask=stack(lambda w: w["colmask"]),
            src=src, ids=ids, dst=dst,
            colidx=stack(lambda w: w["colidx"]),
            rowidx=stack(lambda w: w["rowidx"]),
            c_src=np.stack(c_srcs), c_dst=np.stack(c_dsts),
            r_src=r_src, r_ids=r_ids, r_dst=r_dst))

    pos_ctr = {key: 0 for key in keys}
    instr_cls = np.empty(len(waves), dtype=np.int32)
    instr_pos = np.empty(len(waves), dtype=np.int32)
    for t, (key, _) in enumerate(waves):
        instr_cls[t] = cls_id[key]
        instr_pos[t] = pos_ctr[key]
        pos_ctr[key] += 1

    return WavePlan(plan=plan, classes=classes, instr_cls=instr_cls,
                    instr_pos=instr_pos, buf=total + 1 + kmax,
                    xpad=1 + xkmax, solve_only=solve_only)


# ---------------------------------------------------------------------------
# Numeric program
# ---------------------------------------------------------------------------

def _numeric_branch(Np, Mb, W, L, K, syrk_bf16):
    Mp = Np + Mb

    def br(Lx, pos, ops):
        base = ops["base"][pos]
        pe = ops["padeye"][pos]
        rm = ops["rowmask"][pos]
        cmk = ops["colmask"][pos]
        P = jax.lax.dynamic_slice(Lx, (base,), (W * Mp * Np,))
        P = P.reshape(W, Mp, Np)
        T = P[:, :Np, :]
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
            newP = jnp.concatenate([C, Bm], axis=1)
        else:
            newP = C
        newP = newP * rm[:, :, None] * cmk[:, None, :]
        Lx = jax.lax.dynamic_update_slice(Lx, newP.reshape(-1), (base,))
        if Mb and L:
            u = U.reshape(-1)[ops["src"][pos]]
            seg = jax.ops.segment_sum(u, ops["ids"][pos], num_segments=K,
                                      indices_are_sorted=True)
            Lx = Lx.at[ops["dst"][pos]].add(
                -seg, indices_are_sorted=True, unique_indices=True,
                mode="promise_in_bounds")
        return Lx
    return br


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _wave_numeric_program(vals, a_src, a_dst, instr, class_ops, meta, buf,
                          syrk_bf16=False):
    """The full numeric factorization as one scanned program."""
    Lx = jnp.zeros(buf, dtype=vals.dtype)
    Lx = Lx.at[a_dst].set(vals[a_src], indices_are_sorted=True,
                          unique_indices=True, mode="promise_in_bounds")
    branches = [
        (lambda brf, ops: (lambda Lx, pos: brf(Lx, pos, ops)))(
            _numeric_branch(Np, Mb, W, L, K, syrk_bf16), ops)
        for ops, (Np, Mb, W, L, K, *_rest) in zip(class_ops, meta)]

    def body(Lx, xs):
        cid, pos = xs
        return jax.lax.switch(cid, branches, Lx, pos), None

    Lx, _ = jax.lax.scan(body, Lx, instr)
    return Lx


def wave_numeric(vals, wp: WavePlan, dtype, syrk_bf16=False):
    assert not wp.solve_only, \
        "wave plan was built solve_only; rebuild with wave_plan()"
    ops = wp.arrays(dtype)
    amaps = wp._cache.get("amaps")
    if amaps is None:
        from .super_numeric import _a_sorted_maps
        a_src, a_dst = _a_sorted_maps(wp.plan.ss)
        amaps = (jnp.asarray(a_src), jnp.asarray(a_dst))
        wp._cache["amaps"] = amaps
    return _wave_numeric_program(
        jnp.asarray(vals, dtype=dtype), amaps[0], amaps[1],
        wp.instr, ops, wp.meta, wp.buf, syrk_bf16)


# ---------------------------------------------------------------------------
# Solve programs (super_lsolve / super_ltsolve as scanned waves)
# ---------------------------------------------------------------------------

def _dinv_layout(wp: "WavePlan"):
    """Per-class base offsets into the Dinv buffer (inverted diagonal
    blocks, classes with 8 < Np <= 128 only — the latency-bound regime
    where the explicit inverse wins; bigger/smaller classes keep their
    in-branch path)."""
    got = wp._cache.get("dinv_layout")
    if got is None:
        bases = []
        off = 0
        for c in wp.classes:
            if 8 < c.Np <= 128:
                bases.append(off)
                off += len(c.base) * c.W * c.Np * c.Np
            else:
                bases.append(-1)
        got = (tuple(bases), off)
        wp._cache["dinv_layout"] = got
    return got


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _build_dinv(Lx, class_ops, meta, bases, total):
    """Invert every (<=128-wide) diagonal block ONCE per factorization:
    the solve then applies each wave's triangular solve as a single
    einsum against the stored inverse, instead of rebuilding the
    batch-folded inverse inside every wave of every solve call."""
    from .pf import _tri_inv_pow2
    out = jnp.zeros(max(total, 1), dtype=Lx.dtype)
    for ops, (Np, Mb, W, *_r), b0 in zip(class_ops, meta, bases):
        if b0 < 0:
            continue
        Mp = Np + Mb
        T = ops["base"].shape[0]
        P = jax.vmap(
            lambda b: jax.lax.dynamic_slice(Lx, (b,), (W * Mp * Np,)))(
            ops["base"])
        P = P.reshape(T * W, Mp, Np)[:, :Np, :]
        C = P + jax.vmap(jnp.diag)(
            ops["padeye"].astype(Lx.dtype).reshape(T * W, Np))
        inv = _tri_inv_pow2(C)
        out = jax.lax.dynamic_update_slice(out, inv.reshape(-1), (b0,))
    return out


def solve_dinv(wp: "WavePlan", Lx):
    """The per-factor Dinv buffer (cached by the caller per factor)."""
    bases, total = _dinv_layout(wp)
    ops = wp.solve_arrays(Lx.dtype)
    return _build_dinv(Lx, ops, wp.meta, bases, total)


def _tri_apply(C, xc, transpose):
    """Batched triangular solve of (W,Np,k) against (W,Np,Np): for the
    latency-bound small-Np classes, solve via the batch-folded explicit
    inverse (pf._tri_inv_pow2) + one einsum — XLA's triangular_solve is a
    sequential While over Np columns regardless of W."""
    Np = C.shape[1]
    if 8 < Np <= 128:
        from .pf import _tri_inv_pow2
        Linv = _tri_inv_pow2(C)
        eq = "bji,bjk->bik" if transpose else "bij,bjk->bik"
        return jnp.einsum(eq, Linv, xc, preferred_element_type=xc.dtype)
    return jax.lax.linalg.triangular_solve(
        C, xc, left_side=True, lower=True, transpose_a=transpose)


def _lsolve_branch(Np, Mb, W, CL, CK, RL, RK, dinv_base=-1):
    Mp = Np + Mb

    def br(args, pos, ops):
        Lx, x, Dv = args
        base = ops["base"][pos]
        P = jax.lax.dynamic_slice(Lx, (base,), (W * Mp * Np,))
        P = P.reshape(W, Mp, Np)
        xc = x[ops["colidx"][pos]]
        if dinv_base >= 0:
            Li = jax.lax.dynamic_slice(
                Dv, (dinv_base + pos * W * Np * Np,), (W * Np * Np,))
            Li = Li.reshape(W, Np, Np)
            xc = jnp.einsum("bij,bjk->bik", Li, xc,
                            preferred_element_type=x.dtype)
        else:
            pe = ops["padeye"][pos]
            C = P[:, :Np, :] + jax.vmap(jnp.diag)(pe)
            xc = _tri_apply(C, xc, transpose=False)
        k = x.shape[-1]
        x = x.at[ops["c_dst"][pos]].set(
            xc.reshape(-1, k)[ops["c_src"][pos]],
            indices_are_sorted=True, unique_indices=True,
            mode="promise_in_bounds")
        if Mb and RL:
            Bm = P[:, Np:, :]
            upd = jnp.einsum("bmc,bck->bmk", Bm, xc,
                             preferred_element_type=x.dtype)
            u = upd.reshape(-1, k)[ops["r_src"][pos]]
            seg = jax.ops.segment_sum(u, ops["r_ids"][pos], num_segments=RK,
                                      indices_are_sorted=True)
            x = x.at[ops["r_dst"][pos]].add(
                -seg, indices_are_sorted=True, unique_indices=True,
                mode="promise_in_bounds")
        return (Lx, x, Dv)
    return br


def _ltsolve_branch(Np, Mb, W, CL, CK, RL, RK, dinv_base=-1):
    Mp = Np + Mb

    def br(args, pos, ops):
        Lx, x, Dv = args
        base = ops["base"][pos]
        P = jax.lax.dynamic_slice(Lx, (base,), (W * Mp * Np,))
        P = P.reshape(W, Mp, Np)
        xc = x[ops["colidx"][pos]]
        if Mb:
            Bm = P[:, Np:, :]
            xr = x[ops["rowidx"][pos]]
            xc = xc - jnp.einsum("bmc,bmk->bck", Bm, xr,
                                 preferred_element_type=x.dtype)
        if dinv_base >= 0:
            Li = jax.lax.dynamic_slice(
                Dv, (dinv_base + pos * W * Np * Np,), (W * Np * Np,))
            Li = Li.reshape(W, Np, Np)
            xc = jnp.einsum("bji,bjk->bik", Li, xc,
                            preferred_element_type=x.dtype)
        else:
            pe = ops["padeye"][pos]
            C = P[:, :Np, :] + jax.vmap(jnp.diag)(pe)
            xc = _tri_apply(C, xc, transpose=True)
        k = x.shape[-1]
        x = x.at[ops["c_dst"][pos]].set(
            xc.reshape(-1, k)[ops["c_src"][pos]],
            indices_are_sorted=True, unique_indices=True,
            mode="promise_in_bounds")
        return (Lx, x, Dv)
    return br


@functools.partial(jax.jit, static_argnums=(5, 6, 7), donate_argnums=(1,))
def _wave_lsolve_program(Lx, x, Dv, instr, class_ops, meta, bases,
                         transpose):
    """Scanned solve.  The factor buffer is an INVARIANT closed over by
    the scan body — carrying it (the round-2 form) made lax.scan copy the
    whole factor every step (tools/ablate_pf.py measurement); the carry
    is now just the small x panel."""
    mk = _ltsolve_branch if transpose else _lsolve_branch
    branches = [
        (lambda brf, ops: (lambda x, pos: brf((Lx, x, Dv), pos, ops)[1]))(
            mk(Np, Mb, W, CL, CK, RL, RK, b0), ops)
        for ops, (Np, Mb, W, _L, _K, CL, CK, RL, RK), b0
        in zip(class_ops, meta, bases)]

    def body(x, xs):
        cid, pos = xs
        return jax.lax.switch(cid, branches, x, pos), None

    x, _ = jax.lax.scan(body, x, instr)
    return x


@functools.partial(jax.jit, static_argnums=(3, 5, 6, 7),
                   donate_argnums=(1,))
def _wave_lsolve_unroll(Lx, x, Dv, seq, class_ops, meta, bases, transpose):
    """Straight-line solve (default): in-place x updates, no switch."""
    mk = _ltsolve_branch if transpose else _lsolve_branch
    branches = [
        (lambda brf, ops: (lambda x, pos: brf((Lx, x, Dv), pos, ops)[1]))(
            mk(Np, Mb, W, CL, CK, RL, RK, b0), ops)
        for ops, (Np, Mb, W, _L, _K, CL, CK, RL, RK), b0
        in zip(class_ops, meta, bases)]
    for cid, pos in seq:
        x = branches[cid](x, pos)
    return x


def _solve_form():
    import os
    return os.environ.get("SSTPU_PF_FORM", "unroll")


@functools.partial(jax.jit, static_argnums=(3, 5, 6, 7, 8))
def _wave_solve_llt(Lx, bk, Dv, seq, class_ops, meta, bases, xrows, scan,
                    perm=None, invperm=None):
    """The FULL A-system substitution pair (pad -> L-solve -> Lt-solve) as
    ONE compiled program.  Per-call dispatch through the remote tunnel is
    ~2-5 ms (tools/microbench_dispatch.py), so the previous three-call
    chain (pad, lsolve, ltsolve) put a ~10 ms floor under every solve —
    larger than the entire substitution work for most matrices.

    perm/invperm: optional DEVICE permutation (cholmod_solve's P/P');
    when given the whole A-system solve — permute, substitute, permute
    back — runs on device and returns (n, k), so repeated solves never
    round-trip the RHS through the host."""
    n, k = bk.shape
    x = jnp.zeros((xrows, k), dtype=Lx.dtype)
    if perm is not None:
        x = x.at[:n, :].set(bk[perm].astype(Lx.dtype))
    else:
        x = x.at[:n, :].set(bk.astype(Lx.dtype))
    bl = [
        (lambda brf, ops: (lambda x, pos: brf((Lx, x, Dv), pos, ops)[1]))(
            _lsolve_branch(Np, Mb, W, CL, CK, RL, RK, b0), ops)
        for ops, (Np, Mb, W, _L, _K, CL, CK, RL, RK), b0
        in zip(class_ops, meta, bases)]
    bt = [
        (lambda brf, ops: (lambda x, pos: brf((Lx, x, Dv), pos, ops)[1]))(
            _ltsolve_branch(Np, Mb, W, CL, CK, RL, RK, b0), ops)
        for ops, (Np, Mb, W, _L, _K, CL, CK, RL, RK), b0
        in zip(class_ops, meta, bases)]
    if scan:
        ic = jnp.asarray([c for c, _ in seq])
        ip = jnp.asarray([p for _, p in seq])

        def body_l(x, xs):
            cid, pos = xs
            return jax.lax.switch(cid, bl, x, pos), None

        def body_t(x, xs):
            cid, pos = xs
            return jax.lax.switch(cid, bt, x, pos), None

        x, _ = jax.lax.scan(body_l, x, (ic, ip))
        x, _ = jax.lax.scan(body_t, x, (ic[::-1], ip[::-1]))
        return x[invperm] if invperm is not None else x
    for cid, pos in seq:
        x = bl[cid](x, pos)
    for cid, pos in reversed(seq):
        x = bt[cid](x, pos)
    return x[invperm] if invperm is not None else x


def wave_solve_llt(wp: WavePlan, Lx, bk, Dv=None, perm=None, invperm=None):
    """Fused L then Lt substitution; bk is the (n, k) permuted RHS — or,
    when perm/invperm device arrays are given, the UNpermuted RHS with the
    permutation applied in-program (returns (n, k)).
    Dv: per-factor inverted diagonal blocks (solve_dinv) — built on the
    fly when not supplied."""
    ops = wp.solve_arrays(Lx.dtype)
    bases, _ = _dinv_layout(wp)
    if Dv is None:
        Dv = solve_dinv(wp, Lx)
    seq = tuple((int(c), int(p))
                for c, p in zip(wp.instr_cls, wp.instr_pos))
    return _wave_solve_llt(Lx, bk, Dv, seq, ops, wp.meta, bases,
                           wp.plan.n + wp.xpad, _solve_form() == "scan",
                           perm, invperm)


def wave_lsolve(wp: WavePlan, Lx, x, Dv=None):
    ops = wp.solve_arrays(Lx.dtype)
    bases, _ = _dinv_layout(wp)
    if Dv is None:
        Dv = solve_dinv(wp, Lx)
    if _solve_form() == "scan":
        return _wave_lsolve_program(Lx, x, Dv, wp.instr, ops, wp.meta,
                                    bases, False)
    seq = tuple((int(c), int(p))
                for c, p in zip(wp.instr_cls, wp.instr_pos))
    return _wave_lsolve_unroll(Lx, x, Dv, seq, ops, wp.meta, bases, False)


def wave_ltsolve(wp: WavePlan, Lx, x, Dv=None):
    ops = wp.solve_arrays(Lx.dtype)
    bases, _ = _dinv_layout(wp)
    if Dv is None:
        Dv = solve_dinv(wp, Lx)
    if _solve_form() == "scan":
        ic, ip = wp.instr
        rinstr = (ic[::-1], ip[::-1])
        return _wave_lsolve_program(Lx, x, Dv, rinstr, ops, wp.meta,
                                    bases, True)
    seq = tuple((int(c), int(p))
                for c, p in zip(wp.instr_cls[::-1], wp.instr_pos[::-1]))
    return _wave_lsolve_unroll(Lx, x, Dv, seq, ops, wp.meta, bases, True)
