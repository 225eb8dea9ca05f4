"""Pass-forward (multifrontal) numeric program: MXU extend-add.

Round-2 measurement on the real v5e: XLA's element-granular gather /
scatter / segment ops run at 10-20 GB/s, so the sorted-segment extend-add
was 93% of the numeric phase (185 ms of 199 ms on lap3d_28).  This module
replaces it with the CLASSICAL multifrontal update flow (Duff/Reid; the
reference's frontal assembly t_cholmod_super_numeric.c:596-640, GPU map
kernels cholmod_gpu_kernels.cu:17-66) re-architected for the MXU:

  * every supernode owns an (Mb x Mb) **update slot** in a bucket-
    contiguous update buffer appended to the panel buffer.  A child's
    Schur complement goes ONLY to its parent's frame (the multifrontal
    containment theorem, asserted at plan time) and the un-owned part is
    passed upward through the parent's own update;
  * the child->parent frame placement is patch = Wh U Whᵀ with Wh a
    one-hot row-placement matrix built on the fly from a static index
    array (VPU compare), executed as a coarse row-gather + ONE batched
    einsum per child group — MXU work instead of element scatters;
  * children of one parent bucket are stacked on a padded group axis, so
    whole elimination levels project in a handful of batched matmuls;
  * small-update buckets where the projection flops would dwarf the data
    keep a 1-HOP sorted-segment scatter (into the parent frame only, not
    all ancestors) — chosen per bucket by a measured cost model.

Program form: like wave.py, ONE ``lax.scan`` over a static instruction
stream with ``lax.switch`` over shape classes (factor classes + projection
classes), so compile time is O(#distinct shapes).  The panel layout, the
A-assembly map, and the solve programs are shared with wave.py unchanged.

Update-slot convention: a slot holds the accumulated incoming update in
LOWER-triangle-canonical form until its supernode factors (the factor
branch symmetrizes), then the FULL symmetric outgoing update U = B Bᵀ+acc.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.sparse import INDEX
from .super_numeric import NumericPlan, scatter_add_maps

__all__ = ["PFPlan", "build_pf_plan", "pf_numeric"]


def _pow2ceil(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _pad_to(a: np.ndarray, length: int, fill) -> np.ndarray:
    out = np.full((length,) + a.shape[1:], fill, dtype=a.dtype)
    out[:len(a)] = a
    return out


# ---------------------------------------------------------------------------
# Host planning
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PFPlan:
    plan: NumericPlan
    fmeta: tuple        # per factor class: (Np, Mb, W, mode, L, K)
    fops: list          # per factor class: dict of stacked host arrays
    pmeta: tuple        # per proj class: (Wc, Mbc, Wp, Npt, Mbt, G)
    pops: list          # per proj class: dict of stacked host arrays
    qmeta: tuple = ()   # per PAIR class: (Mbc, G, Pq, Npt, Mbt)
    qops: list = dataclasses.field(default_factory=list)
    instr_cls: np.ndarray = None  # class id per instruction: [f | p | q]
    instr_pos: np.ndarray = None  # position within the class stack
    buf: int = 0
    ub_total: int = 0
    proj_flops: float = 0.0   # projection flop count (diagnostic)
    scat_entries: int = 0     # 1-hop scatter entry count (diagnostic)
    _cache: dict = dataclasses.field(default_factory=dict)

    @property
    def meta(self):
        return (self.fmeta, self.pmeta, self.qmeta)

    def arrays(self, dtype):
        key = np.dtype(dtype).name
        got = self._cache.get(key)
        if got is None:
            fo = tuple(
                {k: jnp.asarray(v, dtype=dtype)
                 if k in ("padeye", "rowmask", "colmask", "sgn")
                 else jnp.asarray(v) for k, v in ops.items()}
                for ops in self.fops)
            po = tuple({k: jnp.asarray(v) for k, v in ops.items()}
                       for ops in self.pops)
            qo = tuple({k: jnp.asarray(v) for k, v in ops.items()}
                       for ops in self.qops)
            got = (fo, po, qo)
            self._cache[key] = got
        return got

    @property
    def instr(self):
        got = self._cache.get("instr")
        if got is None:
            got = (jnp.asarray(self.instr_cls), jnp.asarray(self.instr_pos))
            self._cache["instr"] = got
        return got

    @property
    def runs(self):
        """(cid, pos0, count) for maximal consecutive same-class runs.
        Positions within a run are consecutive by construction (the
        per-class position counter follows stream order)."""
        got = self._cache.get("runs")
        if got is None:
            runs = []
            for c, p in zip(self.instr_cls.tolist(),
                            self.instr_pos.tolist()):
                if runs and runs[-1][0] == c \
                        and runs[-1][1] + runs[-1][2] == p:
                    runs[-1][2] += 1
                else:
                    runs.append([c, p, 1])
            got = tuple(tuple(r) for r in runs)
            self._cache["runs"] = got
        return got


def _dest_1hop(ss, rows_of, where, ub_slot_of, b, total: int, trash: int):
    """1-hop extend-add targets for one bucket: entry (i, c) of supernode
    s's update goes to the PARENT frame — its panel when the target column
    is a parent pivot column, else the parent's update slot (lower
    triangle only; the slot is lower-canonical until the parent factors).
    """
    sup = ss.super
    B, Mb = len(b.sids), b.Mb
    dest = np.full((B, Mb, Mb), trash, dtype=INDEX)
    parent = np.asarray(ss.sn_parent)
    for k, s in enumerate(np.asarray(b.sids).tolist()):
        ms, ns = ss.panel_shape(s)
        mb = ms - ns
        if not mb:
            continue
        r = rows_of[s][ns:]
        t = int(parent[s])
        assert t >= 0, "supernode with below rows lacks a parent"
        rows_t = rows_of[t]
        ns_t = int(sup[t + 1] - sup[t])
        j1_t = int(sup[t])
        loc = np.searchsorted(rows_t, r)
        ok = loc < len(rows_t)
        locc = np.clip(loc, 0, max(len(rows_t) - 1, 0))
        ok &= rows_t[locc] == r
        assert ok.all(), ("multifrontal containment violated: child below "
                          "rows must lie in the parent front")
        Npt = int(ss.panel_Np[t])
        Mbt = int(ss.panel_Mp[t]) - Npt
        frow = int(ss.panel_off[t]) + ss.norm_local(t, locc) * Npt
        is_col = locc < ns_t                   # target col owned by parent
        below = locc - ns_t                    # parent below-row index
        uoff = ub_slot_of[t]
        ar = np.arange(mb)
        # panel targets: (i, c) with is_col[c]; rows i >= c (lower tri)
        d_panel = frow[:, None] + (r - j1_t)[None, :]
        # update-slot targets: both below; lower tri of the parent slot
        d_ub = uoff + below[:, None] * Mbt + below[None, :]
        d = np.where(is_col[None, :], d_panel, d_ub)
        valid = ar[:, None] >= ar[None, :]
        dest[k, :mb, :mb] = np.where(valid, d, trash)
    return dest


def build_pf_plan(plan: NumericPlan, common=None) -> PFPlan:
    """Host planning, once per pattern: update-buffer layout, per-bucket
    scatter/project mode decision, child->parent projection maps grouped
    by (child bucket, parent chunk), and the stacked instruction stream."""
    from ..core.common import default_common
    cm = common or default_common()
    opts = cm.cholesky
    ss = plan.ss
    n, total = plan.n, plan.total
    sup = ss.super
    parent = np.asarray(ss.sn_parent)
    rows_of = [ss.rows_of(s) for s in range(ss.nsuper)]

    # supernode -> (level, bucket idx, slot)
    where = {}
    for li, lv in enumerate(plan.levels):
        for bi, b in enumerate(lv):
            for slot, s in enumerate(b.sids.tolist()):
                where[int(s)] = (li, bi, slot)

    # --- update-buffer layout (mirrors the panel bucket layout) ----------
    ub_base = {}
    off = total
    for li, lv in enumerate(plan.levels):
        for bi, b in enumerate(lv):
            if b.Mb:
                nw = -(-len(b.sids) // b.W)
                ub_base[(li, bi)] = off
                off += nw * b.W * b.Mb * b.Mb
    ub_total = off - total
    trash = off
    # per-supernode update-slot base (for 1-hop scatter targets)
    ub_slot_of = np.full(ss.nsuper, -1, dtype=np.int64)
    for li, lv in enumerate(plan.levels):
        for bi, b in enumerate(lv):
            if b.Mb:
                base = ub_base[(li, bi)]
                for slot, s in enumerate(b.sids.tolist()):
                    ub_slot_of[int(s)] = base + slot * b.Mb * b.Mb

    # --- per-bucket mode + instruction enumeration ------------------------
    CAP = 24 << 20       # working floats per instruction slice
    # projection workspace budget: generous for small factors (fewer,
    # fatter instructions), tight when the factor buffer itself is HBM-
    # scale (lap3d_64's 7 GB buffer + 1.2 GB workspace OOM'd a 16 GB chip)
    PCAP = 4 * CAP if total * 4 < (2 << 30) else CAP
    f_instrs = []        # (key, ops) in schedule order, tag 'f'
    p_instrs = []        # (key, ops) tag 'p'
    q_instrs = []        # (key, ops) tag 'q' (pair-grouped projections)
    stream = []          # ('f'|'p'|'q', index into the tag list)
    proj_flops = 0.0
    scat_entries = 0
    pair = opts.pf_group == "pair"

    for li, lv in enumerate(plan.levels):
        lv_f = []            # level-local stream: indices into f_instrs
        lv_p = []            # ... into p_instrs
        lv_q = []            # ... into q_instrs
        lv_proj = []
        lv_pairs = {}        # (Mbc, bj) -> [(uoff, slotp, s, t), ...]
        for bi, b in enumerate(lv):
            Np, Mb, B, W = b.Np, b.Mb, len(b.sids), b.W
            Mp = Np + Mb
            nw = -(-B // W)
            mode = 0
            groups = {}
            if Mb:
                # group children by (parent bucket, parent chunk, child win)
                pb_of = {}
                child_list = []      # (slot, s, t, lj, bj, slotp)
                for slot, s in enumerate(b.sids.tolist()):
                    ms, ns = ss.panel_shape(s)
                    if ms == ns:
                        continue     # no below rows (bucket-merge padding)
                    t = int(parent[s])
                    lj, bj, slotp = where[t]
                    assert lj == li + 1, "parent must be on the next level"
                    child_list.append((slot, int(s), t, bj, slotp))
                # per-pair chunk sizes
                est_flops = 0.0
                for slot, s, t, bj, slotp in child_list:
                    pb = plan.levels[li + 1][bj]
                    Mft = pb.Np + pb.Mb
                    est_flops += 2.0 * Mft * pb.Np * Mb + \
                        2.0 * pb.Mb * pb.Mb * Mb
                ent = int(sum(
                    (ss.panel_shape(s)[0] - ss.panel_shape(s)[1]) ** 2
                    for s in b.sids.tolist())) // 2
                t_scat = ent * 4.0 * 3.0 / opts.pf_scatter_bw
                t_proj = est_flops / opts.pf_proj_rate
                mode = 1 if (opts.pf_mode == "project"
                             or (opts.pf_mode == "auto"
                                 and t_proj < t_scat)) else 2
                if mode == 1 and pair:
                    for slot, s, t, bj, slotp in child_list:
                        pb = plan.levels[li + 1][bj]
                        lv_pairs.setdefault(
                            (Mb, pb.Np, pb.Mb), {}).setdefault(
                            (bj, slotp), []).append(
                            (int(ub_slot_of[s]), s, t))
                elif mode == 1:
                    # child window size for the update-stack slice
                    Wc_tot = nw * W
                    Wc = Wc_tot
                    while Wc > 1 and Wc * Mb * Mb > CAP:
                        Wc = (Wc + 1) // 2
                    Wc = _pow2ceil(Wc)
                    for slot, s, t, bj, slotp in child_list:
                        pb = plan.levels[li + 1][bj]
                        Mft = pb.Np + pb.Mb
                        Wp = pb.W
                        # cap includes the (Wp, G, Mft, Mbc) batched
                        # placement workspace (G bounded by 8 below)
                        while Wp > 1 and Wp * Mft * max(8 * Mb, pb.Np) > \
                                4 * CAP:
                            Wp //= 2
                        wc = slot // Wc
                        cp = slotp // Wp
                        key = (bj, cp, wc, Wp)
                        groups.setdefault(key, {}).setdefault(
                            slotp - cp * Wp, []).append((slot - wc * Wc, s, t))
            # ---- factor instructions (one per wave) ----------------------
            ubb = ub_base.get((li, bi), 0)
            if mode == 2:
                dest = _dest_1hop(ss, rows_of, where, ub_slot_of, b,
                                  total, trash)
                scat_entries += ent
            for w in range(nw):
                lo, hi = w * W, min((w + 1) * W, B)
                breal = hi - lo
                padeye = np.ones((W, Np))
                padeye[:breal] = b.padeye[lo:hi]
                rowmask = np.zeros((W, Mp))
                rowmask[:breal] = b.rowmask[lo:hi]
                colmask = np.zeros((W, Np))
                colmask[:breal] = b.colmask[lo:hi]
                ops = dict(base=b.base + lo * Mp * Np,
                           ubs=ubb + lo * Mb * Mb,
                           padeye=padeye, rowmask=rowmask, colmask=colmask)
                if mode == 2:
                    src, ids, dst = scatter_add_maps(
                        dest[lo:hi].reshape(-1), trash)
                    ops.update(src=src, ids=ids, dst=dst)
                key = (Np, Mb, W, mode)
                lv_f.append(len(f_instrs))
                f_instrs.append((key, ops))
            # ---- projection instructions (after this bucket's factor) ----
            if mode == 1:
                Wc_tot = nw * W
                for (bj, cp, wc, Wp), slots_all in sorted(groups.items()):
                  gmax_all = max(len(v) for v in slots_all.values())
                  for gch in range(-(-gmax_all // 8)):
                    # G capped at 8 per instruction (bounds the batched
                    # placement workspace); overflow children go to a
                    # further instruction on the same parent chunk
                    slots = {sp: lst[gch * 8:(gch + 1) * 8]
                             for sp, lst in slots_all.items()
                             if len(lst) > gch * 8}
                    pb = plan.levels[li + 1][bj]
                    Npt, Mbt = pb.Np, pb.Mb
                    Mft = Npt + Mbt
                    G = _pow2ceil(max(len(v) for v in slots.values()))
                    csel = np.full((Wp, G), Wc, dtype=np.int32)
                    idxf = np.full((Wp, G, Mft), Mb, dtype=np.int32)
                    for slotp_rel, childs in slots.items():
                        t = childs[0][2]
                        rows_t = rows_of[t]
                        ns_t = int(sup[t + 1] - sup[t])
                        for g, (slot_rel, s, _t) in enumerate(childs):
                            csel[slotp_rel, g] = slot_rel
                            ms, ns = ss.panel_shape(s)
                            mb = ms - ns
                            r = rows_of[s][ns:]
                            loc = np.searchsorted(rows_t, r)
                            ok = (loc < len(rows_t))
                            locc = np.clip(loc, 0, max(len(rows_t) - 1, 0))
                            ok &= rows_t[locc] == r
                            assert ok.all(), "containment violated"
                            fpos = np.where(locc < ns_t, locc,
                                            Npt + (locc - ns_t))
                            idxf[slotp_rel, g, fpos] = np.arange(
                                mb, dtype=np.int32)
                            proj_flops += (2.0 * Mft * Npt * Mb
                                           + 2.0 * Mbt * Mbt * Mb)
                    ops = dict(cub=ub_base[(li, bi)] + wc * Wc * Mb * Mb,
                               pbase=pb.base + cp * Wp * (Npt + Mbt) * Npt,
                               pub=(ub_base.get((li + 1, bj), 0)
                                    + cp * Wp * Mbt * Mbt),
                               csel=csel, idxf=idxf)
                    key = (Wc, Mb, Wp, Npt, Mbt, G)
                    lv_p.append(len(p_instrs))
                    p_instrs.append((key, ops))

        # ---- pair-grouped projections (after ALL of the level's factors):
        # parent-blocked contraction — children of each parent ride the
        # einsum contraction axis (G), so the patch materializes PER PARENT
        # (P,Mft,Npt), never per child.  Parents are classed by pow2(G) and
        # chunked into contiguous slot windows; children may come from any
        # same-Mb bucket of the level (global slab gather by offset).
        for (Mbc, Npt, Mbt), par_all in sorted(lv_pairs.items()):
            Mft = Npt + Mbt
            # G-axis workspace cap: a single parent with many children can
            # exceed the budget at any P, so children beyond gcap go to
            # follow-up ROUNDS (same parent, separate instructions — the
            # scatter-adds accumulate, and per-round uniqueness holds)
            unit_g = Mft * 2 * Mbc + Mbc * Mbc + 2 * Mft * Npt \
                + Mbt * Mbt
            gcap = 1
            while gcap * 2 * unit_g <= PCAP:
                gcap *= 2
            rounds = max(-(-len(v) // gcap) for v in par_all.values())
            for rnd in range(rounds):
              par = {bs: v[rnd * gcap:(rnd + 1) * gcap]
                     for bs, v in par_all.items() if len(v) > rnd * gcap}
              # G partition, cost-modelled: either ONE class padded to the
              # pair's Gmax, or a pow2 ladder of classes.  Padded G rows
              # are zeros (flops+data), extra classes are extra
              # instructions (~30us dispatch) — pick the cheaper time.
              gs = [len(v) for v in par.values()]
              gmax = _pow2ceil(max(gs))
              pad_single = sum(gmax - g for g in gs)
              pad_pow2 = sum(_pow2ceil(g) - g for g in gs)
              ncls_pow2 = len({_pow2ceil(g) for g in gs})
              unit_cost = 2.0 * Mbc * (Mft * Npt + Mbt * Mbt) / 3e13 \
                  + 2.0 * Mft * Mbc * 4 / 5e11
              single = (pad_single - pad_pow2) * unit_cost \
                  < (ncls_pow2 - 1) * 30e-6
              by_g = {}
              for bs in sorted(par):
                  g = gmax if single else _pow2ceil(len(par[bs]))
                  by_g.setdefault(g, []).append((bs, par[bs]))
              for G, plist in sorted(by_g.items()):
                  # gap-fill (round-5): a parent slot with no children in
                  # this G-class breaks the destination run and forces the
                  # slow scatter mode.  Filling gaps with empty parents
                  # (all-pad idxf rows contribute exact zeros) restores
                  # contiguity when the fill stays under 2x — einsum pad
                  # flops are ~3% of program time, the scatter it replaces
                  # was 12%.
                  import itertools as _it
                  filled = []
                  for bj_, grp in _it.groupby(plist, key=lambda e: e[0][0]):
                      grp = list(grp)
                      sps = {e[0][1]: e for e in grp}
                      lo_, hi_ = min(sps), max(sps)
                      if hi_ - lo_ + 1 <= 2 * len(grp):
                          filled.extend(sps.get(sp, ((bj_, sp), []))
                                        for sp in range(lo_, hi_ + 1))
                      else:
                          filled.extend(grp)
                  plist = filled
                  unit = G * Mft * 2 * Mbc + G * Mbc * Mbc \
                      + 2 * Mft * Npt + Mbt * Mbt
                  cap_p = max(1, PCAP // unit)
                  for p0 in range(0, len(plist), cap_p):
                      ppart = plist[p0:p0 + cap_p]
                      P = len(ppart)
                      Pq = _pow2ceil(P)
                      uoff = np.full((Pq, G), -1, dtype=INDEX)
                      idxf = np.full((Pq, G, Mft), Mbc, dtype=np.int32)
                      # absolute slab destinations; parent pads point past
                      # the buffer end and are dropped by the scatter mode.
                      # Pad sentinels are DISTINCT (and ascending) so the
                      # scatter's unique_indices promise holds even before
                      # FILL_OR_DROP discards them — duplicate indices are
                      # undefined behavior under that promise.
                      pdst = ((1 << 40)
                              + np.arange(Pq, dtype=INDEX) * (Mft * Npt))
                      udst = ((1 << 40)
                              + np.arange(Pq, dtype=INDEX) * max(Mbt * Mbt, 1))
                      for k, ((bj, sp), childs) in enumerate(ppart):
                          pb = plan.levels[li + 1][bj]
                          pdst[k] = pb.base + sp * Mft * Npt
                          udst[k] = ub_base.get((li + 1, bj), 0) \
                              + sp * Mbt * Mbt
                          if not childs:      # gap-fill parent: all pads
                              continue
                          t = childs[0][2]
                          rows_t = rows_of[t]
                          ns_t = int(sup[t + 1] - sup[t])
                          uoff[k, :] = childs[0][0]
                          for g, (uo, s, _t) in enumerate(childs):
                              uoff[k, g] = uo
                              ms, ns = ss.panel_shape(s)
                              mb = ms - ns
                              r = rows_of[s][ns:]
                              loc = np.searchsorted(rows_t, r)
                              ok = loc < len(rows_t)
                              locc = np.clip(loc, 0, max(len(rows_t) - 1, 0))
                              ok &= rows_t[locc] == r
                              assert ok.all(), "containment violated"
                              fpos = np.where(locc < ns_t, locc,
                                              Npt + (locc - ns_t))
                              idxf[k, g, fpos] = np.arange(mb, dtype=np.int32)
                              proj_flops += 2.0 * Mft * Npt * Mbc \
                                  + 2.0 * Mbt * Mbt * Mbc
                      real_u = uoff >= 0
                      assert real_u.any(), "pair chunk with no children"
                      fill_u = uoff[real_u][0]
                      uoff[~real_u] = fill_u   # pads read a real slab;
                      # their idxf rows select nothing -> contribute zero
                      ops = dict(uoff=uoff, idxf=idxf, pdst=pdst, udst=udst)
                      # span-mode gather (round-5 profile: per-slab
                      # vmap'd dynamic_slice gathers measured 32 GB/s at
                      # lap3d_28).  When every child slab of the chunk
                      # sits on one Mbc^2 grid inside a bounded span, the
                      # gather becomes ONE streamed dynamic-slice + a
                      # large-row take.  Span slab count pads to pow2 so
                      # classes stay few.
                      ssz = Mbc * Mbc
                      m0 = int(uoff[real_u].min())
                      span = int(uoff[real_u].max()) + ssz - m0
                      nslab = span // ssz
                      vol = Pq * G
                      gc0 = bool(np.all((uoff[real_u] - m0) % ssz == 0)
                                 and nslab <= max(2 * vol, 8)
                                 and span <= 4 * CAP)
                      spanq = _pow2ceil(max(nslab, 1)) if gc0 else 0
                      if gc0:
                          ops["g0"] = m0
                          ops["gsel"] = ((uoff - m0) // ssz).astype(
                              np.int32)
                      # contiguity detection (round-5, from the device
                      # profile: the slab scatter-add was 12% of program
                      # time at lap3d_28).  When the chunk's parent slots
                      # are consecutive — the common case, since ppart is
                      # (bucket, slot)-sorted over full chunks — the
                      # patch lands as ONE dynamic-slice read-modify-write
                      # at HBM stream bandwidth instead of a scatter.
                      # Pad rows continue the run and subtract exact
                      # zeros (their idxf selects the zero row), which is
                      # a numeric no-op on whatever they cover.
                      L1, L2 = Mft * Npt, max(Mbt * Mbt, 1)
                      pc = bool(np.all(np.diff(pdst[:P]) == L1))
                      uc = bool(Mbt
                                and np.all(np.diff(udst[:P]) == L2))
                      if pc:
                          ops["pdst"] = (pdst[0]
                                         + np.arange(Pq, dtype=INDEX) * L1)
                      if uc:
                          ops["udst"] = (udst[0]
                                         + np.arange(Pq, dtype=INDEX) * L2)
                      key = (Mbc, G, Pq, Npt, Mbt, pc, uc, spanq)
                      lv_q.append(len(q_instrs))
                      q_instrs.append((key, ops))

        # ---- level stream: ALL factors, then all projections, grouped by
        # class.  Within a level every factor wave is independent and the
        # projections/scatters are commutative adds into level li+1, so the
        # reordering is semantics-preserving; grouping maximizes the
        # consecutive same-class RUNS that the "runs" program form rolls
        # into one fori-style loop each — one pallas_call INSTANCE per
        # class instead of one per instruction (the ~5 s/instance Mosaic
        # remote-compile wall, NOTES_ROUND4.md §8).  Stable sort keeps
        # per-class emission order, so class-stack positions stay
        # ascending within each run.
        stream.extend(("f", i) for i in
                      sorted(lv_f, key=lambda i: f_instrs[i][0]))
        stream.extend(("p", i) for i in
                      sorted(lv_p, key=lambda i: p_instrs[i][0]))
        stream.extend(("q", i) for i in
                      sorted(lv_q, key=lambda i: q_instrs[i][0]))

    # --- stack operands per class -----------------------------------------
    def stack(instrs, pad_scat=False):
        keys, by = [], {}
        for key, ops in instrs:
            if key not in by:
                by[key] = []
                keys.append(key)
            by[key].append(ops)
        cls_id = {k: i for i, k in enumerate(keys)}
        stacked = []
        kmax = 0
        for key in keys:
            ws = by[key]
            out = {}
            names = list(ws[0].keys())
            if pad_scat and "src" in names:
                L = max(len(w["src"]) for w in ws)
                K = max(len(w["dst"]) for w in ws) + 1
                kmax = max(kmax, K)
                srcs, idss, dsts, sgns = [], [], [], []
                for w in ws:
                    k = len(w["dst"])
                    srcs.append(_pad_to(w["src"], L, 0))
                    idss.append(_pad_to(w["ids"], L, max(K - 1, 0)))
                    dpad = np.concatenate([
                        w["dst"],
                        trash + 1 + np.arange(K - k, dtype=INDEX)])
                    dsts.append(dpad.astype(INDEX))
                    sgns.append(np.where(dpad < total, -1.0, 1.0))
                out.update(src=np.stack(srcs), ids=np.stack(idss),
                           dst=np.stack(dsts), sgn=np.stack(sgns))
                names = [x for x in names if x not in ("src", "ids", "dst")]
                key = key + (L, K)
            elif pad_scat:
                key = key + (0, 0)
            for name in names:
                vals = [w[name] for w in ws]
                out[name] = (np.array(vals, dtype=INDEX)
                             if np.isscalar(vals[0]) else np.stack(vals))
            stacked.append((key, out))
        pos = {k: 0 for k in keys}
        return keys, cls_id, stacked, pos, kmax

    fkeys, fid, fstk, fpos_ctr, kmax = stack(f_instrs, pad_scat=True)
    pkeys, pid, pstk, ppos_ctr, _ = stack(p_instrs)
    qkeys, qid, qstk, qpos_ctr, _ = stack(q_instrs)

    T = len(stream)
    instr_cls = np.empty(T, dtype=np.int32)
    instr_pos = np.empty(T, dtype=np.int32)
    nf = len(fkeys)
    npc = len(pkeys)
    for t, (tag, i) in enumerate(stream):
        key = {"f": f_instrs, "p": p_instrs, "q": q_instrs}[tag][i][0]
        if tag == "f":
            instr_cls[t] = fid[key]
            instr_pos[t] = fpos_ctr[key]
            fpos_ctr[key] += 1
        elif tag == "p":
            instr_cls[t] = nf + pid[key]
            instr_pos[t] = ppos_ctr[key]
            ppos_ctr[key] += 1
        else:
            instr_cls[t] = nf + npc + qid[key]
            instr_pos[t] = qpos_ctr[key]
            qpos_ctr[key] += 1

    # buffer: panels | update slots | trash region; extend for any slice
    # overrun from pow2 window rounding (reads there are never selected,
    # writes there are identity)
    buf = trash + 1 + kmax
    for (Wcw, Mbc, Wp, Npt, Mbt, G), ops in pstk:
        Mpt = Npt + Mbt
        buf = max(buf,
                  int(np.max(ops["cub"])) + Wcw * Mbc * Mbc,
                  int(np.max(ops["pbase"])) + Wp * Mpt * Npt,
                  (int(np.max(ops["pub"])) + Wp * Mbt * Mbt) if Mbt else 0)
    for (Mbc, G, Pq, Npt, Mbt, pc, uc, spanq), ops in qstk:
        # contiguous-run pad rows extend past the last real slot; their
        # zero-subtract touches whatever lies there, so the buffer must
        # cover the full span (same for the span-mode gather read)
        if pc:
            buf = max(buf, int(np.max(ops["pdst"])) + (Npt + Mbt) * Npt)
        if uc:
            buf = max(buf, int(np.max(ops["udst"])) + Mbt * Mbt)
        if spanq:
            buf = max(buf, int(np.max(ops["g0"])) + spanq * Mbc * Mbc)
    return PFPlan(plan=plan,
                  fmeta=tuple(k for k, _ in fstk),
                  fops=[o for _, o in fstk],
                  pmeta=tuple(k for k, _ in pstk),
                  pops=[o for _, o in pstk],
                  qmeta=tuple(k for k, _ in qstk),
                  qops=[o for _, o in qstk],
                  instr_cls=instr_cls, instr_pos=instr_pos,
                  buf=int(buf), ub_total=int(ub_total),
                  proj_flops=proj_flops, scat_entries=scat_entries)


# ---------------------------------------------------------------------------
# Device program
# ---------------------------------------------------------------------------

def _tri_inv_pow2(C, base=2):
    """Batched lower-triangular inverse via batch-folded block recursion.

    XLA's triangular_solve on TPU is a sequential While over columns, so a
    (W, Np, Np) TRSM costs ~Np dispatch steps regardless of W (measured
    tools/microbench_dense.py) — the dominant factor-branch cost at small
    Np.  This folds the batch down to 2x2 diagonal blocks, inverts those
    in CLOSED FORM (round-5: the base-8 triangular_solve's While op
    measured 7.4 ms across the lap3d_44 program), then rebuilds with
    log2(Np/2) levels of batched MXU matmuls:

        inv([[A,0],[B,D]]) = [[iA, 0], [-iD B iA, iD]]

    and the TRSM then becomes a single einsum against L^-T.  Np must be
    a power of two (the coarse shape ladder guarantees 8/32/128)."""
    W, Np, _ = C.shape
    blocks = C
    stack = []
    m = Np
    while m > base:
        h = m // 2
        stack.append(blocks[:, h:, :h])
        blocks = jnp.concatenate(
            [blocks[:, :h, :h], blocks[:, h:, h:]], axis=0)
        m = h
    if m == 2:
        # inv([[a,0],[b,d]]) = [[1/a, 0], [-b/(a d), 1/d]] — elementwise
        ia = 1.0 / blocks[:, 0, 0]
        idd = 1.0 / blocks[:, 1, 1]
        off = -blocks[:, 1, 0] * ia * idd
        z = jnp.zeros_like(ia)
        inv = jnp.stack(
            [jnp.stack([ia, z], axis=1),
             jnp.stack([off, idd], axis=1)], axis=1)
    else:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=C.dtype), blocks.shape)
        inv = jax.lax.linalg.triangular_solve(
            blocks, eye, left_side=True, lower=True)
    while stack:
        Bblk = stack.pop()
        half = inv.shape[0] // 2
        iA, iD = inv[:half], inv[half:]
        iB = -jnp.einsum("bij,bjk,bkl->bil", iD, Bblk, iA,
                         preferred_element_type=C.dtype)
        h = Bblk.shape[2]
        top = jnp.concatenate(
            [iA, jnp.zeros((half, h, Bblk.shape[1]), dtype=C.dtype)],
            axis=2)
        bot = jnp.concatenate([iB, iD], axis=2)
        inv = jnp.concatenate([top, bot], axis=1)
    return inv


def _tri_inv_enabled() -> bool:
    """Env toggle for the explicit-inverse TRSM path (checked at trace
    time).  ``SSTPU_TRSM_INV=0`` falls back to the backward-stable
    ``triangular_solve`` for every class — the explicit inverse loses
    accuracy on ill-conditioned diagonal blocks (measured impact recorded
    in ACCURACY.md)."""
    import os
    return os.environ.get("SSTPU_TRSM_INV", "1") != "0"


def _pallas_maxnp() -> int:
    """Largest panel column class routed to the Pallas panel factor
    (trace-time env knob).  Np > this uses the XLA path.  Classes above
    128 run ``panel_factor``'s blocked-slab loop (128-wide panels of the
    shared kernel + inverse-einsum TRSM + one SYRK per slab) — XLA's
    ``cholesky`` on a (W, Np, Np) batch is a sequential While over Np
    columns, which at the 4k-wide top fronts of lap3d_64 is thousands of
    latency-bound steps."""
    import os
    return int(os.environ.get("SSTPU_POTRF_MAXNP", "8192"))


def _factor_branch(Np, Mb, W, mode, L, K, syrk_bf16, tri_inv=True,
                   potrf="pallas"):
    Mp = Np + Mb

    def br(Fx, pos, ops):
        # named scopes flow into HLO op_name metadata, which
        # tools/profile_attrib.py joins with the device profile to
        # attribute program time per phase (VERDICT r4 item 3)
        base = ops["base"][pos]
        pe = ops["padeye"][pos]
        rm = ops["rowmask"][pos]
        cmk = ops["colmask"][pos]
        with jax.named_scope(f"Fslice{Np}x{Mb}"):
            P = jax.lax.dynamic_slice(Fx, (base,), (W * Mp * Np,))
            P = P.reshape(W, Mp, Np)
        if potrf == "pallas" and Np <= _pallas_maxnp():
            # fused blocked POTRF + TRSM in ONE kernel launch (XLA's
            # batched cholesky/triangular_solve are sequential Whiles over
            # columns — ~47 of 181 ms on lap3d_44, NOTES_ROUND3.md)
            from .pallas_kernels import panel_factor
            with jax.named_scope(f"Fpotrf{Np}x{Mb}"):
                newP = panel_factor(P, pe, rm, cmk)   # masked output
                Bm = newP[:, Np:, :]
        else:
            # upper triangle of the diagonal block may hold projection junk
            with jax.named_scope(f"Fpotrf{Np}x{Mb}"):
                T = jnp.tril(P[:, :Np, :])
                Tfull = T + jnp.tril(T, -1).transpose(0, 2, 1)
                Tfull = Tfull + jax.vmap(jnp.diag)(pe)
                C = jnp.linalg.cholesky(Tfull)
                if Mb:
                    if 8 < Np <= 128 and tri_inv:
                        # latency-bound: TRSM via explicit L^-1 + 1 einsum
                        Linv = _tri_inv_pow2(C)
                        Bm = jnp.einsum("bmj,bij->bmi", P[:, Np:, :], Linv,
                                        preferred_element_type=Fx.dtype)
                    else:
                        Bm = jax.lax.linalg.triangular_solve(
                            C, P[:, Np:, :], left_side=False, lower=True,
                            transpose_a=True)
                    newP = jnp.concatenate([C, Bm], axis=1)
                else:
                    newP = C
                newP = newP * rm[:, :, None] * cmk[:, None, :]
                Bm = newP[:, Np:, :]
        if Mb:
            with jax.named_scope(f"Fsyrk{Np}x{Mb}"):
                Bs = Bm.astype(jnp.bfloat16) if syrk_bf16 else Bm
                U = jnp.einsum("bik,bjk->bij", Bs, Bs,
                               preferred_element_type=Fx.dtype)
                ub = ops["ubs"][pos]
                acc = jax.lax.dynamic_slice(Fx, (ub,), (W * Mb * Mb,))
                acc = acc.reshape(W, Mb, Mb)
                acc = jnp.tril(acc)    # lower-canonical incoming updates
                U = U + acc + jnp.tril(acc, -1).transpose(0, 2, 1)
        with jax.named_scope(f"Fwrite{Np}x{Mb}"):
            Fx = jax.lax.dynamic_update_slice(Fx, newP.reshape(-1), (base,))
            if Mb and mode == 1:
                # publish the full symmetric outgoing update
                Fx = jax.lax.dynamic_update_slice(Fx, U.reshape(-1), (ub,))
        if Mb and mode == 2 and L:
            with jax.named_scope(f"Fscat{Np}x{Mb}"):
                u = U.reshape(-1)[ops["src"][pos]]
                seg = jax.ops.segment_sum(u, ops["ids"][pos],
                                          num_segments=K,
                                          indices_are_sorted=True)
                Fx = Fx.at[ops["dst"][pos]].add(
                    seg * ops["sgn"][pos], indices_are_sorted=True,
                    unique_indices=True, mode="promise_in_bounds")
        return Fx
    return br


def _proj_branch(Wc, Mbc, Wp, Npt, Mbt, G):
    Mft = Npt + Mbt

    def br(Fx, pos, ops):
        dtype = Fx.dtype
        cub = ops["cub"][pos]
        Uc = jax.lax.dynamic_slice(Fx, (cub,), (Wc * Mbc * Mbc,))
        Uc = Uc.reshape(Wc, Mbc, Mbc)
        Ucz = jnp.concatenate(
            [Uc, jnp.zeros((1, Mbc, Mbc), dtype=dtype)], axis=0)
        csel = ops["csel"][pos]          # (Wp, G)
        idxf = ops["idxf"][pos]          # (Wp, G, Mft)
        # children batched over g in ONE gather / placement / einsum: the
        # G-sum rides the contraction axis (G*Mbc), which both shrinks the
        # op count ~3x (per-op overhead dominates on this chip) and feeds
        # the MXU a larger contraction
        Ug = Ucz[csel]                                     # (Wp,G,Mbc,Mbc)
        Ugz = jnp.concatenate(
            [Ug, jnp.zeros((Wp, G, 1, Mbc), dtype=dtype)], axis=2)
        R = jnp.take_along_axis(Ugz, idxf[:, :, :, None], axis=2)
        mcols = jnp.arange(Mbc, dtype=jnp.int32)
        Wh = (idxf[:, :, :, None] == mcols).astype(dtype)  # (Wp,G,Mft,Mbc)
        ppatch = jnp.einsum("kgfm,kghm->kfh", R, Wh[:, :, :Npt, :],
                            preferred_element_type=dtype)
        pbase = ops["pbase"][pos]
        Mpt = Npt + Mbt
        region = jax.lax.dynamic_slice(Fx, (pbase,), (Wp * Mpt * Npt,))
        region = region.reshape(Wp, Mpt, Npt) - ppatch
        Fx = jax.lax.dynamic_update_slice(Fx, region.reshape(-1), (pbase,))
        if Mbt:
            tpatch = jnp.einsum("kgfm,kghm->kfh", R[:, :, Npt:, :],
                                Wh[:, :, Npt:, :],
                                preferred_element_type=dtype)
            pub = ops["pub"][pos]
            acc = jax.lax.dynamic_slice(Fx, (pub,), (Wp * Mbt * Mbt,))
            acc = acc.reshape(Wp, Mbt, Mbt) + jnp.tril(tpatch)
            Fx = jax.lax.dynamic_update_slice(Fx, acc.reshape(-1), (pub,))
        return Fx
    return br


_SCAT_DN = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1,), inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,))


def _slab_scatter_add(Fx, dst, updates):
    """Add (P, L) update slabs into the flat buffer at offsets dst.
    Slabs are whole parent panels / update slots — contiguous, sorted,
    non-overlapping; pad rows point far out of bounds and are dropped."""
    return jax.lax.scatter_add(
        Fx, dst[:, None], updates, _SCAT_DN,
        indices_are_sorted=True, unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def _pair_branch(Mbc, G, Pq, Npt, Mbt, pc=False, uc=False, spanq=0,
                 bf16=False):
    """Pair-grouped projection: parent-blocked contraction.  Each parent's
    children (padded to pow2 G) ride the einsum contraction axis, so the
    placement patch materializes PER PARENT — (Pq,Mft,Npt) — never per
    child; children are slab-gathered by offset from any same-Mb bucket of
    the level, and patches land with ONE slab-granular scatter-add (no
    window read of untouched parents).  Mirrors the reference's in-loop
    frontal assembly (t_cholmod_super_numeric.c:596-640; map kernels
    cholmod_gpu_kernels.cu:17-66) with MXU placement one-hots instead of
    relative-map scalar adds."""
    Mft = Npt + Mbt

    def br(Fx, pos, ops):
        dtype = Fx.dtype
        uoff = ops["uoff"][pos]          # (Pq, G) child slab offsets
        idxf = ops["idxf"][pos]          # (Pq, G, Mft)
        with jax.named_scope(f"Qgather{Mbc}g{G}"):
            if spanq:
                # streamed span read + large-row take (slab grid)
                slab = jax.lax.dynamic_slice(
                    Fx, (ops["g0"][pos],), (spanq * Mbc * Mbc,))
                slab = slab.reshape(spanq, Mbc * Mbc)
                Uc = jnp.take(slab, ops["gsel"][pos].reshape(-1), axis=0,
                              indices_are_sorted=False, unique_indices=False)
            else:
                Uc = jax.vmap(
                    lambda o: jax.lax.dynamic_slice(
                        Fx, (o,), (Mbc * Mbc,)))(uoff.reshape(-1))
            Uc = Uc.reshape(Pq, G, Mbc, Mbc)
        with jax.named_scope(f"QplaceW{Mbc}g{G}"):
            # placement one-hots carry exact 0/1 values, so running the
            # MXU contraction in bf16 only rounds the UPDATE entries
            # (~2^-8 relative) with f32 accumulation — the mixed-precision
            # knob that pairs with refinement (same contract as syrk_bf16)
            edt = jnp.bfloat16 if bf16 else dtype
            mcols = jnp.arange(Mbc, dtype=jnp.int32)
            Wh = (idxf[:, :, :, None] == mcols).astype(edt)  # (Pq,G,Mft,Mbc)
        with jax.named_scope(f"QplaceR{Mbc}g{G}"):
            # row placement, mode chosen by the one-hot tax (2*Mft*Mbc^2
            # flops/child) vs the gather's row size (Mbc*4 bytes):
            #  * Mbc <= 256: one-hot einsum on the MXU — the small-row
            #    take_along_axis gather it replaces measured ~20 GB/s
            #    (13.5% of the lap3d_28 program);
            #  * big Mbc (top-level children): rows are >= 2 KB and
            #    stream, while the one-hot tax explodes quadratically —
            #    the lap3d_64 profile measured QplaceR3840g1 at 14 ms
            #    (9 TF/s of pure placement flops) vs ~0.3 ms of gather.
            if Mbc <= 256:
                R = jnp.einsum("pgfr,pgrm->pgfm", Wh, Uc.astype(edt),
                               preferred_element_type=dtype)
                R = R.astype(edt)
            else:
                Ucz = jnp.concatenate(
                    [Uc, jnp.zeros((Pq, G, 1, Mbc), dtype=dtype)], axis=2)
                R = jnp.take_along_axis(
                    Ucz, idxf[:, :, :, None], axis=2).astype(edt)
        with jax.named_scope(f"Qeinsum{Mbc}g{G}"):
            S = jnp.einsum("pgfm,pghm->pfh", R, Wh[:, :, :Npt, :],
                           preferred_element_type=dtype)    # (Pq,Mft,Npt)
        with jax.named_scope(f"Qscat{Mbc}g{G}"):
            if pc:
                # contiguous parent slots: ONE streamed read-modify-write
                pb0 = ops["pdst"][pos][0]
                reg = jax.lax.dynamic_slice(Fx, (pb0,), (Pq * Mft * Npt,))
                reg = reg - S.reshape(-1)
                Fx = jax.lax.dynamic_update_slice(Fx, reg, (pb0,))
            else:
                Fx = _slab_scatter_add(Fx, ops["pdst"][pos],
                                       -S.reshape(Pq, Mft * Npt))
        if Mbt:
            with jax.named_scope(f"Qeinsum{Mbc}g{G}"):
                St = jnp.einsum("pgfm,pghm->pfh", R[:, :, Npt:, :],
                                Wh[:, :, Npt:, :],
                                preferred_element_type=dtype)  # (Pq,Mbt,Mbt)
                St = jnp.tril(St)        # parent slots are lower-canonical
            with jax.named_scope(f"Qscat{Mbc}g{G}"):
                if uc:
                    ub0 = ops["udst"][pos][0]
                    reg = jax.lax.dynamic_slice(
                        Fx, (ub0,), (Pq * Mbt * Mbt,))
                    reg = reg + St.reshape(-1)
                    Fx = jax.lax.dynamic_update_slice(Fx, reg, (ub0,))
                else:
                    Fx = _slab_scatter_add(Fx, ops["udst"][pos],
                                           St.reshape(Pq, Mbt * Mbt))
        return Fx
    return br


def _pf_branches(class_ops, meta, syrk_bf16, tri_inv=True,
                 potrf="pallas"):
    fops, pops, qops = class_ops
    fmeta, pmeta, qmeta = meta
    branches = [
        (lambda brf, ops: (lambda Fx, pos: brf(Fx, pos, ops)))(
            _factor_branch(Np, Mb, W, mode, L, K, syrk_bf16, tri_inv,
                           potrf), ops)
        for ops, (Np, Mb, W, mode, L, K) in zip(fops, fmeta)]
    branches += [
        (lambda brf, ops: (lambda Fx, pos: brf(Fx, pos, ops)))(
            _proj_branch(Wc, Mbc, Wp, Npt, Mbt, G), ops)
        for ops, (Wc, Mbc, Wp, Npt, Mbt, G) in zip(pops, pmeta)]
    branches += [
        (lambda brf, ops: (lambda Fx, pos: brf(Fx, pos, ops)))(
            _pair_branch(Mbc, G, Pq, Npt, Mbt, pc, uc, spanq, syrk_bf16),
            ops)
        for ops, (Mbc, G, Pq, Npt, Mbt, pc, uc, spanq) in zip(qops, qmeta)]
    return branches


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _pf_program_scan(vals, a_src, a_dst, instr, class_ops, meta, buf,
                     syrk_bf16=False, tri_inv=True, potrf="pallas"):
    """Scanned form: compile O(#classes), but lax.scan+switch double-
    buffers the whole carry every step — measured 1.65 ms/instruction on
    v5e (tools/ablate_pf.py), which dwarfs the compute.  Kept as the
    compile-bounded fallback; the unrolled form below is the default."""
    Fx = jnp.zeros(buf, dtype=vals.dtype)
    Fx = Fx.at[a_dst].set(vals[a_src], indices_are_sorted=True,
                          unique_indices=True, mode="promise_in_bounds")
    branches = _pf_branches(class_ops, meta, syrk_bf16, tri_inv, potrf)

    def body(Fx, xs):
        cid, pos = xs
        return jax.lax.switch(cid, branches, Fx, pos), None

    Fx, _ = jax.lax.scan(body, Fx, instr)
    return Fx


@functools.partial(jax.jit, static_argnums=(3, 5, 6, 7, 8, 9))
def _pf_program_unroll(vals, a_src, a_dst, instr, class_ops, meta, buf,
                       syrk_bf16=False, tri_inv=True, potrf="pallas"):
    """Straight-line instruction sequence: XLA updates the factor buffer
    in place (no per-step carry copy).  Measured 4.7x faster than the
    scanned form on lap3d_28 AND 3x faster to compile."""
    with jax.named_scope("Assemble"):
        Fx = jnp.zeros(buf, dtype=vals.dtype)
        Fx = Fx.at[a_dst].set(vals[a_src], indices_are_sorted=True,
                              unique_indices=True, mode="promise_in_bounds")
    branches = _pf_branches(class_ops, meta, syrk_bf16, tri_inv, potrf)
    for cid, pos in instr:
        Fx = branches[cid](Fx, pos)
    return Fx


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _pf_program_vm(vals, a_src, a_dst, instr, class_ops, meta, buf,
                   syrk_bf16=False, tri_inv=True, potrf="pallas"):
    """While+switch VM: ONE lax.while_loop over the instruction stream
    with lax.switch over classes — each class body (and so each Mosaic
    pallas_call instance) exists exactly ONCE in the compiled program,
    regardless of instruction count.  Viability hinges on the while
    carry aliasing in place (lax.scan+switch measured a 1.65 ms/step
    whole-carry copy on v5e; while_loop has no stacked outputs)."""
    Fx = jnp.zeros(buf, dtype=vals.dtype)
    Fx = Fx.at[a_dst].set(vals[a_src], indices_are_sorted=True,
                          unique_indices=True, mode="promise_in_bounds")
    branches = _pf_branches(class_ops, meta, syrk_bf16, tri_inv, potrf)
    ic, ip = instr
    T = ic.shape[0]

    def body(carry):
        t, F = carry
        F = jax.lax.switch(ic[t], branches, F, ip[t])
        return (t + 1, F)

    _, Fx = jax.lax.while_loop(lambda c: c[0] < T, body,
                               (jnp.int32(0), Fx))
    return Fx


@functools.partial(jax.jit, static_argnums=(3, 5, 6, 7, 8, 9))
def _pf_program_runs(vals, a_src, a_dst, runs, class_ops, meta, buf,
                     syrk_bf16=False, tri_inv=True, potrf="pallas"):
    """Run-compressed form: each maximal consecutive same-class run of
    instructions becomes ONE ``lax.while_loop`` over the class's stacked
    position axis (single-branch body — in-place dynamic-update-slice
    aliasing holds, unlike scan+switch whose measured carry copy was
    1.65 ms/step).  The program then contains one traced body — and one
    Mosaic ``pallas_call`` INSTANCE — per (class, level-run) instead of
    one per instruction: the remote-compile wall drops from
    O(#instructions) x ~5 s to O(#classes) (NOTES_ROUND4.md §8).
    Single-instruction runs stay straight-line (no loop overhead)."""
    Fx = jnp.zeros(buf, dtype=vals.dtype)
    Fx = Fx.at[a_dst].set(vals[a_src], indices_are_sorted=True,
                          unique_indices=True, mode="promise_in_bounds")
    branches = _pf_branches(class_ops, meta, syrk_bf16, tri_inv, potrf)
    for cid, p0, cnt in runs:
        if cnt == 1:
            Fx = branches[cid](Fx, p0)
        else:
            br = branches[cid]

            def body(carry, br=br):
                i, F = carry
                return (i + 1, br(F, i))

            _, Fx = jax.lax.while_loop(
                lambda c, end=p0 + cnt: c[0] < end, body,
                (jnp.int32(p0), Fx))
    return Fx


def pf_numeric(vals, pfp: PFPlan, dtype, syrk_bf16=False, form=None):
    """The full numeric factorization with pass-forward extend-add, as one
    compiled program (cached per (pattern, dtype, syrk_bf16))."""
    ops = pfp.arrays(dtype)
    amaps = pfp._cache.get("amaps")
    if amaps is None:
        from .super_numeric import _a_sorted_maps
        a_src, a_dst = _a_sorted_maps(pfp.plan.ss)
        amaps = (jnp.asarray(a_src), jnp.asarray(a_dst))
        pfp._cache["amaps"] = amaps
    if form is None:
        import os
        form = os.environ.get("SSTPU_PF_FORM", "unroll")
    tri_inv = _tri_inv_enabled()
    from .pallas_kernels import pallas_enabled
    potrf = "pallas" if pallas_enabled() else "xla"
    import os
    maxbuf_gb = float(os.environ.get("SSTPU_POTRF_MAXBUF_GB", "inf"))
    if potrf == "pallas" and \
            pfp.buf * np.dtype(dtype).itemsize > maxbuf_gb * (1 << 30):
        # Escape hatch for the round-4 HBM-scale TPU-worker instability
        # (NOTES_ROUND4.md §8).  Round-5 bisection attributed the crashes
        # to tunnel-worker OOM behavior, not the pallas path itself, so
        # the gate now defaults OFF; set SSTPU_POTRF_MAXBUF_GB=2 to
        # restore the round-4 behavior.
        potrf = "xla"
    if form == "scan":
        return _pf_program_scan(jnp.asarray(vals, dtype=dtype), amaps[0],
                                amaps[1], pfp.instr, ops, pfp.meta, pfp.buf,
                                syrk_bf16, tri_inv, potrf)
    if form == "runs":
        return _pf_program_runs(jnp.asarray(vals, dtype=dtype), amaps[0],
                                amaps[1], pfp.runs, ops, pfp.meta, pfp.buf,
                                syrk_bf16, tri_inv, potrf)
    if form == "vm":
        return _pf_program_vm(jnp.asarray(vals, dtype=dtype), amaps[0],
                              amaps[1], pfp.instr, ops, pfp.meta, pfp.buf,
                              syrk_bf16, tri_inv, potrf)
    seq = tuple((int(c), int(p))
                for c, p in zip(pfp.instr_cls, pfp.instr_pos))
    return _pf_program_unroll(jnp.asarray(vals, dtype=dtype), amaps[0],
                              amaps[1], seq, ops, pfp.meta, pfp.buf,
                              syrk_bf16, tri_inv, potrf)
