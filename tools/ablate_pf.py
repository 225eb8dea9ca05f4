"""On-chip ablation of the pass-forward numeric program.

Builds the lap3d_28 (or $ABLATE_MATRIX) pf plan once, then times program
variants with pieces disabled, to attribute device time:

  full     the real program
  noproj   projection instructions dropped (factor waves only)
  noscat   scatter instructions' segment work dropped
  nosyrk   factor branch: POTRF+TRSM only (no SYRK/acc/update write)
  nopotrf  factor branch: SYRK+acc only (no POTRF/TRSM)
  slices   factor branch: slice + write back only (scan/dispatch floor)

All results are WRONG numerically except `full` — this is a timing tool.
Honest timing: chained calls + host readback (see tools/microbench.py).
"""
import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def build(name):
    from suitesparse_tpu.io import collection
    from suitesparse_tpu.io.generators import symmetrize_upper
    from suitesparse_tpu.cholesky import analyze, super_symbolic
    from suitesparse_tpu.cholesky.super_numeric import (build_plan,
                                                        _assemble_values,
                                                        _a_sorted_maps)
    from suitesparse_tpu.core.common import default_common
    A = collection.get(name)
    if A.stype == 0:
        A = symmetrize_upper(A)
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    pfp = plan.pf_plan(cm)
    vals = _assemble_values(A, sym, ss, np.float32)
    a_src, a_dst = _a_sorted_maps(ss)
    return sym, plan, pfp, vals, a_src, a_dst


def make_program(pfp, variant):
    from suitesparse_tpu.cholesky.pf import _proj_branch, _pair_branch

    unrolled = variant.startswith("u-")
    if unrolled:
        variant = variant[2:]

    fops, pops, qops = pfp.arrays(np.float32)
    fmeta, pmeta, qmeta = pfp.meta
    nf = len(fmeta)
    instr_cls, instr_pos = np.asarray(pfp.instr_cls), np.asarray(pfp.instr_pos)
    if variant == "noproj":
        keep = instr_cls < nf
        instr_cls, instr_pos = instr_cls[keep], instr_pos[keep]
    buf = pfp.buf

    def factor_branch(Np, Mb, W, mode, L, K):
        Mp = Np + Mb

        def br(Fx, pos, ops):
            base = ops["base"][pos]
            P = jax.lax.dynamic_slice(Fx, (base,), (W * Mp * Np,))
            P = P.reshape(W, Mp, Np)
            if variant == "slices":
                Fx = jax.lax.dynamic_update_slice(
                    Fx, (P * 1.0000001).reshape(-1), (base,))
                return Fx
            pe = ops["padeye"][pos]
            rm = ops["rowmask"][pos]
            cmk = ops["colmask"][pos]
            T = jnp.tril(P[:, :Np, :])
            Tfull = T + jnp.tril(T, -1).transpose(0, 2, 1)
            Tfull = Tfull + jax.vmap(jnp.diag)(pe)
            if variant == "nopotrf":
                C = Tfull
                Bm = P[:, Np:, :] if Mb else None
            else:
                C = jnp.linalg.cholesky(Tfull)
                if Mb:
                    Bm = jax.lax.linalg.triangular_solve(
                        C, P[:, Np:, :], left_side=False, lower=True,
                        transpose_a=True)
            if Mb and variant != "nosyrk":
                U = jnp.einsum("bik,bjk->bij", Bm, Bm,
                               preferred_element_type=Fx.dtype)
                ub = ops["ubs"][pos]
                acc = jax.lax.dynamic_slice(Fx, (ub,), (W * Mb * Mb,))
                acc = acc.reshape(W, Mb, Mb)
                acc = jnp.tril(acc)
                U = U + acc + jnp.tril(acc, -1).transpose(0, 2, 1)
            if Mb:
                newP = jnp.concatenate([C, Bm], axis=1)
            else:
                newP = C
            newP = newP * rm[:, :, None] * cmk[:, None, :]
            Fx = jax.lax.dynamic_update_slice(Fx, newP.reshape(-1), (base,))
            if Mb and variant != "nosyrk":
                if mode == 1:
                    Fx = jax.lax.dynamic_update_slice(Fx, U.reshape(-1),
                                                      (ub,))
                if mode == 2 and L and variant != "noscat":
                    u = U.reshape(-1)[ops["src"][pos]]
                    seg = jax.ops.segment_sum(u, ops["ids"][pos],
                                              num_segments=K,
                                              indices_are_sorted=True)
                    Fx = Fx.at[ops["dst"][pos]].add(
                        seg * ops["sgn"][pos], indices_are_sorted=True,
                        unique_indices=True, mode="promise_in_bounds")
            return Fx
        return br

    branches = [
        (lambda brf, ops: (lambda Fx, pos: brf(Fx, pos, ops)))(
            factor_branch(Np, Mb, W, mode, L, K), ops)
        for ops, (Np, Mb, W, mode, L, K) in zip(fops, fmeta)]
    branches += [
        (lambda brf, ops: (lambda Fx, pos: brf(Fx, pos, ops)))(
            _proj_branch(Wc, Mbc, Wp, Npt, Mbt, G), ops)
        for ops, (Wc, Mbc, Wp, Npt, Mbt, G) in zip(pops, pmeta)]
    def pair_branch_staged(Mbc, G, Pq, Npt, Mbt):
        """Stages of the pair projection for attribution: qgather0 = slab
        gather only; qgather1 = + row gather/one-hot; qeinsum = + einsums
        (scatter-add dropped).  All numerically WRONG except full."""
        Mft = Npt + Mbt

        def br(Fx, pos, ops):
            dtype = Fx.dtype
            uoff = ops["uoff"][pos]
            idxf = ops["idxf"][pos]
            Uc = jax.vmap(
                lambda o: jax.lax.dynamic_slice(Fx, (o,), (Mbc * Mbc,)))(
                uoff.reshape(-1))
            Uc = Uc.reshape(Pq, G, Mbc, Mbc)
            if variant == "qgather0":
                return Fx.at[0].add(jnp.sum(Uc[:, :, 0, 0]))
            Ucz = jnp.concatenate(
                [Uc, jnp.zeros((Pq, G, 1, Mbc), dtype=dtype)], axis=2)
            R = jnp.take_along_axis(Ucz, idxf[:, :, :, None], axis=2)
            mcols = jnp.arange(Mbc, dtype=jnp.int32)
            Wh = (idxf[:, :, :, None] == mcols).astype(dtype)
            if variant == "qgather1":
                return Fx.at[0].add(jnp.sum(R[:, :, 0, 0])
                                    + jnp.sum(Wh[:, :, 0, 0]))
            S = jnp.einsum("pgfm,pghm->pfh", R, Wh[:, :, :Npt, :],
                           preferred_element_type=dtype)
            acc = jnp.sum(S[:, 0, 0])
            if Mbt:
                St = jnp.einsum("pgfm,pghm->pfh", R[:, :, Npt:, :],
                                Wh[:, :, Npt:, :],
                                preferred_element_type=dtype)
                acc = acc + jnp.sum(St[:, 0, 0])
            return Fx.at[0].add(acc)        # qeinsum: scatters dropped
        return br

    if variant in ("qgather0", "qgather1", "qeinsum"):
        branches += [
            (lambda brf, ops: (lambda Fx, pos: brf(Fx, pos, ops)))(
                pair_branch_staged(Mbc, G, Pq, Npt, Mbt), ops)
            for ops, (Mbc, G, Pq, Npt, Mbt, *_f) in zip(qops, qmeta)]
    else:
        branches += [
            (lambda brf, ops: (lambda Fx, pos: brf(Fx, pos, ops)))(
                _pair_branch(*key), ops)
            for ops, key in zip(qops, qmeta)]

    ic = jnp.asarray(instr_cls)
    ip = jnp.asarray(instr_pos)

    if variant == "unroll" or unrolled:
        # straight-line instruction sequence: no scan, no switch — XLA can
        # update the buffer in place instead of copying the whole carry
        # per step (the measured 1.65 ms/step scan+switch tax)
        seq = [(int(c), int(p)) for c, p in zip(instr_cls, instr_pos)]

        @jax.jit
        def prog(vals, a_src, a_dst):
            Fx = jnp.zeros(buf, dtype=vals.dtype)
            Fx = Fx.at[a_dst].set(vals[a_src], indices_are_sorted=True,
                                  unique_indices=True,
                                  mode="promise_in_bounds")
            for c, p in seq:
                Fx = branches[c](Fx, p)
            return Fx
        return prog

    @jax.jit
    def prog(vals, a_src, a_dst):
        Fx = jnp.zeros(buf, dtype=vals.dtype)
        Fx = Fx.at[a_dst].set(vals[a_src], indices_are_sorted=True,
                              unique_indices=True, mode="promise_in_bounds")

        def body(Fx, xs):
            cid, pos = xs
            return jax.lax.switch(cid, branches, Fx, pos), None

        Fx, _ = jax.lax.scan(body, Fx, (ic, ip))
        return Fx
    return prog


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    name = os.environ.get("ABLATE_MATRIX", "lap3d_28")
    variants = (sys.argv[1:] or
                ["full", "noproj", "nosyrk", "nopotrf", "slices"])
    sym, plan, pfp, vals, a_src, a_dst = build(name)
    print(f"[{name}] fl={sym.flops:.3g} projfl={pfp.proj_flops:.3g} "
          f"instr={len(pfp.instr_cls)} fcls={len(pfp.fmeta)} "
          f"pcls={len(pfp.pmeta)}", flush=True)
    vd = jnp.asarray(vals, dtype=jnp.float32)
    asrc, adst = jnp.asarray(a_src), jnp.asarray(a_dst)
    for v in variants:
        prog = make_program(pfp, v)
        t0 = time.perf_counter()
        out = prog(vd, asrc, adst)
        float(jax.device_get(out.ravel()[0]))
        tc = time.perf_counter() - t0
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = prog(vd, asrc, adst)
        float(jax.device_get(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / reps
        print(f"  {v:8s}: {dt*1e3:9.2f} ms  (first-call {tc:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
