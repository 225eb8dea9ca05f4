"""Distributed supernodal elimination over a jax.sharding Mesh.

The TPU-native replacement for the reference's (nonexistent) distributed
layer (SURVEY.md §2 parallelism table): independent supernodes of one
elimination-tree level are *data-parallel* across chips (the subtree-to-chip
proportional mapping); the extend-add assembly is a cross-chip reduction
(psum of per-chip sparse update contributions — the all-to-all/ICI analog
of the reference's pinned-buffer GPU assembly, cholmod_gpu_kernels.cu).

Round-1 scope: a mesh-sharded level step — batched POTRF/TRSM/SYRK with the
supernode batch sharded over the 'batch' mesh axis and the flat factor
buffer replicated, updates combined with a psum-style scatter-add.  The 2D
block-cyclic root-front path is planned (SURVEY.md §7.6).
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "batch",
              devices: Sequence | None = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _pad_batch(x: np.ndarray, mult: int) -> np.ndarray:
    b = x.shape[0]
    pad = (-b) % mult
    if pad == 0:
        return x
    padding = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, padding, constant_values=(-1 if x.dtype.kind == "i" else 0))


def distributed_level_step(mesh: Mesh, Lx: jax.Array, bucket,
                           trash: int) -> jax.Array:
    """One elimination-level bucket on a device mesh.

    The supernode batch is sharded over the mesh; each shard factorizes its
    panels; write-back and extend-add reduce into the replicated factor
    buffer (XLA inserts the cross-chip collectives).
    """
    ndev = mesh.devices.size
    Np, Mb, base, B = bucket.Np, bucket.Mb, bucket.base, len(bucket.sids)
    Mp = Np + Mb
    pe = _pad_batch(bucket.padeye, ndev)
    pe[len(bucket.sids):, :] = 1.0   # pad-batch panels = identity (finite chol)
    rmask = _pad_batch(bucket.rowmask, ndev)
    cmask = _pad_batch(bucket.colmask, ndev)
    dest_p = _pad_batch(bucket.dest, ndev)
    dest_p[dest_p < 0] = trash
    Bp = pe.shape[0]

    sh_b = NamedSharding(mesh, P("batch"))
    sh_r = NamedSharding(mesh, P())
    ped = jax.device_put(jnp.asarray(pe, dtype=Lx.dtype), sh_b)
    rmd = jax.device_put(jnp.asarray(rmask, dtype=Lx.dtype), sh_b)
    cmd = jax.device_put(jnp.asarray(cmask, dtype=Lx.dtype), sh_b)
    dd = jax.device_put(jnp.asarray(dest_p), sh_b)
    Lx = jax.device_put(Lx, sh_r)

    @functools.partial(jax.jit, out_shardings=sh_r)
    def step(Lx, pe, rmask, cmask, d):
        Pfull = jax.lax.dynamic_slice(Lx, (base,), (B * Mp * Np,))
        Pfull = Pfull.reshape(B, Mp, Np)
        # pad the batch to the mesh multiple (panels of zeros + identity)
        padB = pe.shape[0] - B
        if padB:
            Pnl = jnp.concatenate(
                [Pfull, jnp.zeros((padB, Mp, Np), dtype=Lx.dtype)], axis=0)
        else:
            Pnl = Pfull
        T = Pnl[:, :Np, :]
        Tfull = T + jnp.tril(T, -1).transpose(0, 2, 1)
        Tfull = Tfull + jax.vmap(jnp.diag)(pe)
        C = jnp.linalg.cholesky(Tfull)
        Bm = Pnl[:, Np:, :]
        if Mb:
            Bm = jax.lax.linalg.triangular_solve(
                C, Bm, left_side=False, lower=True, transpose_a=True)
            U = jnp.einsum("bik,bjk->bij", Bm, Bm,
                           preferred_element_type=Lx.dtype)
            newP = jnp.concatenate([C, Bm], axis=1)
        else:
            newP = C
        newP = newP * rmask[:, :, None] * cmask[:, None, :]
        Lx = jax.lax.dynamic_update_slice(
            Lx, newP[:B].reshape(-1), (base,))
        if Mb:
            # extend-add: cross-chip reduction into the replicated buffer
            Lx = Lx.at[d.reshape(-1)].add(-U.reshape(-1), mode="drop")
        return Lx

    return step(Lx, ped, rmd, cmd, dd)


def distributed_factorize(A, mesh: Mesh, common=None, dtype=np.float32,
                          root_2d_min: int = 256, root_2d_nb: int = 128):
    """Full supernodal factorization with every level sharded over `mesh`.

    Two distribution regimes (SURVEY.md §7.6): wide levels are *batch*
    sharded (independent supernodes across chips); a lone large root front
    (B == 1, no below rows, Np >= root_2d_min) switches to the
    column-block-cyclic distributed POTRF (parallel.block_cyclic) so the
    sequential top of the etree also uses every chip.

    Returns (SuperFactor, symbolic); solve via solve_super on the
    replicated result.
    """
    from ..cholesky import analyze, super_symbolic
    from ..cholesky.super_numeric import (SuperFactor, _assemble_values,
                                          build_plan)
    from ..core.common import default_common

    cm = common or default_common()
    cm.cholesky.supernodal = "supernodal"
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    from ..cholesky.super_numeric import _a_sorted_maps
    vals = _assemble_values(A, sym, ss, dtype)
    a_src, a_dst = _a_sorted_maps(ss)
    Lx = jnp.zeros(plan.total + 1, dtype=dtype)
    Lx = Lx.at[jnp.asarray(a_dst)].set(jnp.asarray(vals)[jnp.asarray(a_src)],
                                       indices_are_sorted=True,
                                       unique_indices=True,
                                       mode="promise_in_bounds")
    from .block_cyclic import block_cyclic_cholesky
    for lv in plan.levels:
        for b in lv:
            Np, Mb, B = b.Np, b.Mb, len(b.sids)
            if (B == 1 and Mb == 0 and Np >= root_2d_min
                    and mesh.devices.size > 1):
                # lone root front: 2D block-cyclic POTRF over the mesh
                base = int(b.base)
                Pn = np.asarray(Lx[base:base + Np * Np],
                                dtype=np.float64).reshape(Np, Np)
                T = Pn + np.tril(Pn, -1).T + np.diag(b.padeye[0])
                L = block_cyclic_cholesky(T, mesh, nb=root_2d_nb)
                L = L * b.colmask[0][:, None] * b.colmask[0][None, :]
                Lx = Lx.at[base:base + Np * Np].set(
                    jnp.asarray(L.reshape(-1), dtype=dtype))
            else:
                Lx = distributed_level_step(mesh, Lx, b, plan.total)
    return SuperFactor(plan=plan, Lx=Lx, perm=sym.perm, minor=plan.n,
                       dtype=dtype), sym
