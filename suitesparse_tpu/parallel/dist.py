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


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _pad_batch(x: np.ndarray, mult: int) -> np.ndarray:
    b = x.shape[0]
    pad = (-b) % mult
    if pad == 0:
        return x
    padding = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, padding, constant_values=(-1 if x.dtype.kind == "i" else 0))


def distributed_level_step(mesh: Mesh, Lx: jax.Array,
                           gather: np.ndarray, padeye: np.ndarray,
                           dest: np.ndarray, trash: int) -> jax.Array:
    """One elimination level on a device mesh.

    gather: (B, Mp, Np) panel gather map; dest: (B, Mb, Mb) update scatter.
    The batch is sharded over the mesh; each shard factorizes its supernodes
    and produces update contributions; contributions are summed across the
    mesh (extend-add) into the replicated factor buffer.
    """
    ndev = mesh.devices.size
    gather = _pad_batch(gather, ndev)
    padeye = _pad_batch(padeye, ndev)
    dest_p = _pad_batch(dest, ndev)
    # padded batch entries: gather=-1 everywhere, dest -> trash
    dest_p[dest_p < 0] = trash
    Np = gather.shape[2]

    sh_b = NamedSharding(mesh, P("batch"))
    sh_r = NamedSharding(mesh, P())
    g = jax.device_put(jnp.asarray(gather), sh_b)
    pe = jax.device_put(jnp.asarray(padeye, dtype=Lx.dtype), sh_b)
    d = jax.device_put(jnp.asarray(dest_p), sh_b)
    Lx = jax.device_put(Lx, sh_r)

    @functools.partial(jax.jit, out_shardings=sh_r)
    def step(Lx, g, pe, d):
        safe = jnp.maximum(g, 0)
        Pnl = jnp.where(g >= 0, Lx[safe], 0.0)
        T = Pnl[:, :Np, :]
        Tfull = T + jnp.tril(T, -1).transpose(0, 2, 1)
        Tfull = Tfull + jax.vmap(jnp.diag)(pe)
        C = jnp.linalg.cholesky(Tfull)
        # pad-batch panels are all-zero + identity -> cholesky stays finite
        Bm = Pnl[:, Np:, :]
        if Bm.shape[1]:
            Bm = jax.lax.linalg.triangular_solve(
                C, Bm, left_side=False, lower=True, transpose_a=True)
            U = jnp.einsum("bik,bjk->bij", Bm, Bm,
                           preferred_element_type=Lx.dtype)
            newP = jnp.concatenate([C, Bm], axis=1)
            # extend-add: scatter-add runs under the batch sharding; XLA
            # inserts the cross-chip reduction for the replicated output
            Lx = Lx.at[d.reshape(-1)].add(-U.reshape(-1), mode="drop")
        else:
            newP = C
        gd = jnp.where(g >= 0, g, Lx.shape[0] - 1)
        Lx = Lx.at[gd.reshape(-1)].set(newP.reshape(-1), mode="drop")
        return Lx

    return step(Lx, g, pe, d)


def distributed_factorize(A, mesh: Mesh, common=None, dtype=np.float32):
    """Full supernodal factorization with every level sharded over `mesh`.

    Returns (SuperFactor, residual-capable solve via solve_super on the
    replicated result).
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
    vals = _assemble_values(A, sym, ss, dtype)
    Lx = jnp.zeros(plan.total + 1, dtype=dtype)
    Lx = Lx.at[jnp.asarray(ss.a_scatter_dst)].add(jnp.asarray(vals))
    for lv in plan.levels:
        for b in lv:
            Lx = distributed_level_step(mesh, Lx, b.gather, b.padeye, b.dest,
                                        plan.total)
    return SuperFactor(plan=plan, Lx=Lx, perm=sym.perm, minor=plan.n,
                       dtype=dtype), sym
