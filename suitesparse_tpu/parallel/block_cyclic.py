"""Block-cyclic distributed dense Cholesky over a device mesh.

This is the "tensor parallelism" leg of the distributed design
(SURVEY.md §7.6): the top separator fronts of the elimination tree are
few and large — batch-sharding (parallel/dist.py) leaves chips idle
there, so the root fronts are factorized with a column-block-cyclic
right-looking Cholesky instead, written in shard_map with explicit
collectives (a psum-broadcast per panel — the ScaLAPACK pdpotrf shape,
re-expressed the XLA way; the reference has no distributed layer at all,
its closest analog is the CPU/GPU work split of
t_cholmod_super_numeric.c:540-570).

Layout: the N x N front is padded to K = ceil(N/nb) column blocks of
width nb; block j lives on device j mod P (cyclic), and each device
stores its blocks contiguously as (Kloc, N, nb).  Step k:
  1. the owner contributes column panel k, psum broadcasts it (the
     all-gather of the pivot panel over ICI);
  2. EVERY device redundantly factors the nb x nb diagonal block and
     applies the TRSM to the panel (SPMD-uniform, no divergent control
     flow — the panel work is latency-bound, duplicating it is cheaper
     than a second broadcast);
  3. each device SYRK-updates only its own trailing blocks on the MXU.
Wall-clock per step = one psum + O(N*nb^2 / P) local FLOPs.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _cyclic_order(K: int, ndev: int) -> np.ndarray:
    """Block ids in storage order: device-major, cyclic within device
    (device d stores blocks d, d+P, d+2P, ...)."""
    return np.array(sorted(range(K), key=lambda j: (j % ndev, j // ndev)),
                    dtype=np.int64)


def block_cyclic_cholesky(F: np.ndarray, mesh: Mesh, nb: int = 128,
                          axis: str | None = None) -> np.ndarray:
    """L = chol(F) (lower) with F symmetric positive definite, computed
    column-block-cyclically over every device of `mesh`.

    Returns the dense lower factor on host.  Shapes are static in
    (N_padded, nb, P): one compiled program per (front shape, mesh) pair,
    reused across refactorizations of the same pattern.
    """
    axis = axis or mesh.axis_names[0]
    ndev = mesh.devices.size
    N = F.shape[0]
    K = max(1, -(-N // nb))
    K = -(-K // ndev) * ndev          # pad #blocks to a multiple of P
    Npad = K * nb
    Ff = np.zeros((Npad, Npad), dtype=F.dtype)
    Ff[:N, :N] = F
    idx = np.arange(N, Npad)
    Ff[idx, idx] = 1.0                # padding = identity (stays finite)

    order = _cyclic_order(K, ndev)    # storage position -> global block id
    blocks = Ff.reshape(Npad, K, nb).transpose(1, 0, 2)   # (K, Npad, nb)
    blocks = blocks[order]            # device-major cyclic storage
    g_of_store = order.astype(np.int32)

    sh_b = NamedSharding(mesh, P(axis))
    sh_r = NamedSharding(mesh, P())
    dev_blocks = jax.device_put(jnp.asarray(blocks), sh_b)
    Kloc = K // ndev

    try:
        from jax import shard_map
    except ImportError:           # older jax
        from jax.experimental.shard_map import shard_map

    @functools.partial(jax.jit, out_shardings=sh_b)
    @functools.partial(shard_map, mesh=mesh, in_specs=(P(axis),),
                       out_specs=P(axis))
    def factor(Floc):                                   # (Kloc, Npad, nb)
        d = jax.lax.axis_index(axis)
        gloc = d + ndev * jnp.arange(Kloc, dtype=jnp.int32)  # global ids
        rows = jnp.arange(Npad, dtype=jnp.int32)

        def step(k, Floc):
            owner = k % ndev
            li = k // ndev
            mine = (d == owner)
            panel = jnp.where(mine,
                              jax.lax.dynamic_index_in_dim(Floc, li, 0,
                                                           keepdims=False),
                              jnp.zeros((Npad, nb), Floc.dtype))
            panel = jax.lax.psum(panel, axis)            # broadcast (ICI)
            rowmask = (rows >= k * nb).astype(Floc.dtype)
            panel = panel * rowmask[:, None]
            Akk = jax.lax.dynamic_slice(panel, (k * nb, 0), (nb, nb))
            Lkk = jnp.linalg.cholesky(Akk)
            # TRSM of every row block at once; then splice Lkk back in and
            # zero the rows above the diagonal block
            X = jax.lax.linalg.triangular_solve(
                Lkk, panel, left_side=False, lower=True, transpose_a=True)
            X = jax.lax.dynamic_update_slice(X, Lkk, (k * nb, 0))
            X = X * rowmask[:, None]
            # owner stores the factored panel
            Floc = jnp.where(mine,
                             jax.lax.dynamic_update_index_in_dim(
                                 Floc, X, li, 0),
                             Floc)
            # trailing SYRK on local blocks with global id > k:
            #   F[:, g] -= X @ X[g*nb:(g+1)*nb, :]^T
            def upd(blk, g):
                Lg = jax.lax.dynamic_slice(
                    X, (g.astype(jnp.int32) * nb, jnp.int32(0)), (nb, nb))
                return blk - X @ Lg.T
            updated = jax.vmap(upd)(Floc, gloc)
            sel = (gloc > k)[:, None, None]
            return jnp.where(sel, updated, Floc)

        Floc = jax.lax.fori_loop(0, K, step, Floc)
        return Floc

    out = np.asarray(jax.device_get(factor(dev_blocks)))
    # reassemble: storage position -> global block id
    Lf = np.empty((Npad, Npad), dtype=F.dtype)
    for pos, g in enumerate(g_of_store):
        Lf[:, g * nb:(g + 1) * nb] = out[pos]
    L = np.tril(Lf[:N, :N])
    return L
