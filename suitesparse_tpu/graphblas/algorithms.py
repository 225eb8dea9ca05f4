"""Graph algorithms on the GraphBLAS-lite layer (the reference's demo
algebra: GraphBLAS/Demo — pagerank, BFS, triangle counting).

TPU-first: each algorithm is ONE compiled device program per graph
pattern — the iteration is a lax.while_loop over static-shape arrays, so
nothing round-trips to the host between steps (vs the reference's
per-iteration GrB calls, e.g. Demo/Source/dpagerank.c)."""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.sparse import SparseCSC
from .core import GrBMatrix, mxv, reduce_rows, semiring, vxm


def _coo_arrays(A: SparseCSC):
    """(rows, cols, vals) in CSC data order — already sorted by column,
    which makes column-destination segment reductions sorted."""
    rows = jnp.asarray(np.asarray(A.indices), dtype=jnp.int32)
    cols = jnp.asarray(
        np.repeat(np.arange(A.shape[1], dtype=np.int64),
                  np.diff(A.indptr)), dtype=jnp.int32)
    vals = jnp.asarray(A.data if A.data is not None else np.ones(A.nnz))
    return rows, cols, vals


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _pagerank_device(rows, cols, wvals, n, damping, tol, max_iter):
    def step(carry):
        r, _, it = carry
        # y = W' r over plus_times: terms sorted by destination column
        y = jax.ops.segment_sum(wvals * r[rows], cols, num_segments=n,
                                indices_are_sorted=True)
        rnew = damping * y + (1.0 - damping) / n
        rnew = rnew + (jnp.sum(r) - jnp.sum(rnew)) / n   # dangling mass
        return rnew, jnp.abs(rnew - r).sum(), it + 1

    def cond(carry):
        _, delta, it = carry
        return (delta > tol) & (it < max_iter)

    r0 = jnp.full(n, 1.0 / n, dtype=wvals.dtype)
    r, _, _ = jax.lax.while_loop(cond, step, (r0, jnp.asarray(np.inf,
                                                              wvals.dtype), 0))
    return r


def pagerank(A, damping: float = 0.85, tol: float = 1e-9,
             max_iter: int = 100) -> np.ndarray:
    """PageRank (dpagerank.c demo analog), one compiled device loop.
    A[i,j] != 0 means an edge i -> j."""
    Ac = A.to_csc() if isinstance(A, GrBMatrix) else A
    n = Ac.shape[0]
    rows, cols, _ = _coo_arrays(Ac)
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    outdeg = jnp.maximum(jax.ops.segment_sum(
        jnp.ones_like(rows, dtype=fdt), rows, num_segments=n), 1.0)
    wvals = (1.0 / outdeg[rows]).astype(fdt)
    return np.asarray(_pagerank_device(rows, cols, wvals, n, float(damping),
                                       float(tol), int(max_iter)))


@functools.partial(jax.jit, static_argnums=(2,))
def _bfs_device(rows, cols, n, source):
    def step(carry):
        level, frontier, depth = carry
        hit = jax.ops.segment_max(frontier[rows].astype(jnp.int32), cols,
                                  num_segments=n,
                                  indices_are_sorted=True) > 0
        nxt = hit & (level < 0)
        level = jnp.where(nxt, depth, level)
        return level, nxt, depth + 1

    def cond(carry):
        _, frontier, depth = carry
        return frontier.any() & (depth <= n)

    level0 = jnp.full(n, -1, dtype=jnp.int32).at[source].set(0)
    frontier0 = jnp.zeros(n, dtype=bool).at[source].set(True)
    level, _, _ = jax.lax.while_loop(cond, step, (level0, frontier0, 1))
    return level


def bfs_levels(A, source: int, method: str = "device") -> np.ndarray:
    """BFS level per vertex (-1 unreachable), bfs5m.c demo analog.

    method="device": one compiled lax.while_loop with a dense boolean
    frontier — the TPU-idiomatic pull step (static shapes beat sparse
    frontiers on this hardware for all but extreme diameters).
    method="push": host loop with a HYPERSPARSE frontier vector (the
    reference's push direction over sparse frontiers, GrB_Vector with
    GxB_HYPERSPARSE) — O(edges touched), best for huge low-degree graphs.
    """
    Ac = A.to_csc() if isinstance(A, GrBMatrix) else A
    n = Ac.shape[0]
    if method == "device":
        rows, cols, _ = _coo_arrays(Ac)
        return np.asarray(_bfs_device(rows, cols, n, source))  # int32
    # push over hypersparse frontier: walk CSR rows of the frontier only
    S = Ac.to_scipy().tocsr()
    level = np.full(n, -1, dtype=np.int32)
    level[source] = 0
    frontier_idx = np.array([source], dtype=np.int64)   # hypersparse vector
    depth = 0
    while len(frontier_idx):
        depth += 1
        # neighbors of the frontier = union of its CSR rows
        starts, ends = S.indptr[frontier_idx], S.indptr[frontier_idx + 1]
        total = int((ends - starts).sum())
        if total == 0:
            break
        nbr = np.empty(total, dtype=np.int64)
        k = 0
        for s, e in zip(starts, ends):
            nbr[k:k + (e - s)] = S.indices[s:e]
            k += e - s
        nbr = np.unique(nbr)
        nxt = nbr[level[nbr] < 0]
        level[nxt] = depth
        frontier_idx = nxt
    return level


def triangle_count(A) -> int:
    """Number of triangles: C<L> = L·Lᵀ over plus_pair, then reduce —
    the reference's masked dot3 tricount (GraphBLAS tricount demo /
    GB_AxB_dot3.c).  The mask restricts the device Gustavson expansion at
    plan time, so only wedge closures that land on an edge are computed."""
    from ..ops.spgemm import cached_plan, spgemm_apply
    from .core import select
    Ac = A if isinstance(A, SparseCSC) else A.to_csc()
    L = select(Ac, lambda r, c, v: r > c)      # strictly lower pattern
    ones = np.ones(L.nnz)
    plan = cached_plan(L, L.transpose(), mask=L)
    if plan.nnz == 0:
        return 0
    vals = spgemm_apply(plan, ones, ones, "plus_pair")
    return int(round(float(jnp.sum(vals))))
