"""Graph algorithms on the GraphBLAS-lite layer (the reference's demo
algebra: GraphBLAS/Demo — pagerank, BFS, triangle counting)."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.sparse import SparseCSC
from .core import GrBMatrix, mxv, reduce_rows, semiring, vxm


def pagerank(A, damping: float = 0.85, tol: float = 1e-9,
             max_iter: int = 100) -> np.ndarray:
    """PageRank by repeated vxm over plus_times (dpagerank.c demo analog).
    A[i,j] != 0 means an edge i -> j."""
    G = GrBMatrix.from_csc(A) if isinstance(A, SparseCSC) else A
    n = G.shape[0]
    outdeg = np.maximum(np.asarray(
        reduce_rows(GrBMatrix(G.rows, G.cols, jnp.ones_like(G.vals), G.shape),
                    "plus")), 1.0)
    # row-normalized transition matrix
    W = GrBMatrix(G.rows, G.cols,
                  G.vals / jnp.asarray(outdeg)[G.rows], G.shape)
    r = jnp.full(n, 1.0 / n)
    for _ in range(max_iter):
        rnew = damping * vxm(r, W) + (1.0 - damping) / n
        # dangling mass
        dangling = float(jnp.sum(r)) - float(jnp.sum(rnew))
        rnew = rnew + dangling / n
        if float(jnp.abs(rnew - r).sum()) < tol:
            r = rnew
            break
        r = rnew
    return np.asarray(r)


def bfs_levels(A, source: int) -> np.ndarray:
    """BFS level per vertex (-1 unreachable) via lor_land mxv over the
    boolean semiring (bfs5m.c demo analog)."""
    G = GrBMatrix.from_csc(A) if isinstance(A, SparseCSC) else A
    n = G.shape[0]
    level = np.full(n, -1, dtype=np.int64)
    frontier = np.zeros(n, dtype=bool)
    frontier[source] = True
    level[source] = 0
    for depth in range(1, n + 1):
        nxt = np.asarray(vxm(jnp.asarray(frontier, dtype=jnp.float32), G,
                             "lor_land"))
        nxt = np.asarray(nxt).astype(bool) & (level < 0)
        if not nxt.any():
            break
        level[nxt] = depth
        frontier = nxt
    return level


def triangle_count(A) -> int:
    """Number of triangles: sum(tril(A) .* (tril(A) @ tril(A)')) over
    plus_times with a mask (GraphBLAS tricount demo method)."""
    from .core import apply, ewise_mult, mxm, reduce_scalar, select
    Ac = A if isinstance(A, SparseCSC) else A.to_csc()
    L = apply(select(Ac, "tril"), "one")       # strictly-lower pattern ones
    L = select(L, lambda r, c, v: r > c)
    M = ewise_mult(mxm(L, L.transpose()), L, "times")
    return int(round(float(reduce_scalar(M, "plus"))))
