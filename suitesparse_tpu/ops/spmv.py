"""Device SpMV / SpMM kernels.

Two tiers, both pattern-static (compile once per sparsity pattern):

1. `spmv_program` / `spmm_program`: CSR-sorted gather + sorted segment
   reduce — the general-semiring path every GraphBLAS mxv/vxm rides
   (the dot/saxpy families of GB_AxB_meta.c collapse into one fused XLA
   program).  Indices are pre-sorted by destination row on the host so
   the reduction lowers to a vectorized one-pass segment sum.

2. `bcsr_spmm`: a Pallas TPU kernel for block-sparse x dense (BCSR)
   products.  Scalar-prefetched block column indices drive the X-block
   DMA schedule (PrefetchScalarGridSpec), so each (row-block, slot) grid
   step is one MXU matmul `A_block @ X[cols[slot]]` accumulated in VMEM —
   the TPU shape of the reference's dense-accumulator saxpy4 path
   (GB_AxB_saxpy4.c).  Rows are padded to a uniform number of block slots
   with a zero block, keeping the grid static.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.sparse import SparseCSC

__all__ = ["spmv_program", "spmm_program", "to_bcsr", "bcsr_spmm", "BCSR"]


# -- tier 1: CSR sorted-segment programs ---------------------------------------

@dataclasses.dataclass
class _RowProgram:
    rows: jax.Array     # (nnz,) destination rows, ascending
    cols: jax.Array     # (nnz,) source columns (gather into x)
    gat: jax.Array      # (nnz,) gather into A.data (CSC order)
    m: int
    n: int


def _row_program(A: SparseCSC) -> _RowProgram:
    m, n = A.shape
    rows = np.asarray(A.indices, dtype=np.int64)
    cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    order = np.argsort(rows, kind="stable")
    return _RowProgram(rows=jnp.asarray(rows[order], dtype=jnp.int32),
                       cols=jnp.asarray(cols[order], dtype=jnp.int32),
                       gat=jnp.asarray(order, dtype=jnp.int32), m=m, n=n)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _spmv_impl(vals, x, prog_arrays, m, mult_name, monoid_name):
    from ..graphblas.core import BINOPS
    from .spgemm import _seg_sorted
    rows, cols, gat = prog_arrays
    av = vals[gat]
    xv = x[cols]
    if xv.ndim == av.ndim + 1:          # multi-rhs X (n, k)
        av = av[:, None]
    terms = BINOPS[mult_name](av, xv)
    return _seg_sorted(monoid_name)(terms, rows, m)


def spmv_program(A: SparseCSC):
    """Returns f(vals, x, ring='plus_times') -> y, a cached device program
    for this pattern.  vals in CSC data order; x dense (n,) or (n, k)."""
    prog = _row_program(A)
    arrays = (prog.rows, prog.cols, prog.gat)

    def run(vals, x, ring="plus_times"):
        from ..graphblas.core import semiring
        r = semiring(ring) if isinstance(ring, str) else ring
        return _spmv_impl(jnp.asarray(vals), jnp.asarray(x), arrays, prog.m,
                          r.name.partition("_")[2], r.add.name)

    run.rows_with_entries = prog.rows   # for GrB empty-row semantics
    return run


def spmm_program(A: SparseCSC):
    """Same program shape for dense multi-rhs X (n, k): one extra trailing
    axis rides through the gathers and the segment reduce."""
    return spmv_program(A)   # _spmv_impl broadcasts over trailing axes


# -- tier 2: Pallas BCSR block-sparse x dense ----------------------------------

@dataclasses.dataclass
class BCSR:
    """Uniform-slot BCSR: every block row holds exactly `nslots` blocks
    (padded with an all-zero block whose column index is 0)."""

    blocks: np.ndarray      # (nrb * nslots, bm, bk)
    block_cols: np.ndarray  # (nrb * nslots,) int32, block column index
    nrb: int                # number of block rows
    nslots: int             # blocks per row (uniform, padded)
    bm: int
    bk: int
    shape: tuple            # original (m, n)


def to_bcsr(A: SparseCSC, bm: int = 128, bk: int = 128) -> BCSR:
    """Host-side conversion (once per pattern+values)."""
    import scipy.sparse as sp
    m, n = A.shape
    S = A.to_scipy().tocsr()
    nrb = -(-m // bm)
    ncb = -(-n // bk)
    Sp = sp.csr_matrix((S.data, S.indices, S.indptr), shape=(m, n))
    # bucket entries by (row block, col block)
    coo = Sp.tocoo()
    rb = coo.row // bm
    cb = coo.col // bk
    bkey = rb.astype(np.int64) * ncb + cb
    order = np.argsort(bkey, kind="stable")
    bkey_s = bkey[order]
    uniq, start = np.unique(bkey_s, return_index=True)
    counts = np.diff(np.append(start, len(bkey_s)))
    # per block row: how many distinct blocks
    urb = (uniq // ncb).astype(np.int64)
    ucb = (uniq % ncb).astype(np.int32)
    per_row = np.bincount(urb, minlength=nrb)
    nslots = max(int(per_row.max()) if len(per_row) else 0, 1)
    blocks = np.zeros((nrb * nslots, bm, bk), dtype=np.float32)
    block_cols = np.zeros(nrb * nslots, dtype=np.int32)
    slot_of_row = np.zeros(nrb, dtype=np.int64)
    for bi, key in enumerate(uniq):
        r, c = int(urb[bi]), int(ucb[bi])
        slot = int(slot_of_row[r])
        slot_of_row[r] += 1
        dst = r * nslots + slot
        block_cols[dst] = c
        sel = slice(start[bi], start[bi] + counts[bi])
        rr = coo.row[order][sel] - r * bm
        cc = coo.col[order][sel] - c * bk
        blocks[dst, rr, cc] = coo.data[order][sel]
    return BCSR(blocks=blocks, block_cols=block_cols, nrb=nrb,
                nslots=nslots, bm=bm, bk=bk, shape=(m, n))


try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:                      # pragma: no cover
    _HAS_PALLAS = False


def _bcsr_kernel(cols_ref, a_ref, x_ref, o_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(a_ref[0], x_ref[:],
                        preferred_element_type=jnp.float32)


def bcsr_spmm(bc: BCSR, X, interpret: Optional[bool] = None) -> jax.Array:
    """Y = A @ X with A in uniform-slot BCSR, X dense (n, k).  One MXU
    matmul per (row block, slot); X blocks are DMA'd by scalar-prefetched
    block column indices.  `interpret=True` runs the kernel in interpreter
    mode (CPU tests); default auto-detects the backend."""
    if interpret is None:
        interpret = next(iter(jnp.zeros(1).devices())).platform != "tpu"
    m, n = bc.shape
    k = X.shape[1]
    kp = -(-k // 128) * 128
    Xp = jnp.zeros((bc.bk * -(-n // bc.bk), kp), dtype=jnp.float32)
    Xp = Xp.at[:n, :k].set(jnp.asarray(X, dtype=jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bc.nrb, bc.nslots),
        in_specs=[
            pl.BlockSpec((1, bc.bm, bc.bk),
                         lambda r, t, cols: (r * bc.nslots + t, 0, 0)),
            pl.BlockSpec((bc.bk, kp), lambda r, t, cols:
                         (cols[r * bc.nslots + t], 0)),
        ],
        out_specs=pl.BlockSpec((bc.bm, kp), lambda r, t, cols: (r, 0)),
    )
    out = pl.pallas_call(
        _bcsr_kernel,
        out_shape=jax.ShapeDtypeStruct((bc.nrb * bc.bm, kp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(bc.block_cols), jnp.asarray(bc.blocks), Xp)
    return out[:m, :k]
