"""Pallas TPU kernels for the supernodal factor hot path.

Round-3 measurement (NOTES_ROUND3.md): XLA's batched ``cholesky`` /
``triangular_solve`` lower to a sequential While over columns — ~1.9 ms
for a (128,128,128) batch — and POTRF+TRSM was ~47 ms of the 181 ms
lap3d_44 numeric program.  This module replaces the pair with ONE fused
Pallas kernel per factor class: a VMEM-resident blocked right-looking
Cholesky over 8-wide block columns that simultaneously applies the
substitution to the below-diagonal rows (the TRSM), so a whole (W, Mp, Np)
panel wave factors in a single kernel launch with ~30 fused vector ops per
block column instead of ~Np dispatched XLA ops.

Reference behavior anchor: the dense kernel hot loop of
t_cholmod_super_numeric.c:864 (POTRF) and :997 (TRSM); the blocked
algorithm is the classical LAPACK dpotrf right-looking variant
re-architected batch-first for the MXU/VPU.

Junk discipline: the stored panel's diagonal block holds garbage above the
diagonal (projection scatter artifacts).  The kernel only ever READS
entries at rows >= column (the lower triangle), and the final masked write
zeroes the upper triangle, so no symmetrization pass is needed at all
(the XLA path reconstructs the full symmetric block first).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["panel_factor", "pallas_enabled"]

_BS = 8            # block-column width
_VMEM_FLOATS = 1 << 19   # per-input VMEM budget (floats) for picking Wc


def pallas_enabled() -> bool:
    """Use the Pallas panel kernel?  Default ON on TPU; SSTPU_POTRF=xla
    falls back to the jnp.linalg path (accuracy/debug escape hatch), and
    SSTPU_POTRF=pallas forces it on CPU (interpret mode — used by the
    dedicated kernel-parity tests; too heavy as the CPU suite default)."""
    import os
    mode = os.environ.get("SSTPU_POTRF", "")
    if mode:
        return mode != "xla"
    return not _interpret()


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _panel_kernel(Np: int, Mp: int):
    """Kernel body for one (Wc, Mp, Np) chunk: blocked Cholesky of the
    top (Np, Np) block + substitution of all rows below each block column
    (rows of the diagonal block AND the (Mb, Np) below block — the TRSM)."""

    def kernel(p_ref, pe_ref, rm_ref, cm_ref, out_ref):
        dt = p_ref.dtype
        ri = jax.lax.broadcasted_iota(jnp.int32, (Mp, Np), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (Mp, Np), 1)
        eyeM = (ri == ci).astype(dt)
        # out_ref is the mutable working panel (in-place ref updates are
        # the Mosaic-supported state form); padded diagonal gets a unit
        # pivot so rsqrt stays finite
        out_ref[:] = p_ref[:] + eyeM[None] * pe_ref[:][:, None, :]
        nblk = Np // _BS
        for k in range(nblk):
            k8 = k * _BS
            for j in range(_BS):
                c = k8 + j
                d = jax.lax.rsqrt(out_ref[:, c:c + 1, c:c + 1])  # (Wc,1,1)
                col = out_ref[:, :, c:c + 1] * d                 # (Wc,Mp,1)
                out_ref[:, :, c:c + 1] = col
                if j < _BS - 1:
                    # rank-1 update of the remaining block columns; the L
                    # row entries live inside col itself
                    lrow = col[:, c + 1:k8 + _BS, 0]             # (Wc,b)
                    out_ref[:, :, c + 1:k8 + _BS] = (
                        out_ref[:, :, c + 1:k8 + _BS]
                        - col * lrow[:, None, :])
            if k8 + _BS < Np:
                # trailing update: all rows (incl. below block), columns
                # beyond this block column.  Static slices — k is Python.
                P8 = out_ref[:, :, k8:k8 + _BS]                  # (Wc,Mp,8)
                T8 = out_ref[:, k8 + _BS:Np, k8:k8 + _BS]        # (Wc,t,8)
                out_ref[:, :, k8 + _BS:] = (
                    out_ref[:, :, k8 + _BS:] - jax.lax.dot_general(
                        P8, T8, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=dt))
        # masked write: row/col masks fold the padding; tril zeroes the
        # upper-triangle junk of the diagonal block
        # tril within the diagonal block, pass-through below (float
        # arithmetic: Mosaic rejects vector-bool selects)
        tr = jnp.maximum((ri >= ci).astype(dt), (ri >= Np).astype(dt))
        out_ref[:] = (out_ref[:] * rm_ref[:][:, :, None]
                      * cm_ref[:][:, None, :] * tr[None])

    return kernel


def _pick_wc(W: int, Mp: int, Np: int) -> int:
    wc = W
    while wc > 1 and wc * Mp * Np > _VMEM_FLOATS:
        wc //= 2
    return max(wc, 1)


@functools.partial(jax.jit, static_argnums=(4,))
def _panel_factor_call(P, pe, rm, cm, interp):
    W, Mp, Np = P.shape
    Wc = _pick_wc(W, Mp, Np)
    grid = (W // Wc,)
    kern = _panel_kernel(Np, Mp)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Wc, Mp, Np), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Mp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Wc, Mp, Np), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
        interpret=interp,
    )(P, pe, rm, cm)


def panel_factor(P, pe, rm, cm):
    """Fused POTRF + TRSM of a panel wave.

    P:  (W, Mp, Np) panels — rows [0, Np) hold the (junk-above-diagonal)
        symmetric diagonal block, rows [Np, Mp) the below-diagonal block.
    pe: (W, Np) 1.0 on padded diagonal rows.
    rm: (W, Mp) row mask; cm: (W, Np) column mask.
    Returns the masked factored panels: L in the lower triangle of the top
    block (upper zeroed), B L^-T in the below rows.
    """
    return _panel_factor_call(P, pe, rm, cm, _interpret())
