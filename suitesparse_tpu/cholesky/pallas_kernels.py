"""Pallas TPU kernels for the supernodal factor hot path.

Round-3 measurement (NOTES_ROUND3.md): XLA's batched ``cholesky`` /
``triangular_solve`` lower to a sequential While over columns — ~1.9 ms
for a (128,128,128) batch — and POTRF+TRSM was ~47 ms of the 181 ms
lap3d_44 numeric program.

Design (round 4, revised after measuring the axon remote-compile cost):
ONE tiny square Cholesky kernel ``_block_chol`` on (Wc, Np, Np) diagonal
blocks with Np in {8, 32, 128} and a FIXED per-Np batch tile Wc — so the
whole framework compiles exactly three Mosaic kernels, reused by every
factor class of every matrix (a per-class fused panel kernel measured
14 min of Mosaic compile for a single shape through the remote tunnel).
Everything else stays at the XLA level where it is already fast:

  * TRSM of the below rows: batch-folded triangular inverse (one einsum,
    pf._tri_inv_pow2 idea) against the kernel's upper-triangular output
    U = L^T, so no output transpose is needed before the solve;
  * Np > 128 classes: an XLA-level right-looking loop over 128-wide
    panels (kernel + inverse-einsum TRSM + one SYRK einsum per panel).

Kernel layout: the batch rides the leading (grid) dim; the state is
TRANSPOSED — A[w, c, r] = L[r, c] — so every per-column operation is a
SUBLANE slice (Wc, 1, Np) with rows on the 128-lane axis (column slices
in the natural orientation would each occupy one lane of a padded tile).
The input is the symmetrized diagonal block, which equals its own
transpose, so only the OUTPUT needs one (cheap, fused) XLA transpose.

Reference behavior anchor: the dense kernel hot loop of
t_cholmod_super_numeric.c:864 (POTRF) and :997 (TRSM); the blocked
algorithm is the classical LAPACK dpotrf right-looking variant.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["panel_factor", "block_chol", "pallas_enabled"]

_BS = 8                       # in-kernel block-column width
# fixed batch tile per Np (one compiled Mosaic kernel each).  Sized to
# ~2 MB per VMEM buffer: the in-kernel per-op issue cost dominates at
# small tiles (measured ~0.2 us/op regardless of width), so the batch
# tile is made as fat as VMEM allows to amortize it.
_WC = {8: 512, 32: 512, 128: 32}


def pallas_enabled() -> bool:
    """Use the Pallas kernel?  Default ON on TPU; SSTPU_POTRF=xla falls
    back to the jnp.linalg path (accuracy/debug escape hatch), and
    SSTPU_POTRF=pallas forces it on CPU (interpret mode — used by the
    dedicated kernel-parity tests; too heavy as the CPU suite default)."""
    import os
    mode = os.environ.get("SSTPU_POTRF", "")
    if mode:
        return mode != "xla"
    return not _interpret()


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chol_kernel(Np: int):
    """Blocked right-looking Cholesky of a symmetric (Wc, Np, Np) batch in
    the transposed orientation: state A[w, c, r] = L[r, c]; the result's
    upper triangle is U = L^T (zeros below the diagonal)."""

    def kernel(s_ref, pe_ref, out_ref):
        dt = s_ref.dtype
        ci = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)  # sublane = c
        ri = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)  # lane    = r
        eye = (ci == ri).astype(dt)
        # padded diagonal: unit pivot on padded rows keeps rsqrt finite
        out_ref[:] = s_ref[:] + eye[None] * pe_ref[:][:, :, None]
        for k in range(Np // _BS):
            k8 = k * _BS
            for j in range(_BS):
                c = k8 + j
                d = jax.lax.rsqrt(out_ref[:, c:c + 1, c:c + 1])
                row = out_ref[:, c:c + 1, :] * d             # (Wc,1,Np)
                out_ref[:, c:c + 1, :] = row
                if j < _BS - 1:
                    # rank-1 update of the remaining block columns; the
                    # coefficients are entries c+1..blockend of row itself
                    lcoef = jnp.swapaxes(
                        row[:, :, c + 1:k8 + _BS], 1, 2)     # (Wc,b,1)
                    out_ref[:, c + 1:k8 + _BS, :] = (
                        out_ref[:, c + 1:k8 + _BS, :] - lcoef * row)
            if k8 + _BS < Np:
                C8 = out_ref[:, k8:k8 + _BS, :]              # (Wc,8,Np)
                lhs = C8[:, :, k8 + _BS:]                    # (Wc,8,t)
                # trailing update for all later columns (static slices).
                # Explicit HIGHEST precision: Mosaic rejects the HIGH
                # (tensorfloat32) default the package sets for XLA-level
                # dots, and DEFAULT would run the update in single-pass
                # bf16 (~1e-3 relative — the round-4 residual-plateau
                # class of error) inside the diagonal factor itself.
                upd = jax.lax.dot_general(
                    lhs, C8, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=dt,
                    precision=jax.lax.Precision.HIGHEST)     # (Wc,t,Np)
                out_ref[:, k8 + _BS:, :] = out_ref[:, k8 + _BS:, :] - upd
        keep = (ri >= ci).astype(dt)
        out_ref[:] = out_ref[:] * keep[None]

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def _block_chol_call(S, pe, interp):
    W, Np, _ = S.shape
    Wc = min(_WC.get(Np, 8), W)
    return pl.pallas_call(
        _chol_kernel(Np),
        grid=(W // Wc,),
        in_specs=[
            pl.BlockSpec((Wc, Np, Np), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Wc, Np, Np), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(S.shape, S.dtype),
        interpret=interp,
    )(S, pe)


def block_chol(S, pe):
    """U = chol(S + diag(pe))^T for a SYMMETRIC batch S (W, Np, Np).

    Returns the UPPER-triangular transpose of the Cholesky factor (zeros
    below the diagonal).  W is padded up to the class's fixed batch tile
    with identity blocks so every Np shares one compiled Mosaic kernel."""
    W, Np, _ = S.shape
    Wc = _WC.get(Np, 8)
    Wpad = -(-W // Wc) * Wc if W >= Wc else Wc
    if Wpad != W:
        S = jnp.concatenate(
            [S, jnp.zeros((Wpad - W, Np, Np), dtype=S.dtype)], axis=0)
        pe = jnp.concatenate(
            [pe, jnp.ones((Wpad - W, Np), dtype=pe.dtype)], axis=0)
    out = _block_chol_call(S, pe, _interpret())
    return out[:W]


def _tri_inv_upper_pow2(U, base=2):
    """Batched UPPER-triangular inverse via batch-folded block recursion
    (the transpose twin of pf._tri_inv_pow2):

        inv([[A, B], [0, D]]) = [[iA, -iA B iD], [0, iD]]

    The fold bottoms out at CLOSED-FORM 2x2 inverses (round-5: the
    base-8 triangular_solve lowered to a sequential While that measured
    7.4 ms across lap3d_44) + log2(Np/2) levels of batched MXU matmuls.
    Np must be a power of two."""
    W, Np, _ = U.shape
    blocks = U
    stack = []
    m = Np
    while m > base:
        h = m // 2
        stack.append(blocks[:, :h, h:])
        blocks = jnp.concatenate(
            [blocks[:, :h, :h], blocks[:, h:, h:]], axis=0)
        m = h
    if m == 2:
        # inv([[a,b],[0,d]]) = [[1/a, -b/(a d)], [0, 1/d]] — elementwise
        ia = 1.0 / blocks[:, 0, 0]
        idd = 1.0 / blocks[:, 1, 1]
        off = -blocks[:, 0, 1] * ia * idd
        z = jnp.zeros_like(ia)
        inv = jnp.stack(
            [jnp.stack([ia, off], axis=1),
             jnp.stack([z, idd], axis=1)], axis=1)
    else:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=U.dtype), blocks.shape)
        inv = jax.lax.linalg.triangular_solve(
            blocks, eye, left_side=True, lower=False)
    while stack:
        Bblk = stack.pop()
        half = inv.shape[0] // 2
        iA, iD = inv[:half], inv[half:]
        iB = -jnp.einsum("bij,bjk,bkl->bil", iA, Bblk, iD,
                         preferred_element_type=U.dtype)
        h = Bblk.shape[1]
        top = jnp.concatenate([iA, iB], axis=2)
        bot = jnp.concatenate(
            [jnp.zeros((half, Bblk.shape[2], h), dtype=U.dtype), iD],
            axis=2)
        inv = jnp.concatenate([top, bot], axis=1)
    return inv


def panel_factor(P, pe, rm, cm):
    """Fused POTRF + TRSM of a panel wave, composed from the shared
    ``block_chol`` kernel + batch-folded inverse einsums.

    P:  (W, Mp, Np) panels — rows [0, Np) hold the (junk-above-diagonal)
        symmetric diagonal block, rows [Np, Mp) the below-diagonal block.
    pe: (W, Np) 1.0 on padded diagonal rows.
    rm: (W, Mp) row mask; cm: (W, Np) column mask.
    Returns the masked factored panels: L in the lower triangle of the top
    block (upper zeroed), B L^-T in the below rows.
    """
    W, Mp, Np = P.shape
    dt = P.dtype
    BB = min(Np, 128)
    A = P
    slabs = []
    for a in range(0, Np, BB):
        b = a + BB
        T = A[:, a:b, a:b]
        S = jnp.tril(T)
        S = S + jnp.tril(S, -1).transpose(0, 2, 1)
        Ut = block_chol(S, pe[:, a:b])           # (W, BB, BB), U = L^T
        C = Ut.transpose(0, 2, 1)
        below = A[:, b:, a:b]                    # rows b..Mp (maybe empty)
        if below.shape[1]:
            # TRSM: Bm = B L^-T = B @ inv(U); one einsum on the MXU
            Uinv = _tri_inv_upper_pow2(Ut)
            Lb = jnp.einsum("bmj,bji->bmi", below, Uinv,
                            preferred_element_type=dt)
            slab = jnp.concatenate(
                [jnp.zeros((W, a, BB), dtype=dt), C, Lb], axis=1)
        else:
            Lb = None
            slab = jnp.concatenate(
                [jnp.zeros((W, a, BB), dtype=dt), C], axis=1)
        slabs.append(slab)
        if b < Np:
            # trailing update: rows b..Mp, columns b..Np — written back
            # IN PLACE (round-5: the concatenate form rebuilt the whole
            # (W, Mp, Np) panel per slab, ~15 GB of pure copy traffic on
            # the lap3d_64 root front alone)
            Tside = Lb[:, :Np - b, :]
            upd = jnp.einsum("bik,bjk->bij", Lb, Tside,
                             preferred_element_type=dt)
            A = jax.lax.dynamic_update_slice(
                A, A[:, b:, b:] - upd, (0, b, b))
    newP = jnp.concatenate(slabs, axis=2) if len(slabs) > 1 else slabs[0]
    return newP * rm[:, :, None] * cm[:, None, :]
