"""Device twin of the KLU refactor/solve hot path.

The reference's circuit-simulation workflow (klu_refactor.c:7-18) is:
analyze+factor ONCE, then refactorize with the same pattern and pivot order
for every Newton step / Monte-Carlo sample.  A fixed pattern and pivot
sequence means a fixed program — the TPU-native design is therefore:

  host (once per pattern):  klu_analyze + klu_factor pick the BTF block
      structure, the per-block fill ordering, and the pivot rows; this
      module then precomputes STATIC index maps (entry -> dense block slot,
      off-diagonal entry -> (row,col) positions, block level schedule).
  device (per value set):   one jitted program assembles the scaled blocks,
      runs batched no-pivot dense LU per block-size group (the pivot order
      is baked into the row permutation), and solves by BTF block level
      sets with off-diagonal gaxpy between levels (klu_solve.c:207-219).

Blocks of equal size are stacked and factorized with one vmapped kernel;
the batch dimension over value sets (Monte-Carlo sweeps) vmaps on top.
Circuit blocks are small — throughput comes from these two batch axes, not
from within-block BLAS (the reference uses no BLAS in KLU either,
klu_kernel.c:5-8).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..core.common import Common, default_common
from ..core.sparse import INDEX, SparseCSC, invert_permutation
from ..core.status import SparseError, Status
from .klu import KLUNumeric, KLUSymbolic


@dataclasses.dataclass
class _SizeGroup:
    nb: int                 # block size
    blocks: np.ndarray      # block ids, in increasing id order
    lo: np.ndarray          # block start offsets (len = len(blocks))
    src: np.ndarray         # A-entry indices landing in these blocks
    dst: np.ndarray         # flat destinations into (G, nb, nb)


@dataclasses.dataclass
class KLUDevicePlan:
    """Static maps for the jitted refactor/solve programs."""
    n: int
    nblocks: int
    scale: str
    rows: np.ndarray            # A.indices (for the row-scaling segment max)
    groups: list                # list[_SizeGroup]
    # off-diagonal entries (block-upper-triangular part):
    off_src: np.ndarray         # A-entry index
    off_i: np.ndarray           # global row position (final pivot order)
    off_j: np.ndarray           # global col position
    off_level: np.ndarray      # solve level of the entry's column block
    levels: list                # levels[l] = [(group_idx, member_mask)] rows
    block_level: np.ndarray
    p_final: np.ndarray
    q: np.ndarray
    r: np.ndarray


def klu_device_plan(A: SparseCSC, sym: KLUSymbolic, num: KLUNumeric,
                    common: Optional[Common] = None) -> KLUDevicePlan:
    """Precompute the static maps (host, once per pattern)."""
    cm = common or default_common()
    n = sym.n
    if A.nrow != n or A.ncol != n:
        raise SparseError(Status.INVALID, "pattern mismatch")
    scale = cm.lu.scale if cm.lu.scale != "auto" else "max"
    r = np.asarray(sym.r, dtype=INDEX)
    nblocks = sym.nblocks
    pinv_final = invert_permutation(num.p_final)
    qinv = invert_permutation(sym.q)

    # classify every A entry: (col-major walk of the CSC arrays)
    cols = np.repeat(np.arange(n, dtype=INDEX), np.diff(A.indptr))
    ipos = pinv_final[A.indices]
    jpos = qinv[cols]
    block_of = np.searchsorted(r, np.arange(n), side="right") - 1
    bi, bj = block_of[ipos], block_of[jpos]
    if np.any(bi > bj):
        raise SparseError(Status.INVALID,
                          "entries below the BTF block diagonal")
    diag = bi == bj

    # size groups over the diagonal blocks
    sizes = np.diff(r)
    groups: list[_SizeGroup] = []
    group_of_block = np.empty(nblocks, dtype=INDEX)
    member_of_block = np.empty(nblocks, dtype=INDEX)
    for g, nb in enumerate(np.unique(sizes)):
        blocks = np.where(sizes == nb)[0]
        group_of_block[blocks] = g
        member_of_block[blocks] = np.arange(len(blocks))
        groups.append(_SizeGroup(nb=int(nb), blocks=blocks,
                                 lo=r[blocks], src=None, dst=None))
    ent_g = group_of_block[bi]
    for g, grp in enumerate(groups):
        sel = np.where(diag & (ent_g == g))[0]
        nb = grp.nb
        mem = member_of_block[bi[sel]]
        li = ipos[sel] - r[bi[sel]]
        lj = jpos[sel] - r[bi[sel]]
        grp.src = sel.astype(INDEX)
        grp.dst = (mem * nb * nb + li * nb + lj).astype(INDEX)

    # block solve levels: backward over blocks; block b must wait for every
    # block b' that feeds it through an off-diagonal entry (rows of b,
    # cols of b').  level 0 = no dependencies (solved first).
    off = np.where(~diag)[0]
    block_level = np.zeros(nblocks, dtype=INDEX)
    if len(off):
        import scipy.sparse as sp
        dep = sp.coo_matrix((np.ones(len(off)), (bi[off], bj[off])),
                            shape=(nblocks, nblocks)).tocsr()
        for b in range(nblocks - 1, -1, -1):
            cols_b = dep.indices[dep.indptr[b]:dep.indptr[b + 1]]
            if len(cols_b):
                block_level[b] = block_level[cols_b].max() + 1

    nlev = int(block_level.max()) + 1 if nblocks else 0
    levels = []
    for lev in range(nlev):
        per_group = []
        for g, grp in enumerate(groups):
            mask = block_level[grp.blocks] == lev
            if mask.any():
                per_group.append((g, np.where(mask)[0].astype(INDEX)))
        levels.append(per_group)

    return KLUDevicePlan(
        n=n, nblocks=nblocks, scale=scale,
        rows=A.indices.astype(INDEX), groups=groups,
        off_src=off.astype(INDEX), off_i=ipos[off].astype(INDEX),
        off_j=jpos[off].astype(INDEX),
        off_level=block_level[bj[off]].astype(INDEX),
        levels=levels, block_level=block_level,
        p_final=num.p_final.astype(INDEX), q=sym.q.astype(INDEX), r=r)


def _scaled(plan: KLUDevicePlan, avals):
    """Row-scale on device: Rs = segment max/sum of |A| per row."""
    import jax.numpy as jnp
    if plan.scale == "none":
        return avals, jnp.ones(plan.n, dtype=avals.dtype)
    mag = jnp.abs(avals)
    if plan.scale == "max":
        Rs = jnp.zeros(plan.n, dtype=mag.dtype).at[plan.rows].max(mag)
    else:  # sum
        Rs = jnp.zeros(plan.n, dtype=mag.dtype).at[plan.rows].add(mag)
    Rs = jnp.where(Rs == 0, 1.0, Rs).astype(avals.dtype)
    return avals / Rs[plan.rows], Rs


def _lu_nopivot(M):
    """Dense LU without pivoting on stacked blocks (G, nb, nb); the pivot
    order was fixed by the host factorization (klu_refactor semantics).
    L (unit diagonal) is stored below the diagonal, U on and above."""
    import jax
    import jax.numpy as jnp
    G, nb, _ = M.shape
    idx = jnp.arange(nb)

    def step(k, carry):
        M, zero = carry
        piv = M[:, k, k]
        zero = zero | jnp.any(piv == 0)
        safe = jnp.where(piv == 0, 1.0, piv)       # klu-style continue
        below = (idx > k)[None, :]
        l = jnp.where(below, M[:, :, k] / safe[:, None], 0.0)
        u = jnp.where((idx > k)[None, :], M[:, k, :], 0.0)
        M = M - l[:, :, None] * u[:, None, :]
        M = M.at[:, :, k].set(jnp.where(below, l, M[:, :, k]))
        M = M.at[:, k, k].set(safe)
        return M, zero

    if nb == 1:
        zero = jnp.any(M[:, 0, 0] == 0)
        return jnp.where(M == 0, 1.0, M), zero
    return jax.lax.fori_loop(0, nb, step, (M, jnp.array(False)))


def klu_refactor_jit(plan: KLUDevicePlan):
    """Return a jittable refactor: avals (nnz,) -> (factors, Rs, ok).

    factors[g] has shape (G_g, nb_g, nb_g) — L\\U packed per size group.
    Batch Monte-Carlo sweeps with jax.vmap over avals' leading axis.
    """
    import jax.numpy as jnp

    def refactor(avals):
        sv, Rs = _scaled(plan, avals)
        factors = []
        ok = jnp.array(True)
        for grp in plan.groups:
            G, nb = len(grp.blocks), grp.nb
            M = jnp.zeros(G * nb * nb, dtype=sv.dtype)
            M = M.at[grp.dst].set(sv[grp.src], unique_indices=True,
                                  indices_are_sorted=False)
            F, zero = _lu_nopivot(M.reshape(G, nb, nb))
            ok = ok & ~zero
            factors.append(F)
        return factors, Rs, ok

    return refactor


def klu_solve_jit(plan: KLUDevicePlan):
    """Return a jittable solve: (factors, Rs, avals, b) -> x with Ax=b.

    Runs the BTF block back-substitution by level sets: blocks in one level
    are independent; between levels the off-diagonal gaxpy is a static
    gather/scatter (the klu_solve.c:207-219 loop, batched)."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    def solve(factors, Rs, avals, b):
        sv, _ = _scaled(plan, avals)
        one_d = b.ndim == 1
        X = b.reshape(plan.n, -1).astype(sv.dtype)
        X = (X / Rs[:, None])[plan.p_final]
        offv = sv[plan.off_src]
        for lev, per_group in enumerate(plan.levels):
            for g, members in per_group:
                grp = plan.groups[g]
                nb = grp.nb
                los = grp.lo[members]                       # (Gm,)
                rows = (los[:, None] + np.arange(nb)).reshape(-1)
                xb = X[rows].reshape(len(members), nb, -1)
                F = factors[g][members]
                if nb == 1:
                    xb = xb / F[:, :, 0][..., None]
                else:
                    xb = solve_triangular(F, xb, lower=True,
                                          unit_diagonal=True)
                    xb = solve_triangular(F, xb, lower=False)
                X = X.at[rows].set(xb.reshape(-1, X.shape[1]))
            # off-diagonal contributions from columns solved in this level
            sel = np.where(plan.off_level == lev)[0]
            if len(sel):
                upd = offv[sel][:, None] * X[plan.off_j[sel]]
                X = X.at[plan.off_i[sel]].add(-upd)
        out = jnp.zeros_like(X).at[plan.q].set(X)
        return out.reshape(-1) if one_d else out

    return solve


def klu_device(A: SparseCSC, sym: KLUSymbolic, num: KLUNumeric,
               common: Optional[Common] = None):
    """Convenience: plan + jitted (refactor, solve) pair for the pattern."""
    import jax
    plan = klu_device_plan(A, sym, num, common)
    return plan, jax.jit(klu_refactor_jit(plan)), jax.jit(klu_solve_jit(plan))
