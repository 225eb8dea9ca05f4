"""Device SpGEMM over arbitrary semirings: Gustavson expansion -> sorted
segment reduce.

Reference counterpart: the saxpy3 Gustavson/hash family with coarse/fine
task scheduling (GraphBLAS/Source/GB_AxB_saxpy3.c:176-292 and
Template/GB_AxB_saxpy3_template.c).  TPU-first re-design: everything
irregular — the expansion index arithmetic, the output pattern, the sort —
happens ONCE per (pattern(A), pattern(B)[, mask]) on the host with numpy;
the numeric product is then one fused static-shape device program:

    terms = mult(Avals[ea], Bvals[eb])        # two gathers + one VPU op
    Cvals = segment_reduce(terms, seg, nnzC)  # sorted segment-monoid

so ANY (monoid, binop) pair from the catalog runs on device with one
compile per pattern pair, and refactor-style value changes are free.
This is the same sorted-segment trick the supernodal Cholesky extend-add
uses (cholesky/super_numeric.py) — XLA lowers a sorted segment reduction
to a vectorized one-pass update instead of a serialized scatter.

The masked variant (C<M> = A op.op B) intersects the expansion with the
mask pattern at plan time — the analog of the reference's dot3 masked
product (GB_AxB_dot3.c) — so e.g. triangle counting touches only the
entries it keeps.
"""
from __future__ import annotations

import dataclasses
import functools
import hashlib
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.sparse import INDEX, SparseCSC

__all__ = ["SpGEMMPlan", "spgemm_plan", "spgemm_apply", "spgemm",
           "pattern_key"]


# -- sorted segment reductions per monoid -------------------------------------

def _seg_sorted(name: str):
    base = {
        "plus": jax.ops.segment_sum,
        "times": jax.ops.segment_prod,
        "min": jax.ops.segment_min,
        "max": jax.ops.segment_max,
        "any": jax.ops.segment_max,
    }
    if name in base:
        fn = base[name]
        return lambda d, s, n: fn(d, s, num_segments=n,
                                  indices_are_sorted=True)
    # dtype-true logical reductions: nonzero = true, result in the input
    # dtype (integer/bool semiring semantics, no float casts)
    if name == "lor":
        return lambda d, s, n: (jax.ops.segment_max(
            (d != 0).astype(jnp.int32), s, num_segments=n,
            indices_are_sorted=True) > 0).astype(d.dtype)
    if name == "land":
        return lambda d, s, n: (jax.ops.segment_min(
            (d != 0).astype(jnp.int32), s, num_segments=n,
            indices_are_sorted=True) > 0).astype(d.dtype)
    if name == "lxor":
        return lambda d, s, n: (jax.ops.segment_sum(
            (d != 0).astype(jnp.int32), s, num_segments=n,
            indices_are_sorted=True) % 2).astype(d.dtype)
    # registered/user monoids: generic fold through the catalog entry
    from ..graphblas.core import MONOIDS
    if name in MONOIDS:
        red = MONOIDS[name].segment_reduce
        return lambda d, s, n: red(d, s, n)
    raise KeyError(name)


# -- plan ----------------------------------------------------------------------

@dataclasses.dataclass
class SpGEMMPlan:
    """Static per-pattern product program (host arrays + device mirrors)."""

    ea: np.ndarray        # (F,) gather into A.data (CSC data order)
    eb: np.ndarray        # (F,) gather into B.data (CSC data order)
    seg: np.ndarray       # (F,) output segment per term, ascending
    out_rows: np.ndarray  # (nnzC,)
    out_cols: np.ndarray  # (nnzC,)
    nnz: int
    shape: tuple
    flops: int            # multiply count F

    _dev: Optional[tuple] = None

    def device_maps(self):
        if self._dev is None:
            self._dev = (jnp.asarray(self.ea, dtype=jnp.int32),
                         jnp.asarray(self.eb, dtype=jnp.int32),
                         jnp.asarray(self.seg, dtype=jnp.int32))
        return self._dev


def spgemm_plan(A: SparseCSC, B: SparseCSC,
                mask: Optional[SparseCSC] = None,
                complement: bool = False) -> SpGEMMPlan:
    """Build the static product program for C = A·B (patterns only).

    With `mask`, the expansion is restricted to (complemented) mask
    positions at plan time; C's pattern is then a subset of the mask."""
    m, ka = A.shape
    kb, n = B.shape
    if ka != kb:
        from ..core.status import SparseError, Status
        raise SparseError(Status.INVALID,
                          f"spgemm shape mismatch {A.shape} x {B.shape}")
    nnzA = A.nnz
    # A entries in CSC data order
    ar = np.asarray(A.indices, dtype=np.int64)
    ac = np.repeat(np.arange(ka, dtype=np.int64), np.diff(A.indptr))
    # B rows with CSC data positions: CSR of position values
    import scipy.sparse as sp
    SBpos = sp.csc_matrix(
        (np.arange(B.nnz, dtype=np.int64), np.asarray(B.indices),
         np.asarray(B.indptr)), shape=B.shape).tocsr()
    brp = SBpos.indptr.astype(np.int64)
    bcols = SBpos.indices.astype(np.int64)
    bpos = SBpos.data
    # expansion: A entry t=(i,k) x every entry (k,j) of B row k
    cnt = brp[ac + 1] - brp[ac]
    F = int(cnt.sum())
    if F == 0:
        z = np.empty(0, np.int64)
        return SpGEMMPlan(z, z, z, z.astype(INDEX), z.astype(INDEX), 0,
                          (m, n), 0)
    ea = np.repeat(np.arange(nnzA, dtype=np.int64), cnt)
    off = np.zeros(nnzA + 1, dtype=np.int64)
    np.cumsum(cnt, out=off[1:])
    within = np.arange(F, dtype=np.int64) - off[ea]
    t = brp[ac[ea]] + within
    eb = bpos[t]
    key = ar[ea] * n + bcols[t]
    if mask is not None:
        mr = np.asarray(mask.indices, dtype=np.int64)
        mc = np.repeat(np.arange(mask.shape[1], dtype=np.int64),
                       np.diff(mask.indptr))
        mkeys = np.sort(mr * n + mc)
        pos = np.searchsorted(mkeys, key)
        pos = np.minimum(pos, len(mkeys) - 1) if len(mkeys) else pos
        hit = (mkeys[pos] == key) if len(mkeys) else np.zeros(F, dtype=bool)
        keep = ~hit if complement else hit
        ea, eb, key = ea[keep], eb[keep], key[keep]
        F = len(key)
        if F == 0:
            z = np.empty(0, np.int64)
            return SpGEMMPlan(z, z, z, z.astype(INDEX), z.astype(INDEX), 0,
                              (m, n), 0)
    order = np.argsort(key, kind="stable")
    ea, eb, key = ea[order], eb[order], key[order]
    newseg = np.empty(F, dtype=bool)
    newseg[0] = True
    np.not_equal(key[1:], key[:-1], out=newseg[1:])
    seg = np.cumsum(newseg) - 1
    ukey = key[newseg]
    return SpGEMMPlan(ea=ea, eb=eb, seg=seg,
                      out_rows=(ukey // n).astype(INDEX),
                      out_cols=(ukey % n).astype(INDEX),
                      nnz=len(ukey), shape=(m, n), flops=F)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _spgemm_device(avals, bvals, maps, mult_name, monoid_name, nnz):
    from ..graphblas.core import BINOPS
    ea, eb, seg = maps
    terms = BINOPS[mult_name](avals[ea], bvals[eb])
    return _seg_sorted(monoid_name)(terms, seg, nnz)


def spgemm_apply(plan: SpGEMMPlan, avals, bvals, ring) -> jax.Array:
    """Numeric product on device: C values for the plan's pattern.  `ring`
    is a graphblas Semiring (or its name)."""
    from ..graphblas.core import semiring
    if isinstance(ring, str):
        ring = semiring(ring)
    if plan.nnz == 0:
        return jnp.empty(0, dtype=jnp.result_type(avals, bvals))
    mult_name, monoid_name = ring.name.partition("_")[2], ring.add.name
    return _spgemm_device(jnp.asarray(avals), jnp.asarray(bvals),
                          plan.device_maps(), mult_name, monoid_name,
                          plan.nnz)


# -- plan cache ----------------------------------------------------------------

def pattern_key(A: SparseCSC) -> bytes:
    """Cheap pattern fingerprint (values excluded)."""
    h = hashlib.blake2b(digest_size=16)
    h.update(np.asarray(A.indptr).tobytes())
    h.update(np.asarray(A.indices).tobytes())
    h.update(repr(A.shape).encode())
    return h.digest()


_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 64


def cached_plan(A: SparseCSC, B: SparseCSC, mask=None,
                complement: bool = False) -> SpGEMMPlan:
    key = (pattern_key(A), pattern_key(B),
           None if mask is None else pattern_key(mask), complement)
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        plan = spgemm_plan(A, B, mask=mask, complement=complement)
        if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        _PLAN_CACHE[key] = plan
    return plan


def spgemm(A: SparseCSC, B: SparseCSC, ring="plus_times", mask=None,
           complement: bool = False) -> SparseCSC:
    """One-call C = A ⊕.⊗ B with plan caching (pattern-stable programs
    compile once; value changes rerun the compiled product)."""
    from ..core.sparse import Triplet
    plan = cached_plan(A, B, mask=mask, complement=complement)
    av = A.data if A.data is not None else np.ones(A.nnz)
    bv = B.data if B.data is not None else np.ones(B.nnz)
    vals = np.asarray(spgemm_apply(plan, av, bv, ring))
    return Triplet(plan.out_rows, plan.out_cols, vals, plan.shape).to_csc()
