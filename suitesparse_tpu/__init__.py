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

from .core.common import Common, default_common
from .core.sparse import SparseCSC, Triplet, eye, spzeros
from .core.status import SparseError, Status

__all__ = [
    "Common", "default_common", "SparseCSC", "Triplet", "eye", "spzeros",
    "SparseError", "Status", "__version__",
]
