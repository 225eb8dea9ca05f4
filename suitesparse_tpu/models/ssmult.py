"""ssmult / sfmult: sparse matrix multiply compat layer.

MATLAB_Tools/{SSMULT,SFMULT} parity: `ssmult(A, B)` multiplies two sparse
matrices, `sfmult(A, X)` multiplies sparse times dense (all transpose
variants).  The reference ships hand-optimized C mex kernels; here the
optimized engines ARE the framework's device paths — ssmult delegates to
the Gustavson SpGEMM program (ops/spgemm.py) and sfmult to the CSR
segment SpMM program (ops/spmv.py), so these names are the compat surface
over the same TPU kernels the GraphBLAS layer uses.
"""
from __future__ import annotations

import numpy as np

from ..core.sparse import SparseCSC

__all__ = ["ssmult", "sfmult"]


def ssmult(A: SparseCSC, B: SparseCSC, at: bool = False,
           bt: bool = False) -> SparseCSC:
    """C = op(A) * op(B) over sparse operands (ssmult.m surface)."""
    from ..ops.spgemm import spgemm
    Ac = A.transpose(values=True) if at else A
    Bc = B.transpose(values=True) if bt else B
    return spgemm(Ac, Bc)


def sfmult(A: SparseCSC, X: np.ndarray, at: bool = False) -> np.ndarray:
    """Y = op(A) * X with dense X (sfmult.m surface, device SpMM)."""
    from ..ops.spmv import spmv_program
    Ac = A.transpose(values=True) if at else A
    X = np.asarray(X)
    one_d = X.ndim == 1
    Xk = X.reshape(A.shape[1] if not at else A.shape[0], -1)
    run = spmv_program(Ac)
    cols = []
    for j in range(Xk.shape[1]):
        cols.append(np.asarray(run(Ac.data, Xk[:, j])))
    Y = np.stack(cols, axis=1)
    return Y[:, 0] if one_d else Y
