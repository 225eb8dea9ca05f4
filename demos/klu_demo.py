"""KLU demo analog (KLU/Demo/kludemo.c + committed kludemo.out protocol):
BTF stats, factor/refactor/solve residuals, diagnostics per matrix."""
import sys

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from suitesparse_tpu.core.sparse import SparseCSC
    from suitesparse_tpu.io.fixtures import load
    from suitesparse_tpu.lu import (klu_analyze, klu_condest, klu_factor,
                                    klu_rcond, klu_refactor, klu_rgrowth,
                                    klu_solve)

    # genuine matrices from the reference's own KLU/Matrix demo set
    for name, A in [("impcol_a", load("impcol_a")),
                    ("west0067", load("west0067"))]:
        n = A.ncol
        sym = klu_analyze(A)
        print(f"{name}: n {n} nnz {A.nnz} nblocks {sym.nblocks} "
              f"nmatch {sym.nmatch}")
        num = klu_factor(A, sym)
        b = np.ones(n)
        x = klu_solve(num, b)
        r = np.abs(A.to_scipy() @ x - b).max()
        print(f"  factor ok {num.ok}; |Ax-b|inf {r:.1e}")
        A2 = SparseCSC(A.indptr, A.indices, A.data * 2.0, A.shape)
        num = klu_refactor(A2, sym, num)
        x = klu_solve(num, b)
        r = np.abs(A2.to_scipy() @ x - b).max()
        print(f"  refactor(2A): |Ax-b|inf {r:.1e}")
        print(f"  rcond {klu_rcond(num):.3e} rgrowth "
              f"{klu_rgrowth(A2, num):.3e}")


if __name__ == "__main__":
    main(*sys.argv[1:])
