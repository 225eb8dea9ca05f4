"""UMFPACK demo analog (UMFPACK/Demo/umfpack_*_demo.c protocol): symbolic /
numeric / solve with Info stats and determinant."""
import sys

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from suitesparse_tpu.core.common import default_common
    from suitesparse_tpu.io.fixtures import load
    from suitesparse_tpu.lu import (umf_determinant, umf_lunz, umf_numeric,
                                    umf_solve, umf_symbolic)

    A = load("west0067")        # genuine fixture (UMFPACK west-family demo)
    n = A.ncol
    cm = default_common()
    sym = umf_symbolic(A, cm)
    print(f"umfpack_demo: n {n} nnz {A.nnz} strategy {sym.strategy}")
    num = umf_numeric(A, sym, cm)
    lnz, unz = umf_lunz(num)[:2]
    print(f"numeric ok {num.ok}; lnz {lnz} unz {unz}")
    b = np.arange(1, n + 1, dtype=float) / n
    x = umf_solve(num, b, "A", common=cm)
    r = np.abs(A.to_scipy() @ x - b).max()
    print(f"solve A: |Ax-b|inf {r:.1e} "
          f"iters {cm.info.get('umf_ir_taken', 0)}")
    xt = umf_solve(num, b, "At", common=cm)
    rt = np.abs(A.to_scipy().T @ xt - b).max()
    print(f"solve At: |A'x-b|inf {rt:.1e}")
    mant, expo = umf_determinant(num)
    print(f"determinant {mant:.6f} * 10^{expo:.0f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
