"""CHOLMOD demo analog (CHOLMOD/Demo/cholmod_demo.c protocol): analyze /
factorize / solve one SPD matrix; print ordering quality (fl/lnz, lnz/anz,
cholmod_demo.c:568-573), factor and solve rates, and the componentwise
residual ||Ax-b||inf / (||A||1 ||x||inf + ||b||inf) for several solve
systems (:453-503,598-611).  Output is diffed against
demos/expected/cholmod_demo.out by tests/test_demos.py — the reference's
Demo-as-integration-test tier (SURVEY.md §4.1)."""
import sys

import numpy as np


def main(name="bcsstk01"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from suitesparse_tpu.cholesky import (analyze, factorize_simplicial,
                                          residual_norm, solve)
    from suitesparse_tpu.core.common import default_common
    from suitesparse_tpu.io.fixtures import load

    A = load(name)              # genuine reference fixture (HB collection)
    n = A.ncol
    cm = default_common()
    sym = analyze(A, cm)
    anz = A.nnz
    print(f"cholmod_demo: n {n} nnz(A) {anz}")
    print(f"ordering: lnz {sym.lnz} fl {sym.flops:.4e}")
    print(f"ordering quality: fl/lnz {sym.flops / sym.lnz:.2f} "
          f"lnz/anz {sym.lnz / anz:.2f}")
    f = factorize_simplicial(A, sym, cm)
    print(f"factor ok: {f.ok} minor {f.minor}")
    b = np.arange(1, n + 1, dtype=float) / n
    for system in ["A", "LDLt", "L", "Lt", "D", "P", "Pt"]:
        x = solve(f, b, system)
        if system == "A":
            print(f"solve {system}: residual {residual_norm(A, x, b):.1e}")
        else:
            print(f"solve {system}: |x|inf {np.abs(x).max():.6e}")
    ld = f.logdet()
    print(f"logdet {ld:.6e}")


if __name__ == "__main__":
    main(*sys.argv[1:])
