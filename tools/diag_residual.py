"""Diagnose the 1e-6 residual plateau (VERDICT r4 item 4).

Measures residual vs refinement steps (0..N) on CPU for a lap3d matrix,
A/B over the explicit-inverse TRSM (SSTPU_TRSM_INV) and the program form.
Run:  python tools/diag_residual.py [name] [steps]
Env:  SSTPU_TRSM_INV=0/1, SSTPU_POTRF=xla/pallas
"""
import os
import sys

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "lap3d_20"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from suitesparse_tpu.cholesky import (analyze, super_symbolic,
                                          residual_norm)
    from suitesparse_tpu.cholesky.super_numeric import (
        _assemble_values, build_plan, SuperFactor, solve_super)
    from suitesparse_tpu.cholesky.pf import pf_numeric
    from suitesparse_tpu.core.common import default_common
    from suitesparse_tpu.io import collection
    from suitesparse_tpu.io.generators import symmetrize_upper

    dtype = np.float32
    A = collection.get(name)
    if A.stype == 0:
        A = symmetrize_upper(A)
    n = A.ncol
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    cm.cholesky.program = "pf"
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    pfp = plan.pf_plan(cm)
    vals = _assemble_values(A, sym, ss, dtype)
    Lx = pf_numeric(vals, pfp, dtype)
    f = SuperFactor(plan=plan, Lx=Lx, perm=sym.perm, minor=n, dtype=dtype)
    b = np.ones(n)
    Sf = A.to_scipy().astype(np.float64)
    x = solve_super(f, b, "A", cm).astype(np.float64)
    print(f"[{name}] n={n} TRSM_INV={os.environ.get('SSTPU_TRSM_INV','1')}"
          f" POTRF={os.environ.get('SSTPU_POTRF','default')}")
    print(f"  step 0: residual {residual_norm(A, x, b):.3e}")
    for k in range(1, nsteps + 1):
        r = b - Sf @ x
        d = np.asarray(solve_super(f, r, "A", cm), dtype=np.float64)
        x = x + d
        print(f"  step {k}: residual {residual_norm(A, x, b):.3e}  "
              f"||r||={np.abs(r).max():.3e} ||d||={np.abs(d).max():.3e}")


if __name__ == "__main__":
    main()
