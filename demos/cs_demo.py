"""CSparse demo analog (CSparse/Demo/cs_demo2.c + cs_demo.out protocol):
dmperm stats + one-call drivers cs_lusol / cs_cholsol / cs_qrsol with the
reference's residual formula (cs_demo.c:52-60)."""
import sys

import numpy as np


def _resid(A, x, b):
    S = A.to_scipy()
    num = np.abs(S @ x - b).max()
    den = np.abs(S).sum(axis=1).max() * np.abs(x).max() + np.abs(b).max()
    return float(num / den)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from suitesparse_tpu.io.fixtures import load
    from suitesparse_tpu.models import csparse as cs

    A = load("west0067")        # genuine fixture (CSparse demo family)
    n = A.ncol
    d = cs.cs_dmperm(A)
    print(f"cs_demo: n {n} nnz {A.nnz} blocks {len(d.r) - 1} "
          f"structural_rank {d.structural_rank}")
    b = np.arange(1, n + 1, dtype=float) / n
    x = cs.cs_lusol(A, b, order=2)
    print(f"lusol   resid {_resid(A, x, b):.1e}")
    x = cs.cs_qrsol(A, b, order=3)
    print(f"qrsol   resid {_resid(A, x, b):.1e}")
    S = load("bcsstk01")
    bs = np.ones(S.ncol)
    xs = cs.cs_cholsol(S, bs, order=1)
    print(f"cholsol resid {_resid(S, xs, bs):.1e}")


if __name__ == "__main__":
    main(*sys.argv[1:])
