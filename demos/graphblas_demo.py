"""GraphBLAS demo analog (GraphBLAS/Demo: pagerank/BFS/triangle counting
over semirings)."""
import sys

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from suitesparse_tpu.graphblas import (bfs_levels, pagerank,
                                           triangle_count, mxm, semiring)
    from suitesparse_tpu.io.fixtures import load

    A = load("bcspwr10")        # genuine fixture: US power network graph
    from suitesparse_tpu.core.sparse import SparseCSC
    S = A.to_full_storage().to_scipy()
    S.setdiag(0)
    S.eliminate_zeros()
    S = abs(S.tocsc())
    G = SparseCSC.from_scipy((S > 0).astype(float).tocsc())
    n = G.ncol
    pr = pagerank(G)
    print(f"graphblas_demo: n {n} nnz {G.nnz}")
    print(f"pagerank sum {np.sum(pr):.6f} max {np.max(pr):.6f}")
    lv = bfs_levels(G, 0)
    print(f"bfs levels from 0: max {int(lv.max())} "
          f"reached {int((lv >= 0).sum())}")
    t = triangle_count(G)
    print(f"triangles {t}")
    C = mxm(G, G, semiring("plus_times"))
    print(f"G*G nnz {C.nnz}")


if __name__ == "__main__":
    main(*sys.argv[1:])
