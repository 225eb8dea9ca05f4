from .core import (GrBMatrix, Monoid, Semiring, semiring, mxv, vxm, mxm,
                   ewise_add, ewise_mult, apply, select, reduce_rows,
                   reduce_scalar, transpose, kron, build, extract_tuples,
                   extract, assign, MONOIDS, BINOPS, UNARYOPS)
from .algorithms import pagerank, bfs_levels, triangle_count
