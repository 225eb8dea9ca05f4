"""Wave (scan/switch) numeric + solve programs vs the unrolled reference.

The wave program (cholesky/wave.py) must compute the SAME factor as the
unrolled per-bucket program — identical schedule, identical arithmetic per
panel — so the comparison bar is bit-level-tight f32 roundoff, plus the
standard residual protocol (cholmod_demo.c:453-503)."""
import numpy as np
import pytest

from suitesparse_tpu.cholesky import (analyze, residual_norm, super_symbolic)
from suitesparse_tpu.cholesky.super_numeric import (build_plan,
                                                    factorize_super,
                                                    solve_super)
from suitesparse_tpu.core.common import default_common
from suitesparse_tpu.io.generators import laplacian_2d, laplacian_3d, random_spd


def _factor(A, mode, nrelax=None, zrelax=None):
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    cm.cholesky.program = mode
    if nrelax:
        cm.cholesky.nrelax = nrelax
        cm.cholesky.zrelax = zrelax
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    f = factorize_super(A, sym, ss, plan, cm)
    return f, cm


@pytest.mark.parametrize("gen", [
    lambda: laplacian_2d(17),
    lambda: laplacian_3d(9),
    lambda: random_spd(300, density=0.02, seed=1),
])
def test_wave_matches_unrolled(gen):
    A = gen()
    fu, _ = _factor(A, "unrolled")
    fw, _ = _factor(A, "wave")
    t = min(np.asarray(fu.Lx).shape[0], np.asarray(fw.Lx).shape[0])
    lu = np.asarray(fu.Lx)[:t]
    lw = np.asarray(fw.Lx)[:t]
    scale = max(1.0, np.abs(lu).max())
    assert np.abs(lu - lw).max() / scale < 1e-5


@pytest.mark.parametrize("nrhs", [1, 3])
def test_wave_solve(nrhs):
    A = laplacian_3d(8)
    n = A.ncol
    f, cm = _factor(A, "wave")
    rng = np.random.default_rng(0)
    b = rng.standard_normal((n, nrhs)) if nrhs > 1 else rng.standard_normal(n)
    x = solve_super(f, b, "A", cm)
    assert residual_norm(A, x.astype(np.float64), b) < 1e-4


def test_wave_reference_default_amalgamation():
    """The config that exploded compile time in round 1 (NOTES_ROUND1.md):
    reference-CPU nrelax/zrelax.  The wave program compiles O(#classes)."""
    A = laplacian_3d(10)
    f, cm = _factor(A, "wave", nrelax=(4, 16, 48), zrelax=(0.8, 0.1, 0.05))
    wp = f.plan.wave_plan()
    # program size is the class count, not the bucket count
    # program size is bounded by the class count (<= bucket count; bucket
    # merging can make them equal by collapsing same-shape buckets)
    assert len(wp.classes) <= f.plan.nbuckets
    n = A.ncol
    b = np.ones(n)
    x = solve_super(f, b, "A", cm)
    assert residual_norm(A, x.astype(np.float64), b) < 1e-4


def test_wave_solve_systems_match_unrolled():
    A = laplacian_3d(7)
    n = A.ncol
    fu, cmu = _factor(A, "unrolled")
    fw, cmw = _factor(A, "wave")
    b = np.arange(1.0, n + 1.0) / n
    for system in ("A", "LLt", "L", "Lt"):
        xu = solve_super(fu, b, system, cmu)
        xw = solve_super(fw, b, system, cmw)
        assert np.allclose(xu, xw, rtol=1e-4, atol=1e-5), system


def test_wave_not_posdef_detection():
    A = laplacian_3d(6)
    S = A.to_scipy().tolil()
    S[100, 100] = -50.0  # break positive definiteness
    import scipy.sparse as sp
    from suitesparse_tpu.core.sparse import SparseCSC, SYM_UPPER
    U = sp.triu(S.tocsc()).tocsc()
    A2 = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    cm.cholesky.program = "wave"
    sym = analyze(A2, cm)
    ss = super_symbolic(A2, sym, cm)
    f = factorize_super(A2, sym, ss, None, cm)
    assert not f.ok
    assert f.minor < A2.ncol
