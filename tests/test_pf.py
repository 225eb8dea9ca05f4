"""Pass-forward (multifrontal MXU extend-add) program: cholesky/pf.py.

Parity model: the pf program must reproduce the unrolled sorted-segment
program bit-tight in f64 (same panels, different extend-add association),
across all three pf modes (project / scatter / auto-mixed)."""
import numpy as np
import pytest

import jax.numpy as jnp

from suitesparse_tpu.cholesky import analyze, super_symbolic, residual_norm
from suitesparse_tpu.cholesky.super_numeric import (
    build_plan, factorize_super, solve_super, _assemble_values,
    _numeric_program, _a_sorted_maps, SuperFactor)
from suitesparse_tpu.cholesky.pf import build_pf_plan, pf_numeric
from suitesparse_tpu.core.common import default_common
from suitesparse_tpu.io.generators import laplacian_2d, laplacian_3d
from suitesparse_tpu.io.fixtures import load as load_fixture


def _setup(A):
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    vals = _assemble_values(A, sym, ss, np.float64)
    a_src, a_dst = _a_sorted_maps(ss)
    ref = _numeric_program(jnp.asarray(vals), jnp.asarray(a_src),
                           jnp.asarray(a_dst),
                           plan.arrays_segsum(np.float64), plan.meta,
                           plan.total, True, False)
    return sym, ss, plan, vals, np.asarray(ref)


@pytest.mark.parametrize("gen,arg", [(laplacian_2d, 20), (laplacian_3d, 8),
                                     (laplacian_3d, 12)])
@pytest.mark.parametrize("mode", ["project", "scatter", "auto"])
def test_pf_matches_unrolled(gen, arg, mode):
    A = gen(arg)
    sym, ss, plan, vals, ref = _setup(A)
    cm = default_common()
    cm.cholesky.pf_mode = mode
    pfp = build_pf_plan(plan, cm)
    Fx = np.asarray(pf_numeric(vals, pfp, np.float64))
    err = np.abs(Fx[:plan.total] - ref[:plan.total]).max()
    scale = max(np.abs(ref[:plan.total]).max(), 1.0)
    assert err / scale < 1e-13, (mode, err)


def test_pf_real_fixture():
    """End-to-end on a genuine reference matrix (bcsstk16 panel parity +
    solve residual through the pf program)."""
    A = load_fixture("bcsstk16")
    sym, ss, plan, vals, ref = _setup(A)
    pfp = build_pf_plan(plan, default_common())
    Fx = np.asarray(pf_numeric(vals, pfp, np.float64))
    err = np.abs(Fx[:plan.total] - ref[:plan.total]).max()
    scale = np.abs(ref[:plan.total]).max()
    assert err / scale < 1e-12


def test_pf_end_to_end_solve():
    A = laplacian_3d(10)
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    cm.cholesky.program = "pf"
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    f = factorize_super(A, sym, ss, common=cm)
    assert f.ok
    b = np.random.default_rng(0).standard_normal(A.ncol)
    x = solve_super(f, b, "A", cm)
    assert residual_norm(A, x, b) < 1e-12


def test_pf_is_auto_default_for_large_patterns():
    A = laplacian_3d(12)
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    if plan.nbuckets > cm.cholesky.wave_threshold:
        assert plan.resolve_program(cm) == "pf"
    cm.cholesky.program = "pf"
    assert plan.resolve_program(cm) == "pf"


def test_pf_refactorization_reuses_plan():
    """Values change, pattern fixed: the same PFPlan must produce the new
    factor (the refactor path bench.py measures)."""
    A = laplacian_3d(8)
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    pfp = build_pf_plan(plan, cm)
    vals = _assemble_values(A, sym, ss, np.float64)
    F1 = np.asarray(pf_numeric(vals, pfp, np.float64))
    F2 = np.asarray(pf_numeric(vals * 4.0, pfp, np.float64))
    assert np.allclose(F2[:plan.total], 2.0 * F1[:plan.total], atol=1e-12)


@pytest.mark.parametrize("group,merge", [("chunk", 0.0), ("pair", 0.0),
                                         ("chunk", 0.35)])
def test_pf_nondefault_group_and_merge(group, merge):
    """The retained A/B paths (pf_group='chunk', bucket_merge=0 layout)
    must keep bit-tight parity with the unrolled program — defaults moved
    to pair/0.35 in round 3 and these paths would otherwise go untested
    (ADVICE r3)."""
    A = laplacian_3d(10)
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    cm.cholesky.bucket_merge = merge
    cm.cholesky.pf_group = group
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    vals = _assemble_values(A, sym, ss, np.float64)
    a_src, a_dst = _a_sorted_maps(ss)
    ref = _numeric_program(jnp.asarray(vals), jnp.asarray(a_src),
                           jnp.asarray(a_dst),
                           plan.arrays_segsum(np.float64), plan.meta,
                           plan.total, True, False)
    pfp = build_pf_plan(plan, cm)
    Fx = np.asarray(pf_numeric(vals, pfp, np.float64))
    ref = np.asarray(ref)
    err = np.abs(Fx[:plan.total] - ref[:plan.total]).max()
    scale = max(np.abs(ref[:plan.total]).max(), 1.0)
    assert err / scale < 1e-13, (group, merge, err)
    # solve parity through the factor
    f = SuperFactor(plan=plan, Lx=jnp.asarray(Fx), perm=sym.perm,
                    minor=plan.n, dtype=np.float64)
    b = np.arange(plan.n, dtype=np.float64) % 7 + 1
    x = solve_super(f, b, "A", cm)
    assert residual_norm(A, x, b) < 1e-12


def test_pf_trsm_inverse_toggle(monkeypatch):
    """SSTPU_TRSM_INV=0 must fall back to triangular_solve and still give
    a bit-tight factor (ADVICE r3: accuracy escape hatch)."""
    A = laplacian_3d(8)
    sym, ss, plan, vals, ref = _setup(A)
    pfp = build_pf_plan(plan, default_common())
    monkeypatch.setenv("SSTPU_TRSM_INV", "0")
    Fx = np.asarray(pf_numeric(vals, pfp, np.float64))
    err = np.abs(Fx[:plan.total] - ref[:plan.total]).max()
    scale = max(np.abs(ref[:plan.total]).max(), 1.0)
    assert err / scale < 1e-13
