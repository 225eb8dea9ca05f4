"""Pallas panel-factor kernel (cholesky/pallas_kernels.py): bit-accurate
parity with the XLA POTRF+TRSM pair, in interpret mode on the CPU mesh.

The full pf program runs the XLA path by default on CPU (interpret-mode
Pallas for every factor class is too heavy for the suite); these tests
cover the kernel itself plus one end-to-end pf factorization with
SSTPU_POTRF=pallas forced.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from suitesparse_tpu.cholesky.pallas_kernels import panel_factor


def _mk_panel(rng, W, Np, Mb, nreal, mreal, dtype=np.float64):
    Mp = Np + Mb
    P = np.zeros((W, Mp, Np), dtype)
    pe = np.zeros((W, Np), dtype)
    rm = np.zeros((W, Mp), dtype)
    cm = np.zeros((W, Np), dtype)
    for w in range(W):
        M = rng.standard_normal((nreal, nreal))
        S = M @ M.T + nreal * np.eye(nreal)
        # junk above the diagonal (projection-scatter artifacts)
        P[w, :nreal, :nreal] = (np.tril(S)
                                + np.triu(rng.standard_normal(
                                    (nreal, nreal)), 1) * 100)
        if mreal:
            P[w, Np:Np + mreal, :nreal] = rng.standard_normal((mreal, nreal))
        pe[w, nreal:] = 1.0
        rm[w, :nreal] = 1.0
        rm[w, Np:Np + mreal] = 1.0
        cm[w, :nreal] = 1.0
    return P, pe, rm, cm


@pytest.mark.parametrize("W,Np,Mb,nreal,mreal", [
    (4, 8, 0, 7, 0),
    (4, 8, 32, 8, 29),
    (2, 32, 8, 30, 8),
    (2, 32, 128, 27, 125),
    (1, 128, 128, 126, 120),
    # Np > 128: the blocked-slab loop (two 128-panels of the shared
    # kernel + inverse-einsum TRSM + per-slab SYRK) — the path every
    # Np <= SSTPU_POTRF_MAXNP (default 8192) class takes on TPU
    # (round-4 advisor finding: it was unreachable at old defaults)
    (1, 256, 32, 250, 30),
])
def test_panel_factor_matches_lapack(W, Np, Mb, nreal, mreal):
    rng = np.random.default_rng(Np * 1000 + Mb)
    P, pe, rm, cm = _mk_panel(rng, W, Np, Mb, nreal, mreal)
    out = np.asarray(panel_factor(*map(jnp.asarray, (P, pe, rm, cm))))
    for w in range(W):
        S = np.tril(P[w, :nreal, :nreal])
        S = S + np.tril(S, -1).T
        C = np.linalg.cholesky(S)
        assert np.abs(out[w, :nreal, :nreal] - C).max() < 1e-10
        if mreal:
            Bm = np.linalg.solve(C, P[w, Np:Np + mreal, :nreal].T).T
            assert np.abs(out[w, Np:Np + mreal, :nreal] - Bm).max() < 1e-9
        # padding and upper triangle exactly zero
        z = out[w].copy()
        z[:nreal, :nreal] = np.tril(z[:nreal, :nreal])
        assert np.abs(np.triu(out[w, :Np, :], 1)).max() == 0.0
        z[:nreal, :nreal] = 0
        z[Np:Np + mreal, :nreal] = 0
        assert np.abs(z).max() == 0.0


def test_panel_factor_nan_on_indefinite():
    """NOT_POSDEF detection contract: a negative pivot must surface as
    NaN in the output (factorize_super scans for NaN)."""
    rng = np.random.default_rng(0)
    P, pe, rm, cm = _mk_panel(rng, 1, 8, 0, 6, 0)
    P[0, 3, 3] = -5.0
    out = np.asarray(panel_factor(*map(jnp.asarray, (P, pe, rm, cm))))
    assert np.isnan(out[0, :6, :6]).any()


def test_pf_program_with_pallas_matches_unrolled(monkeypatch):
    """End-to-end pf factorization with the Pallas kernel forced on
    (interpret mode): bit-tight parity vs the unrolled XLA program."""
    monkeypatch.setenv("SSTPU_POTRF", "pallas")
    from suitesparse_tpu.cholesky import analyze, super_symbolic
    from suitesparse_tpu.cholesky.super_numeric import (
        build_plan, _assemble_values, _numeric_program, _a_sorted_maps)
    from suitesparse_tpu.cholesky.pf import build_pf_plan, pf_numeric
    from suitesparse_tpu.core.common import default_common
    from suitesparse_tpu.io.generators import laplacian_3d

    A = laplacian_3d(8)
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    vals = _assemble_values(A, sym, ss, np.float64)
    a_src, a_dst = _a_sorted_maps(ss)
    ref = np.asarray(_numeric_program(
        jnp.asarray(vals), jnp.asarray(a_src), jnp.asarray(a_dst),
        plan.arrays_segsum(np.float64), plan.meta, plan.total, True, False))
    pfp = build_pf_plan(plan, cm)
    Fx = np.asarray(pf_numeric(vals, pfp, np.float64))
    err = np.abs(Fx[:plan.total] - ref[:plan.total]).max()
    scale = max(np.abs(ref[:plan.total]).max(), 1.0)
    assert err / scale < 1e-13
