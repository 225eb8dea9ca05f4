"""Per-package TPU benchmarks beyond supernodal Cholesky (VERDICT r4
item 5): KLU device refactor+solve, UMFPACK-class refactor, SPQR
least-squares, GraphBLAS mxm/pagerank — each with reference-protocol
units (KLU/Source/klu_diagnostics.c flop counts, umfpack.h Info-style
time/flops, SuiteSparseQR least-squares, GraphBLAS demo rates).

Run standalone (`python bench_extra.py`) or via bench.py, which merges
the rows into BENCH_DETAIL artifacts.  Prints one RESULT: JSON line.
Every phase is shielded: a failing package reports null, not a crash.
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def readback(x):
    import jax
    return float(np.real(np.asarray(jax.device_get(x)).ravel()[0]))


def timed(fn, repeats=5):
    out = fn()
    readback(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn()
    readback(out)
    return (time.perf_counter() - t0) / repeats


def bench_klu(repeats=10):
    """KLU: the jitted device refactor twin + BTF level-set solve on a
    circuit-class matrix (the klu_refactor.c:7-18 hot path: same pattern,
    new values, no pivoting).  Rate per klu_diagnostics.c flop count."""
    from suitesparse_tpu.io import collection
    from suitesparse_tpu.lu.klu import klu_analyze, klu_factor
    from suitesparse_tpu.lu.klu_device import klu_device

    name = os.environ.get("BENCH_KLU_MATRIX", "circuit_20000")
    A = collection.get(name)
    n = A.ncol
    sym = klu_analyze(A)
    t0 = time.perf_counter()
    num = klu_factor(A, sym)
    t_first = time.perf_counter() - t0
    plan, refactor, solve = klu_device(A, sym, num)
    avals = __import__("jax.numpy", fromlist=["asarray"]).asarray(
        A.data.astype(np.float32))
    t_re = timed(lambda: refactor(avals)[0][-1], repeats)
    factors, Rs, ok = refactor(avals)
    b = __import__("jax.numpy", fromlist=["asarray"]).asarray(
        np.ones(n, dtype=np.float32))
    t_sv = timed(lambda: solve(factors, Rs, avals, b), repeats)
    x = np.asarray(solve(factors, Rs, avals, b), dtype=np.float64)
    S = A.to_scipy().astype(np.float64)
    res = np.abs(S @ x - 1.0).max() / (np.abs(S).sum(axis=1).max()
                                       * np.abs(x).max() + 1.0)
    log(f"[klu:{name}] n={n} nnz={A.nnz} fl={num.flops:.3g} "
        f"host-first {t_first*1e3:.1f} ms; device refactor "
        f"{t_re*1e3:.3f} ms ({num.flops/t_re/1e6:.1f} Mflop/s), solve "
        f"{t_sv*1e3:.3f} ms, residual {res:.2e}")
    return {
        "metric": f"klu_device_refactor_ms[{name}]",
        "value": round(t_re * 1e3, 3), "unit": "ms",
        "n": n, "nnz": int(A.nnz), "flops": num.flops,
        "refactor_mflops": round(num.flops / t_re / 1e6, 1),
        "solve_ms": round(t_sv * 1e3, 3), "residual": float(res),
    }


def bench_umfpack(repeats=5):
    """UMFPACK-class: multifrontal LU numeric-refactor on an unsymmetric
    pattern (umfpack_numeric with reused Symbolic — the Info[NUMERIC_TIME]
    protocol, umfpack.h Info region)."""
    from suitesparse_tpu.io import collection
    from suitesparse_tpu.lu.multifrontal import (umf_symbolic, umf_numeric,
                                                 umf_solve)

    name = os.environ.get("BENCH_UMF_MATRIX", "randunsym_20000")
    A = collection.get(name)
    n = A.ncol
    t0 = time.perf_counter()
    S = umf_symbolic(A)
    t_sym = time.perf_counter() - t0
    t0 = time.perf_counter()
    num = umf_numeric(A, S)          # compile + first numeric
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(repeats):
        num = umf_numeric(A, S)      # the refactor path: pattern fixed
    t_num = (time.perf_counter() - t0) / repeats
    x = umf_solve(num, np.ones(n))
    Sf = A.to_scipy().astype(np.float64)
    res = np.abs(Sf @ x - 1.0).max() / (np.abs(Sf).sum(axis=1).max()
                                        * np.abs(x).max() + 1.0)
    lnz = int(np.asarray(num.Lb).size + np.asarray(num.Ub).size)
    log(f"[umfpack:{name}] n={n} nnz={A.nnz} symbolic {t_sym:.2f}s "
        f"first-numeric {t_first:.1f}s refactor {t_num*1e3:.1f} ms "
        f"residual {res:.2e}")
    return {
        "metric": f"umfpack_refactor_ms[{name}]",
        "value": round(t_num * 1e3, 2), "unit": "ms",
        "n": n, "nnz": int(A.nnz), "panel_entries": lnz,
        "symbolic_s": round(t_sym, 3), "residual": float(res),
    }


def bench_spqr(repeats=5):
    """SPQR: rank-revealing multifrontal QR + least-squares solve on a
    genuine reference rectangular fixture (SuiteSparseQR backslash
    protocol, qrdemo.cpp)."""
    from suitesparse_tpu.io import collection
    from suitesparse_tpu.qr.spqr import qr_symbolic, qr_factorize, qr_solve

    name = os.environ.get("BENCH_SPQR_MATRIX", "Franz6_id1959_aug")
    try:
        A = collection.get(name)
    except FileNotFoundError:
        name = "randunsym_5000"
        A = collection.get(name)
    m, n = A.nrow, A.ncol
    S = qr_symbolic(A)
    t0 = time.perf_counter()
    num = qr_factorize(A, S)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(repeats):
        num = qr_factorize(A, S)
    t_fac = (time.perf_counter() - t0) / repeats
    b = np.ones(m)
    x = qr_solve(A, b)
    r = A.to_scipy().astype(np.float64) @ x - b
    # least-squares optimality: A'r ~ 0
    atr = np.abs(A.to_scipy().T.astype(np.float64) @ r).max()
    log(f"[spqr:{name}] {m}x{n} nnz={A.nnz} rank={num.rank} "
        f"first {t_first:.1f}s factor {t_fac*1e3:.1f} ms ||A'r|| {atr:.2e}")
    return {
        "metric": f"spqr_factorize_ms[{name}]",
        "value": round(t_fac * 1e3, 2), "unit": "ms",
        "m": m, "n": n, "nnz": int(A.nnz), "rank": int(num.rank),
        "lsq_optimality": float(atr),
    }


def bench_graphblas(repeats=10):
    """GraphBLAS: device SpGEMM (mxm plus_times, GB_AxB_saxpy3 class) and
    the one-program pagerank loop (dpagerank.c demo)."""
    from suitesparse_tpu.io import collection
    from suitesparse_tpu.graphblas.core import mxm
    from suitesparse_tpu.graphblas.algorithms import pagerank
    from suitesparse_tpu.ops.spgemm import cached_plan, spgemm_apply

    name = os.environ.get("BENCH_GB_MATRIX", "lap3d_40")
    A = collection.get(name)
    if A.stype != 0:
        A = A.to_full_storage()
    n = A.ncol
    plan = cached_plan(A, A)
    av = A.data if A.data is not None else np.ones(A.nnz)
    t_mxm = timed(lambda: spgemm_apply(plan, av, av, "plus_times"), repeats)
    mxm_rate = 2.0 * plan.flops / t_mxm / 1e6
    # pagerank on a genuine power-network fixture when available
    gname = os.environ.get("BENCH_PR_MATRIX", "bcspwr10")
    try:
        G = collection.get(gname)
    except FileNotFoundError:
        gname, G = name, A
    if G.stype != 0:
        G = G.to_full_storage()
    t0 = time.perf_counter()
    r = pagerank(G, max_iter=50, tol=0.0)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(max(repeats // 2, 1)):
        r = pagerank(G, max_iter=50, tol=0.0)
    t_pr = (time.perf_counter() - t0) / max(repeats // 2, 1)
    edges_per_s = 50.0 * G.nnz / t_pr
    log(f"[graphblas] mxm[{name}] n={n} flops={plan.flops:.3g} "
        f"{t_mxm*1e3:.2f} ms ({mxm_rate:.0f} Mflop/s); pagerank[{gname}] "
        f"n={G.ncol} 50 iters {t_pr*1e3:.1f} ms "
        f"({edges_per_s/1e6:.1f} Medge/s)")
    return {
        "metric": f"graphblas_mxm_mflops[{name}]",
        "value": round(mxm_rate, 1), "unit": "Mflop/s",
        "mxm_ms": round(t_mxm * 1e3, 3), "mxm_flops": int(plan.flops),
        "pagerank_matrix": gname, "pagerank_ms_50it": round(t_pr * 1e3, 2),
        "pagerank_medges_per_s": round(edges_per_s / 1e6, 2),
    }


BENCHES = {
    "klu": bench_klu,
    "umfpack": bench_umfpack,
    "spqr": bench_spqr,
    "graphblas": bench_graphblas,
}


def run_all(which=None):
    rows = []
    for key, fn in BENCHES.items():
        if which and key not in which:
            continue
        try:
            rows.append(fn())
        except Exception as e:  # noqa: BLE001 - shielded per package
            import traceback
            log(f"[{key}] FAILED: {type(e).__name__}: {e}")
            log(traceback.format_exc()[-1500:])
            rows.append({"metric": f"{key}_FAILED", "value": None,
                         "error": f"{type(e).__name__}: {e}"})
    return rows


def run_isolated(which=None, retries=1):
    """Each package in its OWN subprocess (+retry): the flaky TPU-worker
    fault (NOTES_ROUND5.md §7) kills the jax client for the whole
    process, so one crash must not void the other packages' rows."""
    import subprocess
    rows = []
    for key in BENCHES:
        if which and key not in which:
            continue
        row = None
        for attempt in range(retries + 1):
            try:
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--inproc", key],
                    stdout=subprocess.PIPE, stderr=sys.stderr,
                    timeout=2400, env=dict(os.environ))
                for line in p.stdout.decode().splitlines():
                    if line.startswith("RESULT:"):
                        got = json.loads(line[len("RESULT:"):])
                        if got and got[0].get("value") is not None:
                            row = got[0]
                if row:
                    break
                log(f"[{key}] attempt {attempt} no row (rc={p.returncode})")
            except Exception as e:  # noqa: BLE001
                log(f"[{key}] attempt {attempt} FAILED: {e}")
        rows.append(row or {"metric": f"{key}_FAILED", "value": None})
    return rows


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    args = sys.argv[1:]
    if args and args[0] == "--inproc":
        rows = run_all(args[1:] or None)
    else:
        rows = run_isolated(args or None)
    print("RESULT:" + json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
