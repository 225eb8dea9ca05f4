"""End-to-end precision A/B on the real pf factor program (TPU).

For each SSTPU_MM_PRECISION setting, runs the unroll-form factor in a
fresh subprocess (precision is a process-global config): reports compile
time, steady refactor ms, and the refined residual.
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import os, time, json
import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
from suitesparse_tpu.io import collection
from suitesparse_tpu.io.generators import symmetrize_upper
from suitesparse_tpu.cholesky import analyze, super_symbolic, residual_norm
from suitesparse_tpu.cholesky.super_numeric import (build_plan,
    _assemble_values, SuperFactor, solve_super)
from suitesparse_tpu.cholesky.pf import pf_numeric
from suitesparse_tpu.core.common import default_common

name = os.environ["PREC_MATRIX"]
A = collection.get(name)
if A.stype == 0:
    A = symmetrize_upper(A)
n = A.ncol
cm = default_common(); cm.cholesky.supernodal = "supernodal"
cm.cholesky.program = "pf"
sym = analyze(A, cm); ss = super_symbolic(A, sym, cm)
plan = build_plan(ss); pfp = plan.pf_plan(cm)
vals = _assemble_values(A, sym, ss, np.float32)
vd = jnp.asarray(vals, dtype=jnp.float32)
t0 = time.perf_counter()
out = pf_numeric(vd, pfp, np.float32)
float(jax.device_get(out.ravel()[0]))
tc = time.perf_counter() - t0
reps = 5
t0 = time.perf_counter()
for _ in range(reps):
    out = pf_numeric(vd, pfp, np.float32)
float(jax.device_get(out.ravel()[0]))
dt = (time.perf_counter() - t0) / reps
f = SuperFactor(plan=plan, Lx=out, perm=sym.perm, minor=n, dtype=np.float32)
b = np.ones(n)
Sf = A.to_scipy().astype(np.float64)
x = solve_super(f, b, "A", cm).astype(np.float64)
hist = [residual_norm(A, x, b)]
for _ in range(6):
    r = b - Sf @ x
    x = x + np.asarray(solve_super(f, r, "A", cm), dtype=np.float64)
    hist.append(residual_norm(A, x, b))
print("RESULT:" + json.dumps(dict(
    prec=jax.config.jax_default_matmul_precision, compile_s=tc,
    refactor_ms=dt * 1e3, gflops=sym.flops / dt / 1e9,
    residual0=hist[0], residual3=hist[3], residual6=hist[6],
    fl=sym.flops)))
"""


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "lap3d_28"
    precs = sys.argv[2:] or ["default", "tensorfloat32", "float32"]
    potrf = os.environ.get("SSTPU_POTRF", "xla")
    for prec in precs:
        env = dict(os.environ, SSTPU_MM_PRECISION=prec, PREC_MATRIX=name,
                   SSTPU_POTRF=potrf)
        p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=3000)
        for line in p.stdout.splitlines():
            if line.startswith("RESULT:"):
                r = json.loads(line[7:])
                print(f"{prec:14s}: compile {r['compile_s']:6.1f}s  "
                      f"refactor {r['refactor_ms']:8.2f} ms "
                      f"({r['gflops']:6.1f} GF/s)  residual "
                      f"{r['residual0']:.1e} -> {r['residual3']:.1e} -> "
                      f"{r['residual6']:.1e}", flush=True)
                break
        else:
            print(f"{prec}: FAILED rc={p.returncode}\n{p.stderr[-2000:]}",
                  flush=True)


if __name__ == "__main__":
    main()
