"""Reproduce/bisect the TPU-worker crash in the 32-RHS solve.

Round-5: the crash (round-4: 'HBM-scale only, undiagnosed') reproduced
at bcsstk16 (25 MB factor) right after the fatter-solve-wave change —
small enough to bisect.  Knobs:
  SSTPU_SOLVE_WCAP_MB=0   unmerge solve waves (round-4 layout)
  SSTPU_TRSM_INV=0        no folded-inverse solves
  SSTPU_MM_PRECISION=default
  RHS (argv[2])           number of right-hand sides
Run: python tools/debug_solve32.py [matrix] [k]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    name = sys.argv[1] if len(sys.argv) > 1 else "bcsstk16"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from suitesparse_tpu.io import collection
    from suitesparse_tpu.io.generators import symmetrize_upper
    from suitesparse_tpu.cholesky import analyze, super_symbolic
    from suitesparse_tpu.cholesky.super_numeric import (build_plan,
                                                        _assemble_values)
    from suitesparse_tpu.cholesky.pf import pf_numeric
    from suitesparse_tpu.cholesky.wave import wave_solve_llt, solve_dinv
    from suitesparse_tpu.core.common import default_common
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
    wp = plan.wave_plan(solve_only=True)
    print(f"[{name}] n={n} solve classes={len(wp.classes)} "
          f"instr={len(wp.instr_cls)} "
          f"W's={[ (c.Np, c.Mb, c.W) for c in wp.classes ][:8]}...",
          flush=True)
    vals = _assemble_values(A, sym, ss, np.float32)
    Lx = pf_numeric(vals, pfp, np.float32)
    Lx.block_until_ready()
    print("factor done", flush=True)
    Dv = solve_dinv(wp, Lx)
    Dv.block_until_ready()
    print("dinv done", flush=True)
    perm = jnp.asarray(sym.perm)
    invp = np.empty(n, dtype=sym.perm.dtype)
    invp[sym.perm] = np.arange(n, dtype=sym.perm.dtype)
    invp = jnp.asarray(invp)
    sel = os.environ.get("DBG_CLASSES")
    if sel is not None:
        keep = set(int(s) for s in sel.split(",") if s != "")
        m = np.isin(wp.instr_cls, list(keep))
        wp.instr_cls = wp.instr_cls[m]
        wp.instr_pos = wp.instr_pos[m]
        wp._cache.pop("instr", None)
        print(f"filtered to classes {sorted(keep)}: "
              f"{len(wp.instr_cls)} instrs (NUMERICALLY WRONG)", flush=True)
    B = jnp.asarray(np.ones((n, k), dtype=np.float32))
    t0 = time.perf_counter()
    x = wave_solve_llt(wp, Lx, B, Dv, perm, invp)
    v = float(jax.device_get(x.ravel()[0]))
    print(f"solve k={k} OK ({time.perf_counter()-t0:.1f}s) x00={v}",
          flush=True)
    for rep in range(5):
        x = wave_solve_llt(wp, Lx, B, Dv, perm, invp)
    float(jax.device_get(x.ravel()[0]))
    print("5 reps OK", flush=True)


if __name__ == "__main__":
    main()
