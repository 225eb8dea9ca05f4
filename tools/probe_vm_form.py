"""Measure pf program forms on TPU: unroll vs vm (while+switch) vs scan.

All with potrf=xla (no pallas) so compile stays cheap and the comparison
isolates the FORM cost (carry aliasing vs copies, switch overhead).
Run: python tools/probe_vm_form.py [matrix] [forms...]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    os.environ.setdefault("SSTPU_POTRF", "xla")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    name = sys.argv[1] if len(sys.argv) > 1 else "lap3d_28"
    forms = sys.argv[2:] or ["unroll", "vm", "scan"]
    from suitesparse_tpu.io import collection
    from suitesparse_tpu.io.generators import symmetrize_upper
    from suitesparse_tpu.cholesky import analyze, super_symbolic
    from suitesparse_tpu.cholesky.super_numeric import (build_plan,
                                                        _assemble_values)
    from suitesparse_tpu.cholesky.pf import pf_numeric
    from suitesparse_tpu.core.common import default_common
    A = collection.get(name)
    if A.stype == 0:
        A = symmetrize_upper(A)
    cm = default_common()
    cm.cholesky.supernodal = "supernodal"
    cm.cholesky.program = "pf"
    sym = analyze(A, cm)
    ss = super_symbolic(A, sym, cm)
    plan = build_plan(ss)
    pfp = plan.pf_plan(cm)
    vals = _assemble_values(A, sym, ss, np.float32)
    vd = jnp.asarray(vals, dtype=jnp.float32)
    print(f"[{name}] fl={sym.flops:.3g} instr={len(pfp.instr_cls)} "
          f"classes={len(pfp.fmeta)+len(pfp.pmeta)+len(pfp.qmeta)}",
          flush=True)
    ref = None
    for form in forms:
        t0 = time.perf_counter()
        out = pf_numeric(vd, pfp, np.float32, form=form)
        float(jax.device_get(out.ravel()[0]))
        tc = time.perf_counter() - t0
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = pf_numeric(vd, pfp, np.float32, form=form)
        float(jax.device_get(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / reps
        h = np.asarray(out)
        if ref is None:
            ref = h
            err = 0.0
        else:
            err = float(np.nanmax(np.abs(h - ref)))
        print(f"  {form:7s}: {dt*1e3:9.2f} ms ({sym.flops/dt/1e9:7.1f} "
              f"GF/s)  first-call {tc:.1f}s  maxdiff {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
