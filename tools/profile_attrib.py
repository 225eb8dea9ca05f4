"""Per-phase attribution of the pf numeric program from a DEVICE profile.

Profiles one (pre-compiled) refactor with jax.profiler, parses the
xplane trace directly (tsl XSpace proto — the tensorboard plugin in this
image is version-mismatched), joins each XLA-op event with the compiled
module's op_name metadata (which carries the jax named_scope labels in
pf.py: Fslice/Fpotrf/Fsyrk/Fwrite/Fscat per factor class,
Qgather/Qplace/Qeinsum/Qscat per projection class), and prints a phase
table — the lap3d_64 attribution VERDICT r4 item 3 asks for.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
     python tools/profile_attrib.py [matrix] [group-detail]
"""
import collections
import glob
import os
import re
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def parse_xplane(tracedir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    fn = max(glob.glob(os.path.join(tracedir, "**/*.xplane.pb"),
                       recursive=True), key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(fn, "rb").read())
    events = []      # (hlo_instr_name, duration_ps)
    for p in xs.planes:
        if not p.name.startswith("/device:TPU"):
            continue
        for ln in p.lines:
            if ln.name != "XLA Ops":
                continue
            for e in ln.events:
                md = p.event_metadata[e.metadata_id]
                m = re.match(r"%([\w.\-]+) ", md.name)
                if m:
                    events.append((m.group(1), e.duration_ps))
    return events


def opname_map(hlo_text):
    """instruction name -> metadata op_name from optimized HLO text."""
    out = {}
    for m in re.finditer(
            r"%?([\w.\-]+) = [^\n]*?metadata={[^}]*?op_name=\"([^\"]*)\"",
            hlo_text):
        out[m.group(1)] = m.group(2)
    return out


SCOPE_RE = re.compile(
    r"/((?:F(?:slice|potrf|syrk|write|scat)|Q(?:gather|place|einsum|scat)|"
    r"Assemble)[\w]*)")


def scope_of(op_name):
    hits = SCOPE_RE.findall(op_name)
    return hits[-1] if hits else None


def main():
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    name = sys.argv[1] if len(sys.argv) > 1 else "lap3d_28"
    detail = "detail" in sys.argv[2:]
    from suitesparse_tpu.io import collection
    from suitesparse_tpu.io.generators import symmetrize_upper
    from suitesparse_tpu.cholesky import analyze, super_symbolic
    from suitesparse_tpu.cholesky.super_numeric import (build_plan,
                                                        _assemble_values,
                                                        _a_sorted_maps)
    from suitesparse_tpu.cholesky import pf as pfmod
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
    t0 = time.perf_counter()
    out = pfmod.pf_numeric(vd, pfp, np.float32)
    float(jax.device_get(out.ravel()[0]))
    print(f"[{name}] fl={sym.flops:.3g} first-call "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    out = pfmod.pf_numeric(vd, pfp, np.float32)
    float(jax.device_get(out.ravel()[0]))

    tracedir = f"/tmp/attrib_{name}"
    with jax.profiler.trace(tracedir):
        out = pfmod.pf_numeric(vd, pfp, np.float32)
        float(jax.device_get(out.ravel()[0]))

    # optimized HLO with op_name metadata via the AOT path (cache hit),
    # mirroring pf_numeric's unroll-form call exactly
    ops = pfp.arrays(np.float32)
    a_src, a_dst = pfp._cache["amaps"]
    seq = tuple((int(c), int(p))
                for c, p in zip(pfp.instr_cls, pfp.instr_pos))
    from suitesparse_tpu.cholesky.pallas_kernels import pallas_enabled
    potrf = "pallas" if pallas_enabled() else "xla"
    maxbuf_gb = float(os.environ.get("SSTPU_POTRF_MAXBUF_GB", "inf"))
    if potrf == "pallas" and pfp.buf * 4 > maxbuf_gb * (1 << 30):
        potrf = "xla"
    txt = pfmod._pf_program_unroll.lower(
        vd, a_src, a_dst, seq, ops, pfp.meta, pfp.buf, False,
        pfmod._tri_inv_enabled(), potrf).compile().as_text()
    names = opname_map(txt)

    events = parse_xplane(tracedir)
    agg = collections.Counter()
    coarse = collections.Counter()
    unattributed = collections.Counter()
    total = 0
    for instr, ps in events:
        total += ps
        op = names.get(instr)
        sc = scope_of(op) if op else None
        if sc is None:
            unattributed[instr.split(".")[0]] += ps
            coarse["(unattributed)"] += ps
        else:
            agg[sc] += ps
            coarse[re.match(r"[A-Za-z]+", sc).group(0)] += ps
    print(f"\ndevice total: {total/1e9:.2f} ms over {len(events)} op "
          f"events\n\n== coarse phases ==")
    for sc, ps in coarse.most_common():
        print(f"  {sc:14s} {ps/1e9:9.2f} ms  {100.0*ps/total:5.1f}%")
    if detail:
        print("\n== top 30 scopes ==")
        for sc, ps in agg.most_common(30):
            print(f"  {sc:20s} {ps/1e9:9.2f} ms  {100.0*ps/total:5.1f}%")
        print("\n== top unattributed instrs ==")
        for nm, ps in unattributed.most_common(12):
            print(f"  {nm:28s} {ps/1e9:9.2f} ms")


if __name__ == "__main__":
    main()
