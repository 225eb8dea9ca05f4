"""On-chip microbench: cost of a chained dynamic_update_slice program.

Question: in an unrolled straight-line program over one large 1-D factor
buffer, does each (dynamic_slice -> compute -> dynamic_update_slice) step
cost O(slice) or O(buffer)?  If O(buffer), XLA is copying the whole buffer
per instruction and the pf program's per-instruction floor (~0.4 ms) is
explained; the fix is program structure, not kernel tuning.

Variants (K steps, buffer S floats, slice s floats):
  dyn     offsets are traced int32 scalars from an operand array
  static  offsets are Python ints (constant-folded)
  multi   buffer split into K separate arrays (no offsets at all)
  read    dyn, but result written to a tiny accumulator (no DUS)
Sweep S with fixed K, s.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp


def readback(x):
    return float(jax.device_get(x.ravel()[0]))


def run(fn, args, reps=10):
    out = fn(*args)
    jax.tree.map(readback, out) if isinstance(out, (list, tuple)) else readback(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    (readback(out[0]) if isinstance(out, (list, tuple)) else readback(out))
    return (time.perf_counter() - t0) / reps


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    except Exception:
        pass
    K = 64            # instructions
    s = 1 << 16       # slice floats (64k floats = 256 KB)
    sizes = [1 << 22, 1 << 24, 1 << 26]   # 16 MB, 64 MB, 256 MB buffers

    for S in sizes:
        offs = np.random.default_rng(0).integers(0, S - s, size=K)
        offs = (offs // 8) * 8
        offd = jnp.asarray(offs, dtype=jnp.int32)

        @jax.jit
        def dyn(buf, off):
            for k in range(K):
                p = jax.lax.dynamic_slice(buf, (off[k],), (s,))
                p = p * 1.0000001
                buf = jax.lax.dynamic_update_slice(buf, p, (off[k],))
            return buf

        @jax.jit
        def static(buf):
            for k in range(K):
                o = int(offs[k])
                p = jax.lax.dynamic_slice(buf, (o,), (s,))
                p = p * 1.0000001
                buf = jax.lax.dynamic_update_slice(buf, p, (o,))
            return buf

        @jax.jit
        def read_only(buf, off):
            acc = jnp.zeros((8,), dtype=buf.dtype)
            for k in range(K):
                p = jax.lax.dynamic_slice(buf, (off[k],), (s,))
                acc = acc + p[:8]
            return acc

        @jax.jit
        def donated(buf, off):
            return dyn(buf, off)

        nsub = S // s
        subs = [jnp.zeros(s) for _ in range(min(K, nsub))]

        @jax.jit
        def multi(subs):
            return [p * 1.0000001 for p in subs]

        buf = jnp.zeros(S)
        t_dyn = run(dyn, (buf, offd))
        t_sta = run(static, (buf,))
        t_rd = run(read_only, (buf, offd))
        t_mu = run(multi, (subs,))
        don = jax.jit(dyn, donate_argnums=0)
        bufs = [jnp.zeros(S) for _ in range(11)]
        out = don(bufs[0], offd)
        readback(out)
        t0 = time.perf_counter()
        for i in range(1, 11):
            out = don(bufs[i], offd)
        readback(out)
        t_don = (time.perf_counter() - t0) / 10

        mb = S * 4 / (1 << 20)
        print(f"S={mb:6.0f}MB K={K} s={s*4>>10}KB: "
              f"dyn {t_dyn*1e3:8.3f} ms  static {t_sta*1e3:8.3f}  "
              f"donated {t_don*1e3:8.3f}  read {t_rd*1e3:8.3f}  "
              f"multi {t_mu*1e3:8.3f}   per-step dyn "
              f"{t_dyn/K*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
