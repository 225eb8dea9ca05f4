"""On-chip probe of dispatch floors: XLA fused chains, XLA custom calls,
and Pallas grid steps.

The DUS microbench showed ~45 us per XLA op regardless of data size.  This
probe distinguishes:
  chainK     K dependent elementwise muls on one (8,128) tile — XLA fuses a
             dependent chain into ONE kernel, so if time ~ flat in K the
             per-op tax is launch overhead, not op count.
  choleskyW  one batched (W,128,128) cholesky custom call.
  trsmW      one batched triangular_solve custom call.
  pallasG    pallas_call, grid=(G,), each step: read 64K-float block from
             HBM, multiply, write back (auto-pipelined).  Per-step cost =
             the VM design's per-instruction floor.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def readback(x):
    return float(jax.device_get(x.ravel()[0]))


def run(fn, *args, reps=20):
    out = fn(*args)
    readback(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    readback(out)
    return (time.perf_counter() - t0) / reps


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    except Exception:
        pass

    x = jnp.ones((8, 128))
    for K in (1, 64, 256):
        @jax.jit
        def chain(x, K=K):
            for _ in range(K):
                x = x * 1.0000001
            return x
        t = run(chain, x)
        print(f"chain{K:4d}: {t*1e6:9.1f} us", flush=True)

    for W in (1, 64):
        a = jnp.eye(128) * 2.0
        A = jnp.broadcast_to(a, (W, 128, 128)) + 0.0
        chol = jax.jit(jnp.linalg.cholesky)
        t = run(chol, A)
        print(f"cholesky W={W:3d}: {t*1e6:9.1f} us", flush=True)
        B = jnp.ones((W, 128, 128))
        trsm = jax.jit(lambda C, B: jax.lax.linalg.triangular_solve(
            C, B, left_side=False, lower=True))
        t = run(trsm, A, B)
        print(f"trsm     W={W:3d}: {t*1e6:9.1f} us", flush=True)

    s = 1 << 16          # 64K floats per block
    for G in (64, 256):
        buf = jnp.ones((G * 512, 128))

        def kernel(in_ref, out_ref):
            out_ref[:] = in_ref[:] * 1.0000001

        @jax.jit
        def pally(buf):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
                grid=(G,),
                in_specs=[pl.BlockSpec((512, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(buf)
        t = run(pally, buf)
        print(f"pallas G={G:4d} ({G*s*4>>20} MB): {t*1e6:9.1f} us "
              f"({t/G*1e6:6.2f} us/step)", flush=True)

    # pallas with a serial grid doing dynamic HBM slices (closer to the VM)
    for G in (64, 256):
        hbm = jnp.ones((G * 512, 128))
        offs = jnp.arange(G, dtype=jnp.int32)[::-1] * 512

        def vmk(offs_ref, hbm_ref, out_ref, scratch, sem):
            i = pl.program_id(0)
            o = offs_ref[i]
            dma = pltpu.make_async_copy(
                hbm_ref.at[pl.ds(o, 512), :], scratch, sem)
            dma.start()
            dma.wait()
            scratch[:] = scratch[:] * 1.0000001
            dma2 = pltpu.make_async_copy(
                scratch, out_ref.at[pl.ds(o, 512), :], sem)
            dma2.start()
            dma2.wait()

        @jax.jit
        def vm(offs, hbm):
            return pl.pallas_call(
                vmk,
                out_shape=jax.ShapeDtypeStruct(hbm.shape, hbm.dtype),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(G,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                    scratch_shapes=[pltpu.VMEM((512, 128), jnp.float32),
                                    pltpu.SemaphoreType.DMA(())],
                ),
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(offs, hbm)
        t = run(vm, offs, hbm)
        print(f"pallasVM G={G:4d}: {t*1e6:9.1f} us ({t/G*1e6:6.2f} us/step)",
              flush=True)


if __name__ == "__main__":
    main()
