"""TPU primitive micro-benchmarks with HONEST timing.

Round-2 postmortem (VERDICT.md weak #2): `block_until_ready()` does not
reliably synchronize through the axon remote-execution tunnel, so every
sub-ms round-1/2 timing was untrustworthy and the "measured roofline" came
out 85-450x above datasheet physics.  The fix, used for every timed region
here and in bench.py: force a HOST READBACK of one element of the result
(`jax.device_get(out.ravel()[0])`), which cannot complete before the whole
computation has.

Two protocols per op:
  chain  -- K dependent applications inside one timed region, one readback
            at the end, divide by K (amortizes tunnel latency; right for
            sub-ms kernels)
  single -- one application, one readback (includes dispatch+readback
            overhead; the honest per-call latency)

Run on the real chip:  python tools/microbench.py [section ...]
Sections: roofline slice gather scatter segsum project chol all
"""
import sys
import time

import numpy as np


def timed(fn, out_probe, iters=20, chain=None):
    """Return (single_s, chained_s). fn() -> array; out_probe(a) -> scalar
    element of a forced to host. chain(a) -> a applies one more step."""
    a = fn()
    float(out_probe(a))          # compile + warm
    # single
    t0 = time.perf_counter()
    a = fn()
    float(out_probe(a))
    single = time.perf_counter() - t0
    # chained
    if chain is None:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                a = fn()
            float(out_probe(a))
            ts.append((time.perf_counter() - t0) / iters)
        return single, min(ts)
    t0 = time.perf_counter()
    for _ in range(iters):
        a = chain(a)
    float(out_probe(a))
    chained = (time.perf_counter() - t0) / iters
    return single, chained


def probe(a):
    import jax
    return jax.device_get(a.ravel()[0])


def sec_roofline():
    import jax, jax.numpy as jnp
    print("== GEMM roofline (chained, honest readback) ==", flush=True)
    for dtype, size in ((jnp.float32, 4096), (jnp.float32, 8192),
                        (jnp.bfloat16, 8192)):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        a = jax.random.normal(k1, (size, size), dtype=dtype)
        b = jax.random.normal(k2, (size, size), dtype=dtype)
        f = jax.jit(lambda x, y: x @ y)
        single, chained = timed(lambda: f(a, b), probe, 16,
                                chain=lambda c: f(c, b))
        gf = 2 * size**3 / chained / 1e9
        name = np.dtype("float32").name if dtype == jnp.float32 else "bf16"
        print(f"  {name} {size}^3: {chained*1e3:.2f} ms -> {gf:,.0f} GFLOP/s"
              f" (single-call {single*1e3:.2f} ms)", flush=True)
        assert gf < 4.2e5, "impossible roofline: readback did not sync?"


def sec_slice():
    import jax, jax.numpy as jnp
    print("== contiguous dynamic_slice r/w (HBM bandwidth proxy) ==",
          flush=True)
    N = 64 << 20            # 256 MB buffer
    M = 16 << 20            # 64 MB slice
    x = jnp.arange(N, dtype=jnp.float32)

    @jax.jit
    def f(x):
        s = jax.lax.dynamic_slice(x, (1024,), (M,))
        return jax.lax.dynamic_update_slice(x, s * 1.5, (2048,))
    single, chained = timed(lambda: f(x), probe, 10, chain=f)
    gbs = (2 * M * 4) / chained / 1e9
    print(f"  slice+update 64MB: {chained*1e3:.2f} ms -> {gbs:.0f} GB/s "
          f"(single {single*1e3:.2f} ms)", flush=True)


def sec_gather():
    import jax, jax.numpy as jnp
    print("== gathers at varying granularity ==", flush=True)
    rng = np.random.default_rng(0)
    # element gather: 16M random elements from a 16M buffer
    N = 16 << 20
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, N), dtype=jnp.int32)
    f = jax.jit(lambda x, i: x[i])
    single, chained = timed(lambda: f(x, idx), probe, 5)
    print(f"  element gather 16M: {chained*1e3:.2f} ms -> "
          f"{N*4/chained/1e9:.1f} GB/s (single {single*1e3:.2f} ms)",
          flush=True)
    # block gather via take along axis 0 of (B, mb, mb)
    for mb, B, K in ((32, 8192, 8192), (128, 1024, 1024)):
        u = jnp.asarray(rng.standard_normal((B, mb, mb)), dtype=jnp.float32)
        ids = jnp.asarray(rng.integers(0, B, K), dtype=jnp.int32)
        g = jax.jit(lambda u, i: u[i])
        single, chained = timed(lambda: g(u, ids), probe, 10)
        by = K * mb * mb * 4
        print(f"  block gather ({K}x{mb}x{mb}): {chained*1e3:.3f} ms -> "
              f"{by/chained/1e9:.1f} GB/s (single {single*1e3:.2f} ms)",
              flush=True)
    # row gather: (K, mb) rows from (B, mb)
    for mb, B in ((128, 1 << 20), (1024, 1 << 17)):
        u = jnp.asarray(rng.standard_normal((B, mb)), dtype=jnp.float32)
        K = B
        ids = jnp.asarray(rng.integers(0, B, K), dtype=jnp.int32)
        g = jax.jit(lambda u, i: u[i])
        single, chained = timed(lambda: g(u, ids), probe, 10)
        by = K * mb * 4
        print(f"  row gather ({K}x{mb}): {chained*1e3:.3f} ms -> "
              f"{by/chained/1e9:.1f} GB/s (single {single*1e3:.2f} ms)",
              flush=True)


def sec_scatter():
    import jax, jax.numpy as jnp
    print("== sorted+unique scatter-add ==", flush=True)
    rng = np.random.default_rng(0)
    N = 32 << 20
    for K in (1 << 20, 8 << 20):
        x = jnp.zeros(N, dtype=jnp.float32)
        d = np.sort(rng.choice(N, K, replace=False)).astype(np.int32)
        v = jnp.asarray(rng.standard_normal(K), dtype=jnp.float32)
        di = jnp.asarray(d)

        @jax.jit
        def f(x, v, di):
            return x.at[di].add(v, indices_are_sorted=True,
                                unique_indices=True,
                                mode="promise_in_bounds")
        single, chained = timed(lambda: f(x, v, di), probe, 5,
                                chain=lambda a: f(a, v, di))
        by = K * 4 * 3
        print(f"  scatter-add {K>>20}M sorted+unique into {N>>20}M: "
              f"{chained*1e3:.2f} ms -> {by/chained/1e9:.1f} GB/s "
              f"(single {single*1e3:.2f} ms)", flush=True)


def sec_segsum():
    import jax, jax.numpy as jnp
    print("== sorted segment_sum ==", flush=True)
    rng = np.random.default_rng(0)
    L, K = 32 << 20, 8 << 20
    ids = np.sort(rng.integers(0, K, L)).astype(np.int32)
    v = jnp.asarray(rng.standard_normal(L), dtype=jnp.float32)
    idi = jnp.asarray(ids)
    f = jax.jit(lambda v, i: jax.ops.segment_sum(
        v, i, num_segments=K, indices_are_sorted=True))
    single, chained = timed(lambda: f(v, idi), probe, 5)
    print(f"  segment_sum {L>>20}M->{K>>20}M: {chained*1e3:.2f} ms -> "
          f"{L*4/chained/1e9:.1f} GB/s (single {single*1e3:.2f} ms)",
          flush=True)


def sec_project():
    import jax, jax.numpy as jnp
    print("== one-hot frame projection (extend-add candidate) ==",
          flush=True)
    rng = np.random.default_rng(0)
    # patch = Wh @ U @ Wh^T as (row-gather R=U[idxf]) then einsum R,Wh
    for Btp, G, Mft, mb in ((64, 4, 256, 128), (8, 4, 1024, 512),
                            (2, 4, 2048, 1024), (256, 8, 64, 32)):
        B = Btp * G
        U = jnp.asarray(rng.standard_normal((B, mb, mb)), dtype=jnp.float32)
        csel = jnp.asarray(rng.integers(0, B, (Btp, G)), dtype=jnp.int32)
        idxf = np.full((Btp, G, Mft), mb, dtype=np.int32)
        for k in range(Btp):
            for g in range(G):
                pos = np.sort(rng.choice(Mft, mb, replace=False))
                idxf[k, g, pos] = np.arange(mb)
        idxf = jnp.asarray(idxf)

        @jax.jit
        def f(U, csel, idxf):
            patch = jnp.zeros((Btp, Mft, Mft), dtype=jnp.float32)
            for g in range(G):
                Ug = U[csel[:, g]]                       # block gather
                pad = jnp.zeros((Btp, 1, mb), U.dtype)
                Ug = jnp.concatenate([Ug, pad], axis=1)  # row mb = zero
                R = jnp.take_along_axis(
                    Ug, idxf[:, g][:, :, None], axis=1)  # row gather
                Wh = (idxf[:, g][:, :, None] ==
                      jnp.arange(mb, dtype=jnp.int32)).astype(U.dtype)
                patch += jnp.einsum("kfm,khm->kfh", R, Wh,
                                    preferred_element_type=jnp.float32)
            return patch
        single, chained = timed(lambda: f(U, csel, idxf), probe, 10)
        fl = 2 * Btp * G * Mft * Mft * mb
        print(f"  project Btp={Btp} G={G} Mft={Mft} mb={mb}: "
              f"{chained*1e3:.3f} ms -> {fl/chained/1e9:,.0f} GFLOP/s "
              f"(single {single*1e3:.2f} ms)", flush=True)


def sec_chol():
    import jax, jax.numpy as jnp
    print("== batched POTRF / TRSM ==", flush=True)
    rng = np.random.default_rng(0)
    for W, Np, Mb in ((512, 128, 128), (8, 1024, 1024), (1, 2048, 2048)):
        A = rng.standard_normal((W, Np, Np))
        A = (A @ A.transpose(0, 2, 1) + Np * np.eye(Np)).astype(np.float32)
        Bm = jnp.asarray(rng.standard_normal((W, Mb, Np)), dtype=jnp.float32)
        Ad = jnp.asarray(A)
        f = jax.jit(lambda A: jnp.linalg.cholesky(A))
        single, chained = timed(lambda: f(Ad), probe, 5)
        fl = W * Np**3 / 3
        print(f"  potrf ({W},{Np}): {chained*1e3:.3f} ms -> "
              f"{fl/chained/1e9:,.0f} GFLOP/s (single {single*1e3:.2f} ms)",
              flush=True)
        C = f(Ad)
        g = jax.jit(lambda C, B: jax.lax.linalg.triangular_solve(
            C, B, left_side=False, lower=True, transpose_a=True))
        single, chained = timed(lambda: g(C, Bm), probe, 5)
        fl = W * Mb * Np * Np
        print(f"  trsm  ({W},{Mb}x{Np}): {chained*1e3:.3f} ms -> "
              f"{fl/chained/1e9:,.0f} GFLOP/s (single {single*1e3:.2f} ms)",
              flush=True)
        h = jax.jit(lambda B: jnp.einsum("bik,bjk->bij", B, B,
                                         preferred_element_type=jnp.float32))
        single, chained = timed(lambda: h(Bm), probe, 5)
        fl = 2 * W * Mb * Mb * Np
        print(f"  syrk  ({W},{Mb}x{Np}): {chained*1e3:.3f} ms -> "
              f"{fl/chained/1e9:,.0f} GFLOP/s (single {single*1e3:.2f} ms)",
              flush=True)


SECTIONS = dict(roofline=sec_roofline, slice=sec_slice, gather=sec_gather,
                scatter=sec_scatter, segsum=sec_segsum, project=sec_project,
                chol=sec_chol)


def main():
    import jax, jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    platform = next(iter(jnp.zeros(1).devices())).platform
    print(f"platform={platform}", flush=True)
    args = sys.argv[1:] or ["all"]
    names = list(SECTIONS) if args == ["all"] else args
    for name in names:
        SECTIONS[name]()


if __name__ == "__main__":
    main()
