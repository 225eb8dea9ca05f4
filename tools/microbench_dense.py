"""On-chip cost of the dense factor-branch primitives at panel shapes.

The per-CALL dispatch floor through the axon tunnel is ~2-5 ms, so a
single-op probe measures nothing.  Each primitive is therefore timed as a
data-dependent CHAIN inside one jitted program, at two chain lengths; the
difference cancels the floor: per_op = (t_K2 - t_K1) / (K2 - K1).
"""
import time
import sys
import numpy as np
import jax
import jax.numpy as jnp


def readback(x):
    return float(jax.device_get(x.ravel()[0]))


def run(fn, *args, reps=3):
    out = fn(*args)
    readback(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    readback(out)
    return (time.perf_counter() - t0) / reps


K1, K2 = 2, 12


def chain_time(make_step, x0):
    """Time one step of make_step via K2-K1 differencing."""
    def chained(K):
        @jax.jit
        def f(x):
            for _ in range(K):
                x = make_step(x)
            return x
        return f
    t1 = run(chained(K1), x0)
    t2 = run(chained(K2), x0)
    return (t2 - t1) / (K2 - K1)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    shapes = [(512, 8, 8), (512, 32, 32), (128, 128, 128), (64, 128, 512),
              (16, 256, 1024), (4, 512, 1536), (1, 1024, 2048),
              (1, 3584, 0)]
    if len(sys.argv) > 1:
        shapes = [tuple(map(int, s.split("x"))) for s in sys.argv[1:]]

    for (W, Np, Mb) in shapes:
        A0 = jnp.broadcast_to(jnp.eye(Np) * 4.0, (W, Np, Np)) + 0.1
        A0 = (A0 + A0.transpose(0, 2, 1)) / 2 + jnp.eye(Np) * Np

        def chol_step(A):
            L = jnp.linalg.cholesky(A)
            return A + 1e-12 * L

        t_chol = chain_time(chol_step, A0)
        fl_chol = W * Np**3 / 3
        line = (f"W={W:4d} Np={Np:5d} Mb={Mb:5d}: "
                f"chol {t_chol*1e3:8.3f} ms ({fl_chol/t_chol/1e9:8.1f} GF/s)")
        if Mb:
            C = jnp.linalg.cholesky(A0)
            B0 = jnp.ones((W, Mb, Np))

            def trsm_step(B, C=C):
                S = jax.lax.linalg.triangular_solve(
                    C, B, left_side=False, lower=True, transpose_a=True)
                return B + 1e-12 * S

            def syrk_step(B):
                U = jnp.einsum("bik,bjk->bij", B, B,
                               preferred_element_type=jnp.float32)
                return B + 1e-12 * U[:, :, :1]

            t_trsm = chain_time(trsm_step, B0)
            fl_trsm = W * Mb * Np * Np
            t_syrk = chain_time(syrk_step, B0)
            fl_syrk = 2 * W * Mb * Mb * Np
            line += (f"  trsm {t_trsm*1e3:8.3f} ms ({fl_trsm/t_trsm/1e9:8.1f})"
                     f"  syrk {t_syrk*1e3:8.3f} ms ({fl_syrk/t_syrk/1e9:8.1f})")
        print(line, flush=True)


if __name__ == "__main__":
    main()
