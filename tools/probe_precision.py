"""Probe the actual MXU precision of f32 einsums on this chip.

DEFAULT-precision f32 matmuls on TPU may run as bf16 passes (~1e-3
relative error); HIGHEST runs 3/6-pass true-f32.  Prints measured
relative error and per-call time for each precision."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    m = 2048
    a = rng.standard_normal((m, m)).astype(np.float32)
    b = rng.standard_normal((m, m)).astype(np.float32)
    ref = (a.astype(np.float64) @ b.astype(np.float64))
    ad, bd = jnp.asarray(a), jnp.asarray(b)
    for prec in ["default", "float32", "tensorfloat32", "highest", "bfloat16"]:
        f = jax.jit(lambda x, y: jnp.einsum(
            "ij,jk->ik", x, y, precision=prec,
            preferred_element_type=jnp.float32))
        c = np.asarray(f(ad, bd))
        err = np.abs(c - ref).max() / np.abs(ref).max()
        # timing
        o = f(ad, bd); o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(ad, bd)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"  precision={prec:9s} relerr={err:.3e}  "
              f"{2*m**3/dt/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
