"""Does the TPU worker dedupe IDENTICAL Mosaic kernel payloads within one
XLA program?  Round-4 measured ~5 s remote compile per pallas_call
INSTANCE — but every instance had a distinct batch width W, hence a
distinct payload.  If byte-identical payloads compile once, canonicalizing
the kernel batch width per Np collapses the cold-compile wall to
O(#distinct shapes).

Builds two 12-site programs: (a) all sites identical shape, (b) each site
a distinct grid size.  Compares wall-clock compile.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from suitesparse_tpu.cholesky.pallas_kernels import block_chol
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    NSITE = 12

    # (a) identical sites: W=1536 (unused by any cached program), Np=32
    def prog_same(S, pe):
        acc = S
        for _ in range(NSITE):
            out = block_chol(acc, pe)
            # feed output back (symmetrized) so sites chain and cannot CSE
            acc = out + jnp.transpose(out, (0, 2, 1))
        return acc

    # (b) distinct sites: W = 1536, 1024, 512, ... (distinct grid sizes)
    Ws = [1536 - 128 * i for i in range(NSITE)]

    def prog_diff(S, pe):
        acc = S
        for w in Ws:
            out = block_chol(acc[:w], pe[:w])
            full = jnp.concatenate(
                [out + jnp.transpose(out, (0, 2, 1)),
                 acc[w:]], axis=0)
            acc = full
        return acc

    Np = 32
    S = jnp.asarray(np.eye(Np, dtype=np.float32)[None] * 4.0
                    + 0.01 * rng.standard_normal((1536, Np, Np)).astype(
                        np.float32) * 0)
    S = jnp.broadcast_to(S, (1536, Np, Np)) + 0.0
    pe = jnp.zeros((1536, Np), dtype=jnp.float32)

    for name, prog in [("identical", prog_same), ("distinct", prog_diff)]:
        f = jax.jit(prog)
        t0 = time.perf_counter()
        out = f(S, pe)
        float(jax.device_get(out.ravel()[0]))
        dt = time.perf_counter() - t0
        print(f"  {name:9s}: {NSITE} sites compile+run {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
