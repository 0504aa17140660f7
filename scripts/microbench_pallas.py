"""Microbenchmark: Pallas fused leapfrog vs XLA scan (TPU).

The reference's GPU scenario (1000 chains × 5-D Float32 static HMC,
/root/reference/test/CUDA/cuda.jl:14-31) scaled up. Reports steps/s for both
paths; the Pallas kernel is adopted in the sampler fast path only if it wins
(SURVEY.md §7.7 'adopt only where it beats XLA fusion').
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from advancedhmc_tpu.ops.fused_leapfrog import (
    fused_gaussian_leapfrog,
    reference_gaussian_leapfrog,
)


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    for c, d, L in [(1024, 8, 100), (4096, 128, 100), (16384, 128, 100),
                    (65536, 8, 100)]:
        key = jax.random.PRNGKey(0)
        theta = jax.random.normal(key, (c, d), jnp.float32)
        r = jax.random.normal(key, (c, d), jnp.float32)
        prec = jnp.ones((d,), jnp.float32)
        m_inv = jnp.ones((d,), jnp.float32)

        ref = jax.jit(lambda th, rr: reference_gaussian_leapfrog(
            th, rr, prec, m_inv, 0.1, L))
        pal = lambda th, rr: fused_gaussian_leapfrog(
            th, rr, prec, m_inv, 0.1, L, block_chains=min(c, 1024))

        t_ref = bench(ref, theta, r)
        t_pal = bench(pal, theta, r)
        steps = c * L
        print(f"C={c:6d} D={d:4d} L={L}: xla {t_ref*1e3:7.2f}ms "
              f"({steps/t_ref/1e6:8.1f} Msteps/s) | pallas {t_pal*1e3:7.2f}ms "
              f"({steps/t_pal/1e6:8.1f} Msteps/s) | speedup "
              f"{t_ref/t_pal:5.2f}x")


if __name__ == "__main__":
    main()
