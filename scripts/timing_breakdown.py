"""Per-iteration cost breakdown of the NUTS while-loop on TPU.

With a tiny step size no U-turn/divergence fires, so a transition executes
exactly 2^max_depth − 1 leaf iterations; differencing two depths isolates the
per-leaf-iteration wall time. A bare fused-leapfrog scan gives the arithmetic
floor (gradient + kick/drift/kick only).
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import advancedhmc_tpu as ahmc
from advancedhmc_tpu.models import hierarchical_logistic, std_gaussian
from advancedhmc_tpu.integrators import leapfrog_step

C, D = 4096, 100


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    target = hierarchical_logistic(n=1000, p=D - 1, dtype=jnp.float32)
    metric = ahmc.make_metric("diagonal", D)
    h = ahmc.Hamiltonian(metric=metric, target=target)
    key = jax.random.PRNGKey(0)
    theta = 0.05 * jax.random.normal(key, (C, D), jnp.float32)
    z = jax.vmap(h.init_phasepoint)(jax.random.split(key, C), theta)

    # --- floor: bare vmapped fused leapfrog scan (127 steps) ---
    integ = ahmc.Leapfrog(step_size=jnp.asarray(1e-3, jnp.float32))

    @jax.jit
    def bare(z):
        def one_chain(zc):
            def body(zz, _):
                return leapfrog_step(integ, h, zz, 1e-3), None
            out, _ = jax.lax.scan(body, zc, None, length=127)
            return out.theta
        return jax.vmap(one_chain)(z)

    t_bare = timeit(lambda zz: bare(zz), z)
    print(f"bare leapfrog scan 127 steps: {t_bare*1e3:.2f} ms "
          f"→ {t_bare/127*1e6:.1f} µs/step")

    # --- full NUTS transitions at two depths ---
    def make_tr(depth):
        traj = ahmc.Trajectory(integ, ahmc.GeneralisedNoUTurn(max_depth=depth),
                               "multinomial")

        @jax.jit
        def tr(z, keys):
            return jax.vmap(
                lambda k, zz: ahmc.nuts_transition(k, h, traj, zz)[0].theta
            )(keys, z)
        return tr

    keys = jax.random.split(key, C)
    t6 = timeit(make_tr(6), z, keys)
    t7 = timeit(make_tr(7), z, keys)
    per_iter = (t7 - t6) / 64
    print(f"nuts depth6 (63 it): {t6*1e3:.2f} ms | depth7 (127 it): "
          f"{t7*1e3:.2f} ms")
    print(f"per leaf-iteration: {per_iter*1e6:.1f} µs "
          f"(overhead vs bare: {per_iter/(t_bare/127):.1f}x)")


if __name__ == "__main__":
    main()
