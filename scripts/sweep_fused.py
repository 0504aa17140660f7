"""Sweep fused-draw-loop variants on the real TPU (bench shape).

Times one 128-draw chunk per variant (compile excluded):
  base            current defaults (fuse=16)
  prec            uturn_precision="highest" (pins U-turn stacks to f32)
  outbf16         out_dtype="bfloat16" draw buffer
  prec+outbf16    both
  ...x fuse widths from AHMC_SWEEP_FUSE (comma list, default "16,32")

Usage (exclusive TPU): PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_fused.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    from advancedhmc_tpu import (
        AdaptorConfig, GeneralisedNoUTurn, Hamiltonian, HMCKernel, Leapfrog,
        Trajectory, find_good_stepsize, init_state, make_metric,
    )
    from advancedhmc_tpu.adaptation import DualAveragingConfig, adapt_flags
    from advancedhmc_tpu.sampler import (
        SampleSpec, fused_draw_phase, fused_warmup_phase_crosschain,
    )
    from advancedhmc_tpu.models import hierarchical_logistic

    n_chains = int(os.environ.get("AHMC_BENCH_CHAINS", 4096))
    dim = int(os.environ.get("AHMC_BENCH_DIM", 100))
    max_depth = int(os.environ.get("AHMC_BENCH_MAX_DEPTH", 8))
    chunk = int(os.environ.get("AHMC_BENCH_CHUNK", 128))
    n_warmup = int(os.environ.get("AHMC_BENCH_WARMUP", 128))
    fuses = [int(x) for x in
             os.environ.get("AHMC_SWEEP_FUSE", "16,32").split(",")]

    target = hierarchical_logistic(n=1000, p=dim - 1, dtype=jnp.float32)

    def make_spec(precision, stack_dtype=None):
        kernel = HMCKernel(Trajectory(
            Leapfrog(step_size=jnp.asarray(0.05, jnp.float32)),
            GeneralisedNoUTurn(max_depth=max_depth), "multinomial",
            uturn_precision=precision, stack_dtype=stack_dtype,
        ))
        return SampleSpec(target=target, kernel=kernel,
                          adaptor=AdaptorConfig(kind="stan", da=DualAveragingConfig(
        delta=float(os.environ.get("AHMC_BENCH_DELTA", 0.6)))),
                          cross_chain=True)

    spec0 = make_spec(None)
    key = jax.random.PRNGKey(0)
    k_init, k_eps, k_state = jax.random.split(key, 3)
    theta0 = 0.1 * jax.random.normal(k_init, (n_chains, dim), jnp.float32)
    h0 = Hamiltonian(metric=make_metric("diagonal", dim), target=target)
    eps0 = float(jax.jit(find_good_stepsize)(k_eps, h0, theta0[0]))
    state = init_state(k_state, spec0, make_metric("diagonal", dim), theta0,
                       init_eps=eps0)

    flags_all = adapt_flags(spec0.adaptor, n_warmup, n_warmup + chunk)
    fl = jax.tree_util.tree_map(lambda a: a[:n_warmup], flags_all)

    @jax.jit
    def warm(state, fl):
        st, _, _ = fused_warmup_phase_crosschain(spec0, state, n_warmup, 8,
                                                 flags=fl)
        return st

    t0 = time.time()
    state = warm(state, fl)
    jax.block_until_ready(state.z.theta)
    print(f"# warmup done {time.time()-t0:.1f}s", file=sys.stderr)

    names = os.environ.get(
        "AHMC_SWEEP_VARIANTS", "base,prec,outbf16,prec+outbf16"
    ).split(",")
    # name -> (uturn_precision, out_dtype, stack_dtype)
    catalog = {
        "base": (None, None, None),
        "prec": ("highest", None, None),
        "outbf16": (None, "bfloat16", None),
        "prec+outbf16": ("highest", "bfloat16", None),
        "stackbf16": (None, None, "bfloat16"),
        "stackbf16+outbf16": (None, "bfloat16", "bfloat16"),
    }
    variants = [(f"{n}/f{fuse}", *catalog[n], fuse)
                for fuse in fuses for n in names]

    results = {}
    for name, precision, out_dtype, stack_dtype, fuse in variants:
        spec = make_spec(precision, stack_dtype)

        @jax.jit
        def run(state):
            from advancedhmc_tpu.experimental import Experimental
            st, thetas, stats = fused_draw_phase(
                spec, state, chunk, fuse,
                experimental=Experimental(out_dtype=out_dtype)
            )
            return st, thetas, stats["n_steps"]

        t0 = time.time()
        st1, th, ns = run(state)          # compile + first run
        jax.block_until_ready(th)
        t_compile = time.time() - t0
        t0 = time.time()
        st2, th, ns = run(st1)
        jax.block_until_ready(th)
        wall = time.time() - t0
        leaves = float(jnp.sum(ns))
        rate = leaves / wall / 1e6
        results[name] = rate
        print(f"{name:22s} {wall:6.2f}s  {leaves:10.0f} leaves "
              f"{rate:6.2f} M/s   (first run {t_compile:.0f}s)",
              flush=True)

    best = max(results, key=results.get)
    print(f"\nBEST: {best}  {results[best]:.2f} M leaves/s")


if __name__ == "__main__":
    main()
