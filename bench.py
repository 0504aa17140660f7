"""Benchmark: 4096-chain NUTS on the 100-D hierarchical logistic model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Primary metric = effective samples / second / chip (bulk ESS pooled over all
chains and the sampling phase wall time, post-warmup). The reference publishes
no absolute numbers (BASELINE.md), so vs_baseline is reported as 1.0.

Env overrides: AHMC_BENCH_CHAINS, AHMC_BENCH_DRAWS, AHMC_BENCH_WARMUP,
AHMC_BENCH_DIM.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from advancedhmc_tpu import (
        AdaptorConfig,
        GeneralisedNoUTurn,
        HMCKernel,
        Leapfrog,
        Trajectory,
        init_state,
        make_metric,
        sample_step,
    )
    from advancedhmc_tpu.adaptation import adapt_flags
    from advancedhmc_tpu.diagnostics import effective_sample_size
    from advancedhmc_tpu.sampler import SampleSpec
    from advancedhmc_tpu.models import hierarchical_logistic

    n_chains = int(os.environ.get("AHMC_BENCH_CHAINS", 4096))
    n_draws = int(os.environ.get("AHMC_BENCH_DRAWS", 256))
    n_warmup = int(os.environ.get("AHMC_BENCH_WARMUP", 500))
    dim = int(os.environ.get("AHMC_BENCH_DIM", 100))
    max_depth = int(os.environ.get("AHMC_BENCH_MAX_DEPTH", 8))

    target = hierarchical_logistic(n=1000, p=dim - 1, dtype=jnp.float32)

    kernel = HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.02, jnp.float32)),
            GeneralisedNoUTurn(max_depth=max_depth),
            "multinomial",
        )
    )
    spec = SampleSpec(
        target=target,
        kernel=kernel,
        adaptor=AdaptorConfig(kind="stan"),
        cross_chain=True,
    )

    key = jax.random.PRNGKey(0)
    k_init, k_state = jax.random.split(key)
    theta0 = 0.1 * jax.random.normal(k_init, (n_chains, dim), jnp.float32)
    state = init_state(k_state, spec, make_metric("diagonal", dim), theta0,
                       init_eps=0.02)

    flags = adapt_flags(spec.adaptor, n_warmup, n_warmup + n_draws)
    warm_flags = jax.tree_util.tree_map(lambda a: a[:n_warmup], flags)
    draw_flags = jax.tree_util.tree_map(lambda a: a[n_warmup:], flags)

    @jax.jit
    def warmup(state):
        def body(st, f):
            new_st, stats = sample_step(spec, st, f)
            return new_st, stats["n_steps"]
        return jax.lax.scan(body, state, warm_flags)

    @jax.jit
    def draws(state):
        def body(st, f):
            new_st, stats = sample_step(spec, st, f)
            return new_st, (new_st.z.theta, stats["n_steps"])
        return jax.lax.scan(body, state, draw_flags)

    t0 = time.time()
    state, warm_steps = warmup(state)
    jax.block_until_ready(state.z.theta)
    t_warm = time.time() - t0

    # timed sampling phase (compile once via a separate trace happens inside)
    t0 = time.time()
    state, (thetas, n_steps) = draws(state)
    jax.block_until_ready(thetas)
    t_draw = time.time() - t0

    total_leapfrogs = float(np.asarray(n_steps, np.float64).sum())
    thetas_np = np.asarray(thetas)  # (n_draws, n_chains, dim)

    # Bulk ESS pooled over chains (subsample chains to bound host FFT cost)
    max_ess_chains = min(n_chains, 512)
    ess = np.asarray(
        effective_sample_size(jnp.asarray(thetas_np[:, :max_ess_chains, :]))
    )
    # scale pooled ESS to the full chain count
    ess_total = float(np.median(ess)) * (n_chains / max_ess_chains)
    ess_per_s = ess_total / t_draw
    lf_per_s = total_leapfrogs / t_draw

    result = {
        "metric": "effective_samples_per_s_per_chip",
        "value": round(ess_per_s, 2),
        "unit": "ESS/s/chip (NUTS, 100-D hierarchical logistic, "
                f"{n_chains} chains)",
        "vs_baseline": 1.0,
        "leapfrog_steps_per_s": round(lf_per_s, 1),
        "n_chains": n_chains,
        "n_draws": n_draws,
        "warmup_s": round(t_warm, 2),
        "sampling_s": round(t_draw, 2),
        "median_ess_per_chain_dim": round(float(np.median(ess)) / max_ess_chains, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
