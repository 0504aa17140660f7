"""Profile the fused NUTS draw loop on the real TPU and print hlo_stats.

Reproduces bench.py's setup (4096 chains, 100-D hierarchical logistic,
fused warmup) and traces ONE fused draw chunk. Parse step runs in-process
after the device is idle. Prints the top ops by self-time so hot-loop work
can be attributed (recipe from PERF.md "Profile-driven" section).

Usage (exclusive TPU): python scripts/profile_draws.py [logdir]
Env: same AHMC_BENCH_* overrides as bench.py.
"""

import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

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

    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_draws"
    n_chains = int(os.environ.get("AHMC_BENCH_CHAINS", 4096))
    dim = int(os.environ.get("AHMC_BENCH_DIM", 100))
    max_depth = int(os.environ.get("AHMC_BENCH_MAX_DEPTH", 8))
    chunk = int(os.environ.get("AHMC_BENCH_CHUNK", 128))
    fuse = int(os.environ.get("AHMC_BENCH_FUSE", 16))
    n_warmup = int(os.environ.get("AHMC_BENCH_WARMUP", 128))

    target = hierarchical_logistic(n=1000, p=dim - 1, dtype=jnp.float32)
    kernel = HMCKernel(Trajectory(
        Leapfrog(step_size=jnp.asarray(0.05, jnp.float32)),
        GeneralisedNoUTurn(max_depth=max_depth), "multinomial",
    ))
    spec = SampleSpec(target=target, kernel=kernel,
                      adaptor=AdaptorConfig(kind="stan", da=DualAveragingConfig(
        delta=float(os.environ.get("AHMC_BENCH_DELTA", 0.6)))), cross_chain=True)

    key = jax.random.PRNGKey(0)
    k_init, k_eps, k_state = jax.random.split(key, 3)
    theta0 = 0.1 * jax.random.normal(k_init, (n_chains, dim), jnp.float32)
    h0 = Hamiltonian(metric=make_metric("diagonal", dim), target=target)
    eps0 = float(jax.jit(find_good_stepsize)(k_eps, h0, theta0[0]))
    state = init_state(k_state, spec, make_metric("diagonal", dim), theta0,
                       init_eps=eps0)

    flags_all = adapt_flags(spec.adaptor, n_warmup, n_warmup + chunk)
    fl = jax.tree_util.tree_map(lambda a: a[:n_warmup], flags_all)

    @jax.jit
    def warm(state, fl):
        st, _, _ = fused_warmup_phase_crosschain(spec, state, n_warmup, 8,
                                                 flags=fl)
        return st

    pair = os.environ.get("AHMC_BENCH_PAIR", "1") == "1"

    @jax.jit
    def draws(state):
        st, thetas, stats = fused_draw_phase(spec, state, chunk, fuse,
                                             pair=pair)
        return st, thetas, stats["n_steps"]

    t0 = time.time()
    state = warm(state, fl)
    jax.block_until_ready(state.z.theta)
    print(f"# warmup done {time.time()-t0:.1f}s", file=sys.stderr)

    # compile + one untimed run
    state2, thetas, ns = draws(state)
    jax.block_until_ready(thetas)
    t0 = time.time()
    state3, thetas, ns = draws(state2)
    jax.block_until_ready(thetas)
    wall = time.time() - t0
    total_leaves = float(jnp.sum(ns))
    print(f"# chunk wall {wall:.2f}s  useful leaves {total_leaves:.0f} "
          f"({total_leaves/wall/1e6:.2f}M/s)", file=sys.stderr)

    with jax.profiler.trace(logdir):
        st4, thetas, ns = draws(state3)
        jax.block_until_ready(thetas)

    # ---- parse (device idle now) ----
    import glob
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _ = xspace_to_tool_data(paths, "hlo_stats", {})
    import csv
    import io
    rows = list(csv.reader(io.StringIO(data.decode()
                                       if isinstance(data, bytes) else data)))
    hdr = rows[0]
    print("# columns:", hdr, file=sys.stderr)
    icat = hdr.index("HLO Category") if "HLO Category" in hdr else None
    iname = hdr.index("HLO Expression") if "HLO Expression" in hdr else 1
    itime = None
    for cand in ("Total Time (us)", "total_time_us", "Avg. time (us)"):
        if cand in hdr:
            itime = hdr.index(cand)
            break
    if itime is None:
        # fall back: print raw first rows
        for r in rows[:40]:
            print(r)
        return
    body = [r for r in rows[1:] if len(r) == len(hdr)]
    body.sort(key=lambda r: -float(r[itime] or 0))
    tot = sum(float(r[itime] or 0) for r in body)
    print(f"\n== top ops by total time (sum {tot/1e6:.3f}s) ==")
    for r in body[:35]:
        frac = float(r[itime]) / tot * 100
        cat = r[icat] if icat is not None else ""
        expr = r[iname][:140]
        print(f"{float(r[itime])/1e3:9.2f} ms {frac:5.1f}%  {cat:16s} {expr}")


if __name__ == "__main__":
    main()
