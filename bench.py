"""Benchmark: many-chain NUTS on the 100-D hierarchical logistic model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Primary metric = effective samples / second / chip (bulk ESS pooled over all
chains, sampling-phase wall time, post-warmup). The reference publishes no
absolute numbers (BASELINE.md), so vs_baseline is reported as 1.0.

Execution is chunked (host sync every `CHUNK` iterations) so no single device
program runs unboundedly long.

Env overrides: AHMC_BENCH_CHAINS, AHMC_BENCH_DRAWS, AHMC_BENCH_WARMUP,
AHMC_BENCH_DIM, AHMC_BENCH_MAX_DEPTH, AHMC_BENCH_CHUNK.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Multi-chip simulation: AHMC_BENCH_CPU_DEVICES=N benches the sharded path
# on N virtual CPU devices (the flag must land before the backend initialises).
_N_CPU = os.environ.get("AHMC_BENCH_CPU_DEVICES")
if _N_CPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_N_CPU}"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

if _N_CPU:
    # sitecustomize forces the axon TPU backend; override from inside.
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: remote compiles over the TPU tunnel take
# minutes; cache them across bench invocations.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


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

    # 32768 adopted r5: warmup pool sizing removed the only penalty of the
    # bigger pool (warmup no longer scales with chain count — the sub-pool
    # warms in ~0.8 s regardless), so 32k wins BOTH metrics: 5.21M ESS/s
    # draws / 3.70M end-to-end incl. warmup vs 4.98M / 3.3-3.7M at 16384
    # (PERF.md "warmup pool sizing"). Draw-phase throughput is flat in
    # chain count (chain-chunked dispatch); moments/min-dim/extrapolation
    # gates identical. 256 draws/chain keeps the wall at the 16k/512 level.
    n_chains = int(os.environ.get("AHMC_BENCH_CHAINS", 32768))
    n_draws = int(os.environ.get("AHMC_BENCH_DRAWS", 256))
    # 128 adopted in r3. NOTE at 128 iters Stan's 75/50 buffers leave no
    # complete window, so M⁻¹ stays at the gradient seed the whole warmup —
    # on this posterior that seed is already good enough that every quality
    # gate passes with kappa=0.8: accept 0.6165 (δ=0.6), moments == the
    # window-refreshed 256-iter run to 4 decimals, div 0, median ESS −3%,
    # ESS/s 3.47M (reproduced twice), warmup exec 1.07 s vs 1.67 s
    # (PERF.md "short warmup"). 256 restores the reference-faithful
    # windowed schedule.
    # The 128 default is tuned to the DEFAULT posterior only; other models
    # (funnel/gaussian/logistic_nc) have not validated the seed-metric
    # shortcut, so they keep the reference-faithful 256-iter windowed
    # schedule unless AHMC_BENCH_WARMUP is set explicitly.
    _warmup_default = 128 if os.environ.get(
        "AHMC_BENCH_MODEL", "logistic") == "logistic" else 256
    n_warmup = int(os.environ.get("AHMC_BENCH_WARMUP", _warmup_default))
    dim = int(os.environ.get("AHMC_BENCH_DIM", 100))
    # depth 6 swept optimal at δ=0.6 (mean tree depth ~2.8; the cap trims
    # the rare deep trajectories that set the fused block's max-over-chains
    # iteration count): 4→2.18M, 5→2.42M, 6→2.54M, 8→2.13M ESS/s with
    # identical posterior moments and min-dim ESS (PERF.md).
    max_depth = int(os.environ.get("AHMC_BENCH_MAX_DEPTH", 6))
    # chunk 256 = 2 dispatches for 512 draws: +10% ESS/s vs chunk=128 (4
    # dispatches; tunnel dispatch latency is ~25 ms/call and only partially
    # pipelined). 512 (1 dispatch) measured identical; 256 keeps single
    # executions well under the tunnel's ~2-minute limit.
    chunk = int(os.environ.get("AHMC_BENCH_CHUNK", 256))
    chunk = min(chunk, n_draws)  # small-shape runs: never overrun the draws
    fuse = int(os.environ.get("AHMC_BENCH_FUSE", 16))
    unroll = int(os.environ.get("AHMC_BENCH_UNROLL", 1))
    # warmup fuse block 8: DA stays calibrated (accept 0.802 @ delta 0.8,
    # 0.591 @ 0.6) while warmup wall drops ~2.4x vs the synchronised scan.
    # Block 16 diverges at delta=0.6 (the once-per-block dual-averaging
    # update overshoots eps: accept 0, divergence rate 25%) — measured BOTH
    # from the start AND when switched to only after n_warmup/2 via
    # AHMC_BENCH_FUSE_WARMUP_LATE (eps 0.59 → 1.23 within 8 late blocks):
    # one block-mean-α DA observation per 16 stale-eps transitions is
    # intrinsically unstable at this target. Do not raise.
    fuse_warmup = int(os.environ.get("AHMC_BENCH_FUSE_WARMUP", 8))
    fuse_warmup_late = int(os.environ.get("AHMC_BENCH_FUSE_WARMUP_LATE", 0))
    # Early-warmup tree-depth cap: warmup runs 16.7 leaves/transition vs ~7
    # in draws (eps/metric still equilibrating → trees near the depth cap),
    # so capping depth for the first AHMC_BENCH_FW_SWITCH iterations trims
    # the dominant warmup cost. 0 = off.
    early_depth = int(os.environ.get("AHMC_BENCH_EARLY_DEPTH", 0))
    # Transient-gated depth cap (per-transition traced cap inside ONE fused
    # warmup program): cap only the first TCAP_INIT iterations and the
    # TCAP_POST iterations after each Stan window reset — the DA-transient
    # deep-tree episodes that dominate warmup wall — leaving the equilibrium
    # phases (which set the final eps/metric) at full depth. 0 = off.
    tcap = int(os.environ.get("AHMC_BENCH_TCAP", 0))
    tcap_init = int(os.environ.get("AHMC_BENCH_TCAP_INIT", 40))
    tcap_post = int(os.environ.get("AHMC_BENCH_TCAP_POST", 16))

    model = os.environ.get("AHMC_BENCH_MODEL", "logistic")
    if model == "gaussian":
        from advancedhmc_tpu.models import std_gaussian

        target = std_gaussian(dim)
    elif model == "funnel":
        # VALIDATION.md config 3 shape: pair with AHMC_BENCH_DELTA=0.95
        # (the neck is under-explored below that)
        from advancedhmc_tpu.models import neal_funnel

        target = neal_funnel(dim)
    elif model == "logistic_nc":
        # non-centered reparameterization of the default hierarchy: same
        # posterior (log σ marginal identical); draws are transformed back
        # to the centered (log σ, β = σ·β̃) coordinates before ESS/moments
        # so every reported number is directly comparable to `logistic`.
        from advancedhmc_tpu.models import hierarchical_logistic_nc

        target = hierarchical_logistic_nc(n=1000, p=dim - 1,
                                          dtype=jnp.float32)
    else:
        # bf16 design matrix DEFAULT-ON at dim ≥ 512 (r5; VERDICT r4 next
        # #4): +5.5% at dim 1000 (PERF.md dim-1000 table), and every run
        # with it active self-validates via the importance-reweighting
        # posterior-equivalence gate below (bf16x_* extras, hard-gated;
        # CPU twin in tests/test_bf16_design.py). Set AHMC_BENCH_X_DTYPE
        # =float32 to disable explicitly.
        _x_env = os.environ.get("AHMC_BENCH_X_DTYPE", "")
        # (XLA-CPU has no bf16 dot — the default applies on accelerators)
        x_dtype = (_x_env or (
            "bfloat16" if dim >= 512 and jax.default_backend() != "cpu"
            else None))
        if x_dtype in ("float32", "f32", "none"):
            x_dtype = None
        target = hierarchical_logistic(
            n=1000, p=dim - 1, dtype=jnp.float32,
            resid_dtype=os.environ.get("AHMC_BENCH_RESID_DTYPE") or None,
            x_dtype=x_dtype,
            # one-pass Pallas likelihood (ops/fused_logistic): logits stay
            # in VMEM between fwd and bwd. Re-measurable per round — the
            # r4 profile shows the elementwise likelihood tail is the
            # bandwidth-bound piece of the pair loop.
            fused=os.environ.get("AHMC_BENCH_FUSED_LIK", "0") == "1",
        )

    # nutpie-style gradient-seeded M⁻¹: warmup 8.5s → 3.4s at bench shape
    # with unchanged ESS quality (PERF.md); AHMC_BENCH_MM_INIT=identity
    # restores the reference's I-initialised metric.
    mm_init = os.environ.get("AHMC_BENCH_MM_INIT", "gradient")
    kernel = HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.05, jnp.float32)),
            GeneralisedNoUTurn(max_depth=max_depth),
            "multinomial",
            stack_dtype=os.environ.get("AHMC_BENCH_STACK_DTYPE") or None,
        )
    )
    from advancedhmc_tpu.adaptation import DualAveragingConfig

    # δ=0.55 adopted r4 (re-swept under the leaf-pair loop, which halved
    # per-leaf bookkeeping and moved the optimum down from r2's 0.6):
    # 0.55→4.95M, 0.6→4.76M, 0.65→4.64M ESS/s; median pooled ESS 307k vs
    # 303k at 0.6 (no estimator falloff), min-dim 0.85M, div 0, accept
    # lands 0.626. The r2 "δ≤0.55 falls off a cliff" result no longer holds
    # at the new cost structure. Posterior moments match δ=0.8/0.9 to 4
    # decimals; see PERF.md "Leaf-pair loop".
    delta = float(os.environ.get("AHMC_BENCH_DELTA", 0.55))
    # Stan window-schedule buffers (ref stan_adaptor.jl:105-115 defaults);
    # short-warmup runs can shrink them so the metric still gets window
    # refreshes (e.g. WARMUP=160 INIT_BUFFER=50 TERM_BUFFER=35).
    # mass-matrix estimator (VERDICT r2 #5: nutpie at bench probes the
    # min-dim bottleneck). nutpie needs gradient recording, which the
    # cross-chain FUSED warmup does not do — fall back to the scan warmup.
    mm_kind = os.environ.get("AHMC_BENCH_MM_KIND", "welford_var")
    spec = SampleSpec(
        target=target,
        kernel=kernel,
        adaptor=AdaptorConfig(
            kind="stan",
            mm_kind=mm_kind,
            # kappa=0.8 adopted for the 128-iter warmup (r3 sweep): at 128
            # iters the raw DA controller still sits BELOW the equilibrium ε
            # (deep descent), so Stan's κ=0.75 finalize average weights the
            # late small-ε iterates too much → accept 0.643 vs δ=0.6.
            # LARGER κ discounts them: 0.8 → accept 0.6165 ✓ (0.85 → 0.580;
            # 1.0 overshoots to 0.38; smaller κ moves the WRONG way:
            # 0.6 → 0.682). Full table in PERF.md.
            da=DualAveragingConfig(
                delta=delta,
                kappa=float(os.environ.get("AHMC_BENCH_DA_KAPPA", 0.8)),
            ),
            init_buffer=int(os.environ.get("AHMC_BENCH_INIT_BUFFER", 75)),
            term_buffer=int(os.environ.get("AHMC_BENCH_TERM_BUFFER", 50)),
            window_size=int(os.environ.get("AHMC_BENCH_WINDOW_SIZE", 25)),
        ),
        cross_chain=True,
    )

    key = jax.random.PRNGKey(int(os.environ.get("AHMC_BENCH_SEED", 0)))
    k_init, k_eps, k_state = jax.random.split(key, 3)
    theta0 = 0.1 * jax.random.normal(k_init, (n_chains, dim), jnp.float32)

    # Warmup pool sizing (r5; VERDICT r4 next #1): cross-chain adaptation
    # pools Welford/DA statistics over the whole batch, so (ε, M⁻¹)
    # saturate at ~4096 chains while the warmup WALL scales with the pool
    # (chain-chunked dispatch is sequential). Warm a 4096-chain sub-pool,
    # then fan the warmed state out (sampler.fanout_warmup_state) and run
    # AHMC_BENCH_FANOUT_DECOR discarded decorrelation transitions — both
    # counted inside warmup_s. Quality is hard-gated by the subsample-ESS
    # extrapolation check (clone correlation would show up there) plus the
    # usual moment gates. 0 disables (warm the full pool).
    _wc_default = 4096 if n_chains > 4096 else 0
    warmup_chains = int(os.environ.get("AHMC_BENCH_WARMUP_CHAINS",
                                       _wc_default)) or n_chains
    warmup_chains = min(warmup_chains, n_chains)
    fanout_decor = int(os.environ.get("AHMC_BENCH_FANOUT_DECOR", 32))
    use_fanout = warmup_chains < n_chains and n_warmup > 0

    # eps search runs INSIDE init_state so it sees the (possibly
    # gradient-seeded) metric — an identity-metric eps is ~2.7× too small
    # for the seeded M⁻¹ at bench shape, and every warmup transition before
    # dual averaging corrects it runs trees 1-2 doublings too deep.
    state = init_state(k_state, spec, make_metric("diagonal", dim),
                       theta0[:warmup_chains] if use_fanout else theta0,
                       init_mass_matrix=mm_init)
    eps0 = float(state.adapt.da.eps)
    print(f"# init step size: {eps0:.4f}", file=sys.stderr)

    # Multi-chip: shard the chain axis over all devices (ICI collectives for
    # the cross-chain adaptation reductions are inserted by XLA). Per-host
    # throughput is reported alongside per-chip.
    n_devices = jax.device_count()
    if n_devices > 1:
        from advancedhmc_tpu.parallel.mesh import (
            mesh_of_all_devices,
            shard_hmc_state,
        )

        assert n_chains % n_devices == 0, (
            "chain count must divide the device count"
        )
        mesh = mesh_of_all_devices()
        state = shard_hmc_state(state, mesh,
                                per_chain_adapt=not spec.cross_chain)
        print(f"# sharding {n_chains} chains over {n_devices} devices",
              file=sys.stderr)

    flags_all = adapt_flags(spec.adaptor, n_warmup, n_warmup + n_draws)
    if tcap and tcap < max_depth:
        from advancedhmc_tpu.adaptation import transient_depth_caps

        caps_warm = transient_depth_caps(
            n_warmup, max_depth, tcap, tcap_init, tcap_post,
            spec.adaptor.init_buffer, spec.adaptor.term_buffer,
            spec.adaptor.window_size,
        )
        caps_all = np.full(n_warmup + n_draws, max_depth, np.int32)
        caps_all[:n_warmup] = caps_warm
        flags_all = dict(flags_all, depth_caps=caps_all)
        print(f"# transient depth cap {tcap}: "
              f"{int((caps_warm < max_depth).sum())}/{n_warmup} warmup "
              f"iterations capped", file=sys.stderr)

    def chunk_flags(start, size):
        return jax.tree_util.tree_map(lambda a: a[start:start + size], flags_all)

    @jax.jit
    def run_chunk(state, flags):
        def body(st, f):
            new_st, stats = sample_step(spec, st, f)
            return new_st, stats["n_steps"]
        return jax.lax.scan(body, state, flags)

    from advancedhmc_tpu.sampler import fused_draw_phase

    @jax.jit
    def run_chunk_collect(state, flags):
        def body(st, f):
            new_st, stats = sample_step(spec, st, f)
            return new_st, (new_st.z.theta, stats["n_steps"])
        return jax.lax.scan(body, state, flags)

    stage = int(os.environ.get("AHMC_BENCH_STAGE", 0))

    out_dtype = os.environ.get("AHMC_BENCH_OUT_DTYPE") or None
    # packed while-loop carry experiment: "fc" = (NF, C) field-major,
    # "cf" = (C, NF) chain-major (see nuts._packed_while_loop)
    pack_carry = os.environ.get("AHMC_BENCH_PACK", "")

    # Variable-draws-per-chain collection (AHMC_BENCH_RAGGED = buffer-capacity
    # factor > 1, e.g. 1.5): every chain completes ≥ `chunk` transitions per
    # dispatch and fast chains keep sampling up to chunk·factor instead of
    # idling — the dispatch wall is unchanged (slowest chain to `chunk`), the
    # extra draws are free ESS. Uses the count-weighted ragged estimators.
    ragged = float(os.environ.get("AHMC_BENCH_RAGGED", 0) or 0)
    use_ragged = ragged > 1.0
    t_max_r = int(round(chunk * ragged))

    # Leaf-pair draw loop (nuts.py body_pair): two leaves per while-loop
    # iteration, per-leaf bookkeeping halved. 1 = on (r4 default), 0 = off.
    pair = os.environ.get("AHMC_BENCH_PAIR", "1") == "1"
    # Chain-chunked draws (VMEM-spill mitigation): S sequential sub-batches
    # of ≤4096 chains inside each dispatch; the stream is bit-identical.
    # Measured r4: 8192 chains 1.66M→3.48M ESS/s (chunks=2), 16384 chains
    # 3.51M (chunks=4) — the spill cliff is gone and throughput holds flat
    # at the 4096-chain rate (leapfrog/s 21.3-21.5M in all cases).
    chain_chunks = int(os.environ.get(
        "AHMC_BENCH_CHAIN_CHUNKS", max(1, n_chains // 4096)))

    @jax.jit
    def run_chunk_fused(state):
        from advancedhmc_tpu.experimental import Experimental
        new_st, thetas, stats = fused_draw_phase(
            spec, state, chunk, fuse, unroll=unroll,
            experimental=Experimental(out_dtype=out_dtype, stage_slots=stage,
                                      pack_carry=pack_carry),
            chain_chunks=chain_chunks, pair=pair)
        return new_st, (thetas, stats["n_steps"],
                        jnp.sum(stats["numerical_error"]),
                        jnp.mean(stats["acceptance_rate"]))

    fuse_decor = max(1, min(fuse, fanout_decor))
    fanout_decor -= fanout_decor % fuse_decor  # block-aligned

    @jax.jit
    def run_chunk_decor(state):
        new_st, _, stats = fused_draw_phase(
            spec, state, max(fanout_decor, fuse_decor), fuse_decor,
            chain_chunks=chain_chunks, pair=pair)
        return new_st, jnp.sum(stats["n_steps"])

    from advancedhmc_tpu.experimental import fused_draw_phase_ragged

    @jax.jit
    def run_chunk_ragged(state):
        new_st, thetas, counts, stats = fused_draw_phase_ragged(
            spec, state, t_max_r, chunk, out_dtype=out_dtype
        )
        valid = jnp.arange(t_max_r)[None, :] < counts[:, None]
        return new_st, (thetas, counts, stats["n_steps"],
                        jnp.sum(stats["numerical_error"]),
                        jnp.sum(stats["acceptance_rate"] * valid),
                        jnp.sum(valid))

    # --- warmup (chunked, untimed beyond wall) ---
    use_fw = (fuse_warmup > 1 and n_warmup % fuse_warmup == 0
              and mm_kind != "nutpie")
    if use_fw:
        import functools

        from advancedhmc_tpu.sampler import fused_warmup_phase_crosschain

        spec_early = spec
        if early_depth and early_depth < max_depth:
            kernel_early = HMCKernel(
                Trajectory(
                    Leapfrog(step_size=jnp.asarray(0.05, jnp.float32)),
                    GeneralisedNoUTurn(max_depth=early_depth),
                    "multinomial",
                    stack_dtype=os.environ.get("AHMC_BENCH_STACK_DTYPE")
                    or None,
                )
            )
            spec_early = SampleSpec(
                target=target, kernel=kernel_early, adaptor=spec.adaptor,
                cross_chain=True,
            )

        warm_cc = max(1, warmup_chains // 4096)

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def run_warm_chunk(state, fl, block, early=False):
            fl = dict(fl)
            caps = fl.pop("depth_caps", None)
            st, _, wstats = fused_warmup_phase_crosschain(
                spec_early if early else spec, state,
                fl["is_adapt"].shape[0], block, flags=fl, depth_caps=caps,
                pair=pair, chain_chunks=warm_cc,
            )
            return st, jnp.sum(wstats["n_steps"])

    fw_switch = int(os.environ.get("AHMC_BENCH_FW_SWITCH", n_warmup // 2))
    # 3-phase schedule (NEXT.md #3): keep the depth cap PAST the eps
    # re-anchor so the DA descent's deep-tree episodes are bounded too;
    # full depth only for the last (n_warmup - FW_SWITCH2) iterations.
    # 0 = off (2-phase: cap ends at FW_SWITCH).
    fw_switch2 = int(os.environ.get("AHMC_BENCH_FW_SWITCH2", 0))
    # At the capped→full-depth switch, re-run the Stan init step-size search
    # on the CURRENT (window-adapted) metric and re-anchor dual averaging at
    # the result — the capped-tree DA equilibrium is far from the full-depth
    # one (measured eps 0.30 vs 0.64) and the term buffer alone cannot
    # recover from a bad anchor. CAVEAT: the post-switch phase must be long
    # enough (≥~50 iterations) to absorb the mu=log(10·eps) re-anchor
    # transient — with 16-32 late iterations DA finalizes mid-transient and
    # the draws diverge (measured at FW_SWITCH=224/256 and on small smokes).
    eps_research = os.environ.get("AHMC_BENCH_EPS_RESEARCH") == "1"
    # Scale on the re-anchor. Default 1.0: the one-leapfrog search lands
    # ABOVE the full-trajectory DA equilibrium (0.90 vs 0.647 on the adapted
    # metric) and that is the stable interaction with Stan's mu = log(10·ε)
    # shrinkage anchor — from an overestimate, α < δ pulls ε down in a
    # controlled descent. Re-anchoring AT the equilibrium (scale 0.7)
    # measured WORSE: α ≈ δ makes H̄ ≈ 0 and the first DA iterates jump ε
    # toward exp(mu) = 10× the anchor (warmup 5.75s vs 4.5s, accept 0.584).
    eps_rescale = float(os.environ.get("AHMC_BENCH_EPS_RESEARCH_SCALE", 1.0))
    warm_leapfrogs = 0.0
    t0 = time.time()
    if use_fw:
        from advancedhmc_tpu import Hamiltonian
        from advancedhmc_tpu.adaptation.stepsize import DualAveragingState
        from advancedhmc_tpu.stepsize_search import find_good_stepsize

        @jax.jit
        def research_eps(state):
            h_now = Hamiltonian(metric=state.metric, target=spec.target)
            k_eps2 = jax.random.fold_in(state.key, 7)
            return find_good_stepsize(k_eps2, h_now, state.z.theta[0])

        cap_end = fw_switch2 if fw_switch2 > fw_switch else fw_switch

        # Precompute the (pos, size, block, early) dispatch schedule so the
        # compile + first-execution program-load cost can be paid OUTSIDE
        # the timed window (same methodology as the draws phase below).
        schedule = []
        pos = 0
        while pos < n_warmup:
            early = bool(early_depth) and pos < cap_end
            block = (fuse_warmup_late
                     if fuse_warmup_late > 1 and pos >= fw_switch
                     else fuse_warmup)
            wchunk = block * max(1, chunk // block)
            size = min(wchunk, n_warmup - pos)
            # Stop at a phase boundary only when something actually changes
            # there (depth cap end, eps re-anchor, late-block switch) — an
            # unconditional clamp at fw_switch used to interact with the
            # block rounding below to produce size=0 and an infinite loop
            # whenever chunk < fuse_warmup (e.g. small-shape smokes).
            stops = set()
            if early_depth:
                stops.add(cap_end)
                if eps_research:
                    stops.add(fw_switch)
            if fuse_warmup_late > 1:
                stops.add(fw_switch)
            for boundary in stops:
                if pos < boundary:
                    size = min(size, boundary - pos)
            size -= size % block
            if size <= 0:
                # boundary not block-aligned: overrun it by one block rather
                # than stall (n_warmup % block == 0 guarantees headroom)
                size = block
            schedule.append((pos, size, block, early))
            pos += size

        # Throwaway executions: one per distinct compiled program. Warmup
        # wall used to jitter ±0.8 s run-to-run purely from program-load /
        # data-upload over the tunnel on the FIRST execution (PERF.md);
        # paying it here makes warmup_s an execution measurement with the
        # same semantics as sampling_s. Results are discarded — the timed
        # loop below restarts from `state`.
        #
        # r5 (VERDICT r4 next #1c): the throwaway runs the SAME compiled
        # program on a divergent-step-size clone of the state (ε=1e4 —
        # every leapfrog diverges at its first leaf, so each transition is
        # one loop iteration instead of ~17 leaves). Program load is a
        # property of the executable, not the data, so this pays the full
        # load/upload cost at ~1/10 the execution cost of a real warmup —
        # warmup_load_s drops from ~3.1 s to ~1 s at bench shape.
        # AOT program artifacts (NEXT #2): AHMC_BENCH_AOT=1 replaces the
        # Python trace of each warm-chunk program with a jax.export
        # artifact cached under AHMC_AOT_DIR (default /tmp/ahmc_aot_cache)
        # — repeat runs deserialize StableHLO in ~ms instead of re-tracing
        # (~1.9 s at bench shape, PERF.md "Program-load floor"). The cache
        # signature covers avals + jax version + device kind; the
        # program-identity fingerprint below additionally covers every
        # AHMC_BENCH_* knob, the core config tuple, and the mtime/size of
        # bench.py + every package source file, so ANY code or config edit
        # re-traces rather than aliasing a stale artifact. Cache-hit calls
        # replay the original trace's StableHLO (bitwise semantics pinned
        # by tests/test_aot.py).
        use_aot = os.environ.get("AHMC_BENCH_AOT", "0") == "1"
        aot_calls = {}
        if use_aot:
            import hashlib as _hashlib
            import pathlib as _pathlib

            from advancedhmc_tpu.aot import aot_program

            import advancedhmc_tpu as _ahmc

            _pkg = _pathlib.Path(_ahmc.__file__).parent
            _src = "".join(
                f"{p.relative_to(_pkg)}:{p.stat().st_mtime_ns}:"
                f"{p.stat().st_size};"
                for p in sorted(_pkg.rglob("*.py")))
            _me = _pathlib.Path(__file__)
            _src += f"bench:{_me.stat().st_mtime_ns}:{_me.stat().st_size}"
            _env = repr(sorted((k, v) for k, v in os.environ.items()
                               if k.startswith("AHMC_BENCH_")))
            _cfg = repr((model, dim, n_chains, n_warmup, delta, max_depth,
                         pair, warm_cc, mm_kind, mm_init))
            aot_fp = _hashlib.sha256(
                (_src + _env + _cfg).encode()).hexdigest()[:16]

        if os.environ.get("AHMC_BENCH_WARM_THROWAWAY", "1") == "1":
            state_div = state.replace(adapt=state.adapt.replace(
                da=DualAveragingState.init(
                    jnp.full_like(state.adapt.da.eps, 1e4))))

            def _frozen_flags(fl):
                # all-False adaptation flags (same shapes/dtypes → same
                # executable): without this, dual averaging corrects the
                # divergent ε within a few blocks and the throwaway tail
                # runs DEEP trees — measured 8.4 s vs ~1 s frozen.
                return {k: (jnp.zeros_like(v) if v.dtype == bool else v)
                        for k, v in fl.items()}

            seen = set()
            for pos0, size, block, early in schedule:
                sig = (size, block, early)
                if sig in seen:
                    continue
                seen.add(sig)
                fl_ex = _frozen_flags(chunk_flags(pos0, size))
                if use_aot:
                    t_tr = time.time()
                    try:
                        call, src = aot_program(
                            lambda s, f, _b=block, _e=early:
                                run_warm_chunk(s, f, _b, _e),
                            (state_div, fl_ex),
                            program_id=(f"warm_chunk/{aot_fp}/"
                                        f"{size}/{block}/{early}"),
                            verbose=True)
                    except Exception as e:  # e.g. platform unsupported
                        print(f"# aot: export failed ({e!r}); falling "
                              "back to jit", file=sys.stderr)
                        use_aot = False
                    else:
                        aot_calls[sig] = call
                        t_ex = time.time()
                        jax.block_until_ready(call(state_div, fl_ex))
                        print(f"# warm program {sig}: aot[{src}] "
                              f"{t_ex-t_tr:.1f}s "
                              f"first-exec {time.time()-t_ex:.1f}s",
                              file=sys.stderr)
                        continue
                t_tr = time.time()
                lowered = run_warm_chunk.lower(
                    state_div, fl_ex, block, early)
                t_co = time.time()
                compiled = lowered.compile()
                t_ex = time.time()
                jax.block_until_ready(compiled(state_div, fl_ex))
                print(f"# warm program {sig}: trace {t_co-t_tr:.1f}s "
                      f"compile/load {t_ex-t_co:.1f}s "
                      f"first-exec {time.time()-t_ex:.1f}s",
                      file=sys.stderr)
            if eps_research and early_depth:
                jax.block_until_ready(research_eps(state))
            if use_fanout and fanout_decor > 0 and n_devices == 1:
                # pre-pay the decorrelation program's compile/load too
                from advancedhmc_tpu import fanout_warmup_state as _fan

                jax.block_until_ready(run_chunk_decor(
                    _fan(spec, state_div, n_chains)))
            warm_load_s = time.time() - t0
            print(f"# warmup programs loaded ({warm_load_s:.1f}s)",
                  file=sys.stderr)
        else:
            warm_load_s = 0.0

        t0 = time.time()
        for pos0, size, block, early in schedule:
            if (eps_research and early_depth and pos0 == fw_switch
                    and pos0 > 0):
                eps_new = research_eps(state) * eps_rescale
                state = state.replace(adapt=state.adapt.replace(
                    da=DualAveragingState.init(eps_new)))
                print(f"# re-anchored eps at switch: {float(eps_new):.4f}",
                      file=sys.stderr)
            runner = aot_calls.get((size, block, early))
            if runner is not None:
                state, wlf = runner(state, chunk_flags(pos0, size))
            else:
                state, wlf = run_warm_chunk(state, chunk_flags(pos0, size),
                                            block, early)
            jax.block_until_ready(state.z.theta)
            warm_leapfrogs += float(wlf)
            eps_now = float(jnp.mean(state.adapt.da.eps))
            print(f"# fused warmup {pos0}/{n_warmup} block={block} "
                  f"eps={eps_now:.4f} leapfrogs={warm_leapfrogs:.3g} "
                  f"({time.time()-t0:.1f}s)",
                  file=sys.stderr)
    else:
        warm_load_s = 0.0
        for start in range(0, n_warmup, chunk):
            state, _ = run_chunk(state, chunk_flags(start, chunk))
            jax.block_until_ready(state.z.theta)
            if start % (chunk * 4) == 0:
                eps_now = float(jnp.mean(state.adapt.da.eps))
                print(f"# warmup {start}/{n_warmup} eps={eps_now:.4f} "
                      f"({time.time()-t0:.0f}s)", file=sys.stderr)

    # --- fan the warmed sub-pool out to the full chain count + short
    # discarded decorrelation run (both inside the warmup wall) ---
    if use_fanout:
        from advancedhmc_tpu import fanout_warmup_state

        state = fanout_warmup_state(spec, state, n_chains)
        if n_devices > 1:
            state = shard_hmc_state(state, mesh,
                                    per_chain_adapt=not spec.cross_chain)
        if fanout_decor > 0:
            state, dlf = run_chunk_decor(state)
            jax.block_until_ready(state.z.theta)
            warm_leapfrogs += float(dlf)
        print(f"# fanout {warmup_chains}->{n_chains} chains, "
              f"{fanout_decor} decorrelation transitions "
              f"({time.time()-t0:.1f}s)", file=sys.stderr)
    t_warm = time.time() - t0

    # --- timed sampling phase (pre-compile excluded from timing) ---
    # One throwaway execution after compile: on a fresh process the first
    # executions over the tunnel pay program-load/data-upload costs (measured
    # 1.9x on the whole timed window with a cold cache); the result is
    # discarded so the timed loop still starts from `state`. As in the
    # warmup throwaway, a divergent-ε clone makes the load execution ~10×
    # cheaper than a real chunk (same executable, 1-leaf trees).
    from advancedhmc_tpu.adaptation.stepsize import (
        DualAveragingState as _DAS,
    )

    state_div = state.replace(adapt=state.adapt.replace(
        da=_DAS.init(jnp.full_like(state.adapt.da.eps, 1e4))))
    if use_ragged:
        run_chunk_ragged.lower(state).compile()
        jax.block_until_ready(run_chunk_ragged(state_div))
    elif fuse > 1:
        run_chunk_fused.lower(state).compile()
        jax.block_until_ready(run_chunk_fused(state_div))
    else:
        run_chunk_collect.lower(state, chunk_flags(n_warmup, chunk)).compile()
        jax.block_until_ready(
            run_chunk_collect(state_div, chunk_flags(n_warmup, chunk)))
    thetas_chunks = []
    steps_chunks = []
    div_chunks = []
    acc_chunks = []
    counts_chunks = []
    nvalid_chunks = []
    t0 = time.time()
    for start in range(n_warmup, n_warmup + n_draws, chunk):
        if use_ragged:
            state, (th, cnt, ns, ndiv, accs, nv) = run_chunk_ragged(state)
            counts_chunks.append(cnt)
            div_chunks.append(ndiv)
            acc_chunks.append(accs)
            nvalid_chunks.append(nv)
        elif fuse > 1:
            state, (th, ns, ndiv, acc) = run_chunk_fused(state)
            div_chunks.append(ndiv)
            acc_chunks.append(acc)
        else:
            state, (th, ns) = run_chunk_collect(state, chunk_flags(start, chunk))
        thetas_chunks.append(th)
        steps_chunks.append(ns)
    jax.block_until_ready(thetas_chunks[-1])
    t_draw = time.time() - t0

    total_leapfrogs = float(sum(np.asarray(s, np.float64).sum()
                                for s in steps_chunks))
    max_ess_chains = min(n_chains, 512)

    def _slot_accounting(ns_arrays, widths=(1, 2, 4)):
        """Exact W-slot loop iteration counts from the measured per-
        transition useful-leaf counts (PERF.md roofline note). A W-slot
        body may not straddle doublings (the pair invariant), so a
        transition with L useful leaves visits doublings of sizes
        1, 2, 4, ... with a possibly-partial last one; each contributes
        ceil(part/W) iterations."""
        ns = np.concatenate([np.asarray(s).ravel() for s in ns_arrays])
        ns = ns[ns > 0].astype(np.int64)
        out = {}
        for w in widths:
            iters = np.zeros_like(ns)
            rem = ns.copy()
            size = 1
            while (rem > 0).any():
                part = np.minimum(rem, size)
                iters += -(-part // w)          # ceil
                rem -= part
                size *= 2
            out[w] = float(iters.sum())
        return float(ns.sum()), out

    extras = {}
    if use_ragged:
        from advancedhmc_tpu.diagnostics import effective_sample_size_ragged

        cnts = [np.asarray(c, np.int64) for c in counts_chunks]
        total_c = np.sum(np.stack(cnts), axis=0)            # (C,)
        n_transitions_total = int(total_c.sum())
        div_rate = (sum(float(np.asarray(d)) for d in div_chunks)
                    / n_transitions_total)
        accept_mean = (sum(float(np.asarray(a)) for a in acc_chunks)
                       / sum(float(np.asarray(v)) for v in nvalid_chunks))
        # count-weighted moments over ALL chains (equal-weight pooling over
        # the raw buffers would bias toward small-tree regions)
        s_ls = s_ls2 = 0.0
        beta_sum = np.zeros(dim - 1, np.float64)
        sub = max_ess_chains
        x_sub = np.zeros((sub, int(total_c[:sub].max()), dim), np.float32)
        off = np.zeros(sub, np.int64)
        for th, cnt in zip(thetas_chunks, cnts):
            th = np.asarray(th)
            if model == "logistic_nc":
                th = np.concatenate(
                    [th[..., :1], th[..., 1:] * np.exp(th[..., :1])], -1)
            tk = th.shape[1]
            valid = np.arange(tk)[None, :] < cnt[:, None]    # (C, tk)
            s_ls += float((th[:, :, 0] * valid).sum(dtype=np.float64))
            s_ls2 += float((th[:, :, 0] ** 2 * valid).sum(dtype=np.float64))
            beta_sum += (th[:, :, 1:] * valid[..., None]).sum(
                (0, 1), dtype=np.float64
            )
            rows, cols_l = np.nonzero(valid[:sub])
            x_sub[rows, off[rows] + cols_l] = th[:sub][rows, cols_l]
            off += cnt[:sub]
        mean_ls = s_ls / n_transitions_total
        sd_ls = float(np.sqrt(s_ls2 / n_transitions_total - mean_ls**2))
        mean_beta_norm = float(np.linalg.norm(beta_sum / n_transitions_total))
        ess = np.asarray(effective_sample_size_ragged(
            jnp.asarray(x_sub), jnp.asarray(off)))
        ess_total = float(np.median(ess)) * (n_chains / sub)
        min_ess_total = float(np.min(ess)) * (n_chains / sub)
        extras = {
            "ragged_factor": ragged,
            "draws_per_chain_mean": round(float(total_c.mean()), 2),
            "draws_per_chain_min": int(total_c.min()),
            "collected_vs_rect": round(n_transitions_total
                                       / (n_draws * n_chains), 4),
        }
    else:
        thetas_np = np.concatenate([np.asarray(t) for t in thetas_chunks],
                                   axis=0)
        if model == "logistic_nc":
            # back to centered user coordinates (β = σ·β̃) so ESS/moments are
            # comparable with the `logistic` runs
            thetas_np = np.concatenate(
                [thetas_np[..., :1],
                 thetas_np[..., 1:] * np.exp(thetas_np[..., :1])], -1)
        n_transitions_total = n_draws * n_chains
        div_rate = (sum(float(np.asarray(d)) for d in div_chunks)
                    / n_transitions_total if div_chunks else float("nan"))
        accept_mean = (float(np.mean([float(np.asarray(a))
                                      for a in acc_chunks]))
                       if acc_chunks else float("nan"))
        mean_ls = float(thetas_np[:, :, 0].mean())
        sd_ls = float(thetas_np[:, :, 0].std())
        mean_beta_norm = float(np.linalg.norm(
            thetas_np[:, :, 1:].mean((0, 1))))

        # --- bf16-X posterior-equivalence gate (hardware side; VERDICT r4
        # next #4). The rounded design matrix is a data perturbation; gate
        # statistical exchangeability by importance reweighting the sampled
        # (bf16-X) posterior to the exact-X one: sd(log w) ≪ 1 and
        # reweighting ESS fraction ≈ 1, else fail loudly (same pattern as
        # the ESS-extrapolation gate). CPU twin: tests/test_bf16_design.py.
        if model == "logistic" and x_dtype is not None:
            # The EXACT reference must be computed off-device in float64:
            # on TPU, XLA's bf16-propagation pass already demotes the f32
            # design matrix inside the model matmuls (PERF.md profiles), so
            # an on-device "f32" target computes identically to the bf16
            # one and the gate would be vacuous (measured log w ≡ 0).
            from advancedhmc_tpu.models.logistic import _synthetic_data

            x64, y64 = _synthetic_data(1000, dim - 1)
            rng_g = np.random.default_rng(0)
            flat = thetas_np.reshape(-1, dim)
            sub = flat[rng_g.choice(len(flat), min(4096, len(flat)),
                                    replace=False)]
            ls64 = sub[:, 0].astype(np.float64)
            beta64 = sub[:, 1:].astype(np.float64)
            logits64 = beta64 @ x64.T                      # (N, n)
            lp_e = (
                -0.5 * ls64**2
                - 0.5 * (beta64**2).sum(1) * np.exp(-2 * ls64)
                - (dim - 1) * ls64
                + (y64[None, :] * logits64
                   - np.logaddexp(0.0, logits64)).sum(1)
            )
            sub_j = jnp.asarray(sub)
            lp_b = np.asarray(jax.jit(jax.vmap(target.logdensity))(
                sub_j), np.float64)
            logw = lp_e - lp_b
            sd_logw = float(logw.std())
            lw = logw - logw.max()
            w = np.exp(lw)
            w /= w.sum()
            ess_frac = float(1.0 / (len(w) * np.sum(w**2)))
            extras_bf16 = {"bf16x_logw_sd": round(sd_logw, 4),
                           "bf16x_rew_ess_frac": round(ess_frac, 4)}
            if sd_logw > 0.5 or ess_frac < 0.5:
                raise RuntimeError(
                    f"bf16-X posterior-equivalence gate failed: sd(log w)="
                    f"{sd_logw:.3f}, reweighting ESS fraction="
                    f"{ess_frac:.3f} — the rounded design matrix changed "
                    "the posterior; rerun with AHMC_BENCH_X_DTYPE=float32"
                )
        else:
            extras_bf16 = {}

        # Bulk ESS pooled over chains (chains subsampled to bound FFT cost)
        from advancedhmc_tpu.diagnostics import (
            effective_sample_size as ess_fn,
            effective_sample_size_ragged,
        )

        # ESS is per-dimension independent; chunk the dim axis so the FFT's
        # (2n, C, Dc) complex intermediates stay bounded — at dim=1000 the
        # unchunked autocovariance OOMs the chip (measured, r3)
        ess_dim_chunk = max(1, int(2.5e8 // (8 * 2 * thetas_np.shape[0]
                                              * max_ess_chains)))
        ess = np.concatenate([
            np.asarray(ess_fn(jnp.asarray(
                thetas_np[:, :max_ess_chains, j:j + ess_dim_chunk])))
            for j in range(0, dim, ess_dim_chunk)
        ])
        ess_total = float(np.median(ess)) * (n_chains / max_ess_chains)
        min_ess_total = float(np.min(ess)) * (n_chains / max_ess_chains)
        # Default ON since r4 (VERDICT r3 weak #5): every bench run validates
        # the 512-chain-subsample × (C/512) extrapolation against the
        # all-chains estimate and records the ratio. Set =0 to skip.
        if os.environ.get("AHMC_BENCH_ESS_ALL", "1") == "1":
            # validate the subsample-× extrapolation directly on ALL chains.
            # ESS is per-dimension independent, so chunk the dim axis — the
            # full-batch FFT ((2n, C, D) complex intermediates) exhausts TPU
            # HBM at bench shape.
            # cap the validation pool at 8192 chains: the check's point is
            # the subsample→pool scaling assumption, and ×16 already
            # validates it; all-16k/32k FFTs re-upload GBs over the tunnel
            # and dominate bench wall at big pools
            n_val = min(n_chains, 8192)
            ess_all = np.concatenate([
                np.asarray(ess_fn(jnp.asarray(
                    thetas_np[:, :n_val, j:j + 10])))
                for j in range(0, dim, 10)
            ])
            est_val = float(np.median(ess)) * (n_val / max_ess_chains)
            ratio = float(np.median(ess_all)) / max(est_val, 1e-9)
            extras_all = {
                "median_pooled_ess_allchains": round(float(np.median(ess_all)), 1),
                "extrapolation_ratio": round(ratio, 4),
            }
            # honesty gate (VERDICT r3 weak #5): the headline is computed
            # from a 512-chain subsample × (C/512); if the all-chains
            # estimate disagrees by >15% the extrapolation (and hence the
            # headline) is not trustworthy — fail loudly rather than
            # publish it. Measured ratio at bench shape: 0.98-1.00.
            # RuntimeError, not assert: the gate must survive python -O
            # (ADVICE r4) — a stripped honesty gate is no gate at all.
            if not (0.85 < ratio < 1.15):
                raise RuntimeError(
                    f"ESS subsample extrapolation off by {ratio:.3f}x — "
                    "headline ESS/s is unreliable at this configuration"
                )
        else:
            extras_all = {}
        # per-chain-sum estimator on the same draws: the apples-to-apples
        # comparison number for ragged-mode runs (different pooling)
        _x_pc = np.swapaxes(thetas_np[:, :max_ess_chains, :], 0, 1)
        ess_pc = np.concatenate([
            np.asarray(effective_sample_size_ragged(
                jnp.asarray(_x_pc[:, :, j:j + ess_dim_chunk]),
                jnp.full((max_ess_chains,), thetas_np.shape[0]),
            ))
            for j in range(0, dim, ess_dim_chunk)
        ])
        useful, slot_iters = _slot_accounting(steps_chunks)
        extras = {"median_ess_perchain_est": round(
            float(np.median(ess_pc)) * (n_chains / max_ess_chains), 1),
            # W-slot loop efficiency from the measured tree-size stream:
            # useful leaves / (W × iterations). Feeds the PERF.md roofline
            # note (pair-loop slot optimality + leaf-quad projection).
            "slot_eff_single": round(useful / slot_iters[1], 4),
            "slot_eff_pair": round(useful / (2 * slot_iters[2]), 4),
            "slot_eff_quad": round(useful / (4 * slot_iters[4]), 4),
            **extras_all, **extras_bf16}
    ess_per_s = ess_total / t_draw / n_devices
    lf_per_s = total_leapfrogs / t_draw / n_devices

    # --- supplementary ChEES-HMC measurement (same target, fresh run) ---
    # ChEES (Hoffman/Radul/Sountsov 2021) runs a SHARED jittered trajectory
    # length across all chains: zero lane divergence, no tree bookkeeping —
    # it sidesteps the 75%-of-leaf bookkeeping cost of the NUTS loop
    # (PERF.md hlo_stats). Reported as chees_* extras; the headline metric
    # stays NUTS (driver contract). AHMC_BENCH_CHEES=0 disables;
    # AHMC_BENCH_SAMPLER=chees forces it on.
    chees_on = (os.environ.get("AHMC_BENCH_CHEES", "1") == "1"
                or os.environ.get("AHMC_BENCH_SAMPLER") == "chees")
    chees_extras = {}
    if chees_on:
        from advancedhmc_tpu import Hamiltonian
        from advancedhmc_tpu.adaptation import AdaptState
        from advancedhmc_tpu.adaptation.chees import (
            CheesConfig,
            CheesState,
            halton_sequence,
        )
        from advancedhmc_tpu.chees import make_chees_step
        from advancedhmc_tpu.metrics import DiagEuclideanMetric
        from advancedhmc_tpu.stepsize_search import find_good_stepsize

        # 0.75 adopted (r3 hardware sweep): the paper's asymptotic 0.651
        # is NOT the ESS/s optimum here — δ 0.55→1.34M, 0.651→1.74M,
        # **0.75→2.25M** (min-dim 1.82M — 2.8× the r2 NUTS min-dim),
        # 0.8→1.84M, 0.85→2.20M, 0.9→1.61M; moments/div gates pass at all.
        delta_c = float(os.environ.get("AHMC_BENCH_CHEES_DELTA", 0.75))
        # 256 adopted (r3): unlike NUTS, ChEES NEEDS the window-refreshed
        # metric — with the gradient seed only, its whole-trajectory MH
        # forces ε≈0.06; the refreshed M⁻¹ lifts ε to ~0.47 (8×) and ESS/s
        # 1.7M→2.8-3.3M. ChEES warmup executes in ~0.15 s, so the longer
        # schedule is nearly free. Small smokes keep the NUTS warmup length.
        n_warm_c = int(os.environ.get(
            "AHMC_BENCH_CHEES_WARMUP", 256 if n_warmup >= 128 else n_warmup))
        # big-pool default trim: at >8192 chains the (draws, C, D) theta
        # transfer back over the tunnel dominates the chees section's wall;
        # 256 draws × 16k chains is still a 4M-sample pool
        n_draws_c = int(os.environ.get(
            "AHMC_BENCH_CHEES_DRAWS",
            n_draws if n_chains <= 8192 else min(n_draws, 256)))
        max_steps_c = int(os.environ.get("AHMC_BENCH_CHEES_MAX_STEPS",
                                         2 ** max_depth))
        cfg_c = AdaptorConfig(
            kind="stan", mm_kind="welford_var",
            da=DualAveragingConfig(delta=delta_c),
            init_buffer=spec.adaptor.init_buffer,
            term_buffer=spec.adaptor.term_buffer,
            window_size=spec.adaptor.window_size,
        )
        if mm_init == "gradient":
            _, grads0 = jax.jit(jax.vmap(target.logdensity_and_grad))(theta0)
            g0 = jnp.mean(jnp.abs(grads0), axis=0)
            m_inv0 = 1.0 / jnp.clip(g0, 1e-3, 1e6)
            metric_c = DiagEuclideanMetric(m_inv=m_inv0,
                                           sqrt_m_inv=jnp.sqrt(m_inv0))
        else:
            metric_c = make_metric("diagonal", dim)
        kc = jax.random.PRNGKey(3 + int(os.environ.get("AHMC_BENCH_SEED", 0)))
        kc, k_eps_c = jax.random.split(kc)
        h_c = Hamiltonian(metric=metric_c, target=target)
        eps0_c = jax.jit(find_good_stepsize)(k_eps_c, h_c, theta0[0])
        lp0, grad0 = jax.jit(jax.vmap(target.logdensity_and_grad))(theta0)
        lp0 = jnp.where(jnp.isfinite(lp0), lp0, -jnp.inf)
        adapt0 = AdaptState.init(cfg_c, dim, eps0_c, jnp.float32)
        # T0=4 adopted (r3, windowed metric): the SGA climbs toward long
        # trajectories on this posterior but converges slowly, so the init
        # still steers the finalized T. Measured (warmup 256, δ=0.75):
        # T0=2 → 3.34M ESS/s / 0.62M min-dim (throughput point);
        # T0=4 → 2.78M / 1.81M (balanced, adopted);
        # T0=8 → 2.53M / 2.26M (min-dim point — the slow hyperparameter
        # mixes at 90% of the median). PERF.md "ChEES".
        cs0 = CheesState.init(
            float(os.environ.get("AHMC_BENCH_CHEES_T0", 4.0)), jnp.float32)
        n_total_c = n_warm_c + n_draws_c
        flags_c = adapt_flags(cfg_c, n_warm_c, n_total_c)
        u_all = jnp.asarray(halton_sequence(n_total_c), jnp.float32)
        import dataclasses as _dc

        chees_cfg = _dc.replace(CheesConfig(), avg_start=n_warm_c // 2)
        step_c = make_chees_step(target, cfg_c, chees_cfg, max_steps_c)

        def slice_c(s, e):
            return (jax.tree_util.tree_map(lambda a: a[s:e], flags_c),
                    u_all[s:e])

        @jax.jit
        def run_cc(carry, fl, u):
            carry, (ths, st) = jax.lax.scan(step_c, carry, (fl, u))
            return carry, (ths,
                           jnp.sum(st["n_steps"]),
                           jnp.sum(st["numerical_error"]),
                           jnp.mean(st["acceptance_rate"]),
                           jnp.mean(st["trajectory_length"]))

        cw = min(chunk, n_warm_c)
        if n_warm_c % cw:
            cw = n_warm_c
        cd = min(chunk, n_draws_c)
        if n_draws_c % cd:
            cd = n_draws_c
        # draws-only step: the adaptation machinery is compiled OUT of the
        # draw program (the full step's `where`-gated SGA/Welford/DA dead
        # work is a large overhead at τ ≈ 1 — ~2-4 leapfrogs/transition);
        # bit-identical draws (tests/test_chees.py pins the equality)
        from advancedhmc_tpu.chees import make_chees_draw_step

        dstep = make_chees_draw_step(target, max_steps_c)

        @jax.jit
        def run_cd(dcarry, u):
            dcarry, (ths, st) = jax.lax.scan(dstep, dcarry, u)
            return dcarry, (ths,
                            jnp.sum(st["n_steps"]),
                            jnp.sum(st["numerical_error"]),
                            jnp.mean(st["acceptance_rate"]),
                            jnp.mean(st["trajectory_length"]),
                            jnp.mean(st["step_size"]))

        carry = (theta0, lp0, grad0, metric_c, adapt0, cs0, kc)

        def to_draw_carry(c):
            th, lp, gr, met, adapt, cs, k = c
            return (th, lp, gr, met, adapt.da.eps,
                    jnp.exp(cs.log_t_avg), k)

        # program-load throwaways (same methodology as the NUTS phases)
        jax.block_until_ready(run_cc(carry, *slice_c(0, cw)))
        jax.block_until_ready(run_cd(to_draw_carry(carry), u_all[:cd]))

        t0c = time.time()
        for s in range(0, n_warm_c, cw):
            carry, _ = run_cc(carry, *slice_c(s, s + cw))
            jax.block_until_ready(carry[0])
        chees_warm_s = time.time() - t0c
        th_cs, accs_c, taus_c, epss_c = [], [], [], []
        lfs_c = divs_c = 0.0
        dcarry = to_draw_carry(carry)
        t0c = time.time()
        for s in range(n_warm_c, n_total_c, cd):
            dcarry, (ths, ns, nd, am, tm, em) = run_cd(
                dcarry, u_all[s:s + cd])
            th_cs.append(ths)
            lfs_c += float(ns)
            divs_c += float(nd)
            accs_c.append(float(am))
            taus_c.append(float(tm))
            epss_c.append(float(em))
        jax.block_until_ready(th_cs[-1])
        chees_draw_s = time.time() - t0c

        th_c_np = np.concatenate([np.asarray(t) for t in th_cs], 0)
        if model == "logistic_nc":
            th_c_np = np.concatenate(
                [th_c_np[..., :1],
                 th_c_np[..., 1:] * np.exp(th_c_np[..., :1])], -1)
        _dcc = max(1, int(2.5e8 // (8 * 2 * th_c_np.shape[0]
                                    * max_ess_chains)))
        ess_c = np.concatenate([
            np.asarray(effective_sample_size(jnp.asarray(
                th_c_np[:, :max_ess_chains, j:j + _dcc])))
            for j in range(0, dim, _dcc)
        ])
        scale_c = n_chains / max_ess_chains
        chees_extras = {
            "chees_ess_per_s": round(
                float(np.median(ess_c)) * scale_c / chees_draw_s / n_devices,
                2),
            "chees_min_ess_per_s": round(
                float(np.min(ess_c)) * scale_c / chees_draw_s / n_devices, 2),
            "chees_median_pooled_ess": round(float(np.median(ess_c)), 1),
            "chees_leapfrog_steps_per_s": round(
                lfs_c / chees_draw_s / n_devices, 1),
            "chees_warmup_s": round(chees_warm_s, 2),
            "chees_sampling_s": round(chees_draw_s, 2),
            "chees_accept": round(float(np.mean(accs_c)), 4),
            "chees_divergence_rate": round(
                divs_c / (n_draws_c * n_chains), 6),
            "chees_mean_traj_len": round(float(np.mean(taus_c)), 4),
            "chees_eps": round(float(np.mean(epss_c)), 5),
            "chees_mean_logsigma": round(float(th_c_np[:, :, 0].mean()), 5),
            "chees_sd_logsigma": round(float(th_c_np[:, :, 0].std()), 5),
            "chees_mean_beta_norm": round(float(np.linalg.norm(
                th_c_np[:, :, 1:].mean((0, 1)))), 5),
        }
        print(f"# chees: warmup {chees_warm_s:.2f}s draws {chees_draw_s:.2f}s"
              f" accept {chees_extras['chees_accept']}"
              f" ess/s {chees_extras['chees_ess_per_s']:.3g}",
              file=sys.stderr)

    result = {
        "metric": "effective_samples_per_s_per_chip",
        "value": round(ess_per_s, 2),
        "unit": f"ESS/s/chip (NUTS, {dim}-D {model}, {n_chains} chains)",
        "vs_baseline": 1.0,
        "leapfrog_steps_per_s": round(lf_per_s, 1),
        "n_chains": n_chains,
        "n_draws": n_draws,
        # warmup_s is EXECUTION wall (program-load/compile paid beforehand
        # via throwaway runs, reported as warmup_load_s) — same methodology
        # as sampling_s; pre-throwaway runs jittered ±0.8 s from tunnel
        # program-load on a ~3 s quantity (PERF.md).
        "warmup_s": round(t_warm, 2),
        "warmup_load_s": round(warm_load_s, 2),
        "sampling_s": round(t_draw, 2),
        "median_pooled_ess": round(float(np.median(ess)), 1),
        "min_pooled_ess": round(float(np.min(ess)), 1),
        # dim 0 of the hierarchical-logistic target is the logsigma
        # hyperparameter — the usual worst mixer (PERF.md)
        "argmin_ess_dim": int(np.argmin(ess)),
        # worst-dimension throughput (the headline takes the median over
        # dims; the min tracks the slowest-mixing parameter)
        "min_ess_per_s": round(min_ess_total / t_draw / n_devices, 2),
        "divergence_rate": round(div_rate, 6),
        "accept_mean": round(accept_mean, 4),
        "mean_logsigma": round(mean_ls, 5),
        "sd_logsigma": round(sd_ls, 5),
        "mean_beta_norm": round(mean_beta_norm, 5),
        "init_step_size": round(eps0, 5),
        "fuse": fuse,
        "device": str(jax.devices()[0]),
        "n_devices": n_devices,
        "ess_per_s_total": round(ess_total / t_draw, 2),
        # honesty metric (VERDICT r3 weak #2): the same ESS divided by the
        # FULL wall including warmup execution — what a one-shot user pays.
        # (warmup_load_s is one-time program load, reported separately.)
        "ess_per_s_incl_warmup": round(
            ess_total / (t_warm + t_draw) / n_devices, 2),
        **extras,
        **chees_extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
