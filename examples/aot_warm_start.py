"""AOT warm starts: skip the Python trace on repeat runs via jax.export.

Production pattern: a serving/inference job that brings up the SAME
sampling program on every restart (same model, shapes, config) pays the
full Python trace each time — ~2 s for the bench-scale fused warmup
programs. `advancedhmc_tpu.aot_program` serializes the traced StableHLO
(plus the output pytree structure) to disk on the first run; later
processes deserialize it in milliseconds and replay the original trace
bitwise. XLA compilation still goes through the persistent compile cache
(/tmp/jax_comp_cache in bench.py), so a warm restart pays neither trace
nor compile. Measured on TPU at the 32768-chain bench default:
warmup_load_s 11.1 s -> 6.1 s (the rest is executable load over the
device transport — see PERF.md "Program-load floor").

No counterpart in the reference: Julia's method JIT caches native code
per-session only; cross-process artifacts are a deployment capability.

    python examples/aot_warm_start.py      # run twice: trace, then cache
"""

import jax
import jax.numpy as jnp

import advancedhmc_tpu as ahmc
from advancedhmc_tpu.models import hierarchical_logistic
from advancedhmc_tpu.sampler import fused_warmup_phase_crosschain


def main():
    target = hierarchical_logistic(n=200, p=19)
    n_chains, n_adapts, block = 256, 64, 8

    kernel = ahmc.HMCKernel(ahmc.Trajectory(
        ahmc.Leapfrog(step_size=jnp.asarray(0.05)),
        ahmc.GeneralisedNoUTurn(max_depth=5), "multinomial",
    ))
    spec = ahmc.SampleSpec(
        target=target, kernel=kernel,
        adaptor=ahmc.AdaptorConfig(kind="stan"), cross_chain=True)
    state = ahmc.init_state(
        jax.random.PRNGKey(0), spec, ahmc.make_metric("diagonal", target.dim),
        jnp.zeros((n_chains, target.dim)), init_eps=0.05)

    # The load-time-critical program: the fused cross-chain warmup phase.
    # program_id must cover config the arguments can't see (kernel/adaptor
    # settings, package version) — mismatched ids or avals re-trace.
    def warmup_program(st):
        return fused_warmup_phase_crosschain(spec, st, n_adapts, block)

    warm, source = ahmc.aot_program(
        warmup_program, (state,),
        program_id=f"example-warmup/d{target.dim}/c{n_chains}/"
                   f"a{n_adapts}/b{block}/v{ahmc.__version__}",
        verbose=True)
    print(f"program source: {source}"
          f" ({'re-run this script to hit the artifact cache' if source == 'trace' else 'no Python trace paid'})")

    state, _, _ = warm(state)
    print("adapted step size:", float(jnp.mean(state.adapt.da.eps)))


if __name__ == "__main__":
    main()
