"""The TPU fast path: every performance knob the bench uses, in one script.

Runs anywhere (CPU included); on a TPU v5e chip this configuration moves
~5M effective samples/s on the 100-D hierarchical logistic posterior
(PERF.md "Headline bench").

    python examples/fast_sampling.py
"""

import jax
import jax.numpy as jnp

import advancedhmc_tpu as ahmc
from advancedhmc_tpu.models import hierarchical_logistic


def main():
    on_accel = jax.default_backend() not in ("cpu",)
    target = hierarchical_logistic(n=1000, p=99 if on_accel else 19)
    n_chains = 2048 if on_accel else 128   # bench uses 16384 on the chip

    kernel = ahmc.HMCKernel(ahmc.Trajectory(
        ahmc.Leapfrog(step_size=jnp.asarray(0.05)),
        # depth 6 / delta 0.55: hardware-swept operating point (PERF.md)
        ahmc.GeneralisedNoUTurn(max_depth=6), "multinomial",
    ))
    res = ahmc.sample(
        jax.random.PRNGKey(0), target, kernel,
        ahmc.make_metric("diagonal", target.dim),
        jnp.zeros((n_chains, target.dim)), n_samples=384, n_adapts=128,
        adaptor=ahmc.AdaptorConfig(
            kind="stan", da=ahmc.DualAveragingConfig(delta=0.55, kappa=0.8)),
        cross_chain=True,            # shared adaptation, psum-reduced
        init_mass_matrix="gradient",  # nutpie-style M⁻¹ seed
        fuse_warmup=True,            # block-replayed async warmup
        fuse_draws=16,               # async multi-transition draw blocks
        fuse_pair=True,              # leaf-pair loop (+43% on the bench)
        fuse_chain_chunks=max(1, n_chains // 4096),  # VMEM-spill guard
        drop_warmup=True,
        # warmup pool sizing: warm 1/4 of the pool, fan the adapted state
        # out, decorrelate — warmup wall /4 at identical quality (r5;
        # PERF.md "warmup pool sizing"); needs cross_chain + drop_warmup
        warmup_chains=n_chains // 4,
        fanout_decorrelate=16,
    )
    print("draws:", res.thetas.shape)
    ahmc.summarize(res)

    # ChEES-HMC: the zero-bookkeeping alternative — best min-dimension
    # throughput and end-to-end wall (PERF.md "ChEES-HMC on the TPU")
    chees = ahmc.sample_chees(
        jax.random.PRNGKey(1), target,
        jnp.zeros((n_chains, target.dim)), 512, 256, init_t=4.0,
        da=ahmc.DualAveragingConfig(delta=0.75), drop_warmup=True,
    )
    print("chees draws:", chees.thetas.shape,
          "mean trajectory length:",
          float(chees.stats["trajectory_length"].mean()))


if __name__ == "__main__":
    main()
