"""TPU benchmark + validation of the Pallas fused-NUTS megakernel.

Compares posterior moments and throughput against the XLA fused-draw path on
the 100-D hierarchical logistic bench model. Run exclusively on the TPU.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import advancedhmc_tpu as ahmc
from advancedhmc_tpu.hamiltonian import FullMomentumRefreshment
from advancedhmc_tpu.models.logistic import (
    hierarchical_logistic,
    hierarchical_logistic_block,
)
from advancedhmc_tpu.nuts import nuts_transitions_fused
from advancedhmc_tpu.ops.fused_nuts_kernel import fused_nuts_pallas

C = int(os.environ.get("MK_CHAINS", 4096))
DIM = 100
T = int(os.environ.get("MK_T", 64))
MAX_DEPTH = int(os.environ.get("MK_MAX_DEPTH", 8))
BLOCK = int(os.environ.get("MK_BLOCK", 512))
DELTA = float(os.environ.get("MK_DELTA", 0.8))
REPS = int(os.environ.get("MK_REPS", 1))


def main():
    # --- get adapted state (eps + m_inv + positions) via normal warmup ---
    target = hierarchical_logistic(n=1000, p=DIM - 1, dtype=jnp.float32)
    from advancedhmc_tpu import (
        AdaptorConfig, GeneralisedNoUTurn, HMCKernel, Leapfrog, Trajectory,
        init_state, make_metric, sample_step,
    )
    from advancedhmc_tpu.adaptation import adapt_flags
    from advancedhmc_tpu.sampler import SampleSpec

    from advancedhmc_tpu.adaptation import DualAveragingConfig

    kernel = HMCKernel(Trajectory(
        Leapfrog(step_size=jnp.asarray(0.05, jnp.float32)),
        GeneralisedNoUTurn(max_depth=MAX_DEPTH), "multinomial"))
    spec = SampleSpec(
        target=target, kernel=kernel,
        adaptor=AdaptorConfig(kind="stan",
                              da=DualAveragingConfig(delta=DELTA)),
        cross_chain=True)
    key = jax.random.PRNGKey(0)
    theta0 = 0.1 * jax.random.normal(key, (C, DIM), jnp.float32)
    state = init_state(key, spec, make_metric("diagonal", DIM), theta0,
                       init_eps=0.15)
    n_warm = 300
    flags = adapt_flags(spec.adaptor, n_warm, n_warm)

    @jax.jit
    def warm_chunk(st, fl):
        return jax.lax.scan(lambda s, f: (sample_step(spec, s, f)[0], None),
                            st, fl)[0]

    t0 = time.time()
    for s0 in range(0, n_warm, 50):
        fl = jax.tree_util.tree_map(lambda a: a[s0:s0 + 50], flags)
        state = warm_chunk(state, fl)
        jax.block_until_ready(state.z.theta)
    print(f"# warmup {time.time()-t0:.1f}s eps={float(state.adapt.da.eps):.4f}")

    eps = float(state.adapt.da.eps)
    m_inv = state.metric.m_inv          # (DIM,)
    th_start = state.z.theta            # (C, DIM)

    # --- XLA fused path ---
    h = ahmc.Hamiltonian(metric=state.metric, target=target)
    traj = kernel.trajectory.replace(
        integrator=Leapfrog(step_size=jnp.asarray(eps, jnp.float32)))

    @jax.jit
    def run_xla(keys, z):
        return jax.vmap(
            lambda k, zz: nuts_transitions_fused(
                k, h, traj, zz, T, FullMomentumRefreshment())[1:],
        )(keys, z)

    keys = jax.random.split(jax.random.PRNGKey(1), C)
    z0 = jax.vmap(h.init_phasepoint)(keys, th_start)
    ths_x, st_x = run_xla(keys, z0)  # warm compile
    jax.block_until_ready(ths_x)
    t0 = time.time()
    ths_x, st_x = run_xla(jax.random.split(jax.random.PRNGKey(2), C), z0)
    jax.block_until_ready(ths_x)
    t_xla = time.time() - t0
    lf_x = float(np.asarray(st_x["n_steps"], np.float64).sum())
    print(f"XLA fused:    {t_xla:6.2f}s  {C*T/t_xla:9.0f} draws/s  "
          f"{lf_x/t_xla:12.0f} leapfrog/s")

    # --- Pallas megakernel ---
    fn, data = hierarchical_logistic_block(n=1000, p=DIM - 1, d_pad=128)

    def run_pal(seed, th0):
        return fused_nuts_pallas(
            fn, th0, m_inv, eps, seed, data, dim=DIM,
            n_transitions=T, max_depth=MAX_DEPTH, block_chains=BLOCK)

    out = run_pal(11, th_start)
    jax.block_until_ready(out[0])
    t0 = time.time()
    # REPS sequential kernel calls threading the positions (the multi-call
    # pattern a production small-T configuration would use)
    th0 = th_start
    lf_p = 0.0
    outs = []
    for rep in range(REPS):
        out = run_pal(12 + rep, th0)
        outs.append(out)
        th0 = out[0][-1]
    jax.block_until_ready(th0)
    t_pal = time.time() - t0
    thetas_p = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
    nsteps_p = np.concatenate([np.asarray(o[1]) for o in outs], axis=0)
    depth_p = np.concatenate([np.asarray(o[2]) for o in outs], axis=0)
    div_p = np.concatenate([np.asarray(o[3]) for o in outs], axis=0)
    lf_p = float(np.asarray(nsteps_p, np.float64).sum())
    print(f"Pallas fused: {t_pal:6.2f}s  {C*T*REPS/t_pal:9.0f} draws/s  "
          f"{lf_p/t_pal:12.0f} leapfrog/s  speedup {t_xla*REPS/t_pal:.2f}x")

    # --- statistical agreement ---
    burn = T // 4
    burn_p = (T * REPS) // 4
    dx = np.asarray(ths_x)[:, burn:, :].reshape(-1, DIM)
    dp = np.asarray(thetas_p)[burn_p:].reshape(-1, DIM)
    m_err = np.abs(dx.mean(0) - dp.mean(0)).max()
    s_err = np.abs(dx.std(0) - dp.std(0)).max() / dx.std(0).mean()
    print(f"mean diff {m_err:.4f}  rel std diff {s_err:.4f}")
    print("depth mean xla", float(np.asarray(st_x['tree_depth']).mean()),
          "pallas", float(np.asarray(depth_p).mean()))
    print("div rate pallas", float(np.asarray(div_p).mean()))
    ess_x = np.median(np.asarray(ahmc.effective_sample_size(
        jnp.asarray(np.swapaxes(np.asarray(ths_x)[:512, burn:], 0, 1)))))
    ess_p = np.median(np.asarray(ahmc.effective_sample_size(
        jnp.asarray(np.asarray(thetas_p)[burn_p:, :512]))))
    print(f"median pooled ESS (512 chains): xla {ess_x:.0f} pallas {ess_p:.0f}")
    tr = T * REPS
    print(f"ESS/s full-chain est: xla "
          f"{ess_x*(C/512)/t_xla*( (T-burn)/T ):.0f}  pallas "
          f"{ess_p*(C/512)/t_pal*((tr-burn_p)/tr):.0f}")


if __name__ == "__main__":
    main()
