"""Multi-device chain-parallel tests on the virtual 8-device CPU mesh
(SURVEY.md §4.10: --xla_force_host_platform_device_count simulation +
same-seed determinism across mesh shapes)."""

import numpy as np

import jax
import jax.numpy as jnp

from advancedhmc_tpu import (
    AdaptorConfig,
    GeneralisedNoUTurn,
    HMCKernel,
    Leapfrog,
    Trajectory,
    make_metric,
    sample,
)
from advancedhmc_tpu.models import std_gaussian
from advancedhmc_tpu.parallel.mesh import chain_sharding, mesh_of_all_devices

D = 4
N_CHAINS = 16


def _run(mesh=None, cross_chain=True, n=60, seed=0):
    target = std_gaussian(D)
    kernel = HMCKernel(
        Trajectory(Leapfrog(step_size=jnp.asarray(0.4, jnp.float64)),
                   GeneralisedNoUTurn(max_depth=6), "multinomial")
    )
    return sample(
        jax.random.PRNGKey(seed),
        target,
        kernel,
        make_metric("diagonal", D, dtype=jnp.float64),
        jnp.zeros((N_CHAINS, D), jnp.float64),
        n,
        n_adapts=30,
        adaptor=AdaptorConfig(kind="stan"),
        init_eps=0.4,
        cross_chain=cross_chain,
        mesh=mesh,
    )


def test_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_run_matches_single_device_cross_chain():
    """Sharded chains + cross-chain adaptation ≈ unsharded run (reduction
    order may differ in the last ulp)."""
    res_plain = _run(mesh=None)
    res_mesh = _run(mesh=mesh_of_all_devices())
    np.testing.assert_allclose(
        np.asarray(res_plain.thetas), np.asarray(res_mesh.thetas),
        rtol=1e-8, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(res_plain.final_state.adapt.da.eps),
        np.asarray(res_mesh.final_state.adapt.da.eps),
        rtol=1e-8,
    )


def test_mesh_run_matches_single_device_per_chain():
    res_plain = _run(mesh=None, cross_chain=False)
    res_mesh = _run(mesh=mesh_of_all_devices(), cross_chain=False)
    np.testing.assert_allclose(
        np.asarray(res_plain.thetas), np.asarray(res_mesh.thetas),
        rtol=1e-8, atol=1e-8,
    )


def test_mesh_shape_independence():
    """2-device vs 8-device mesh give the same samples (same seed)."""
    res2 = _run(mesh=mesh_of_all_devices(2))
    res8 = _run(mesh=mesh_of_all_devices(8))
    np.testing.assert_allclose(
        np.asarray(res2.thetas), np.asarray(res8.thetas), rtol=1e-8, atol=1e-8
    )


def test_output_sharding_propagates():
    """Draws stay sharded along the chain axis (no host gather mid-run)."""
    mesh = mesh_of_all_devices()
    res = _run(mesh=mesh)
    shard = res.thetas.sharding
    # scan stacks a new leading (draw) axis; chains axis must stay sharded
    spec = getattr(shard, "spec", None)
    assert spec is not None
    assert "chains" in str(spec)


def test_mesh_with_fused_draws():
    """Sharded chains + fused async draw phase compile and execute."""
    res = _run_fused(mesh_of_all_devices())
    assert np.isfinite(np.asarray(res.thetas)).all()
    draws = np.asarray(res.thetas[20:]).reshape(-1, D)
    assert np.linalg.norm(draws.mean(axis=0)) < 0.8


def _run_fused(mesh):
    target = std_gaussian(D)
    kernel = HMCKernel(
        Trajectory(Leapfrog(step_size=jnp.asarray(0.4, jnp.float64)),
                   GeneralisedNoUTurn(max_depth=6), "multinomial")
    )
    return sample(
        jax.random.PRNGKey(3), target, kernel,
        make_metric("diagonal", D, dtype=jnp.float64),
        jnp.zeros((N_CHAINS, D), jnp.float64), 80, n_adapts=40,
        adaptor=AdaptorConfig(kind="stan"), init_eps=0.4,
        cross_chain=True, mesh=mesh, fuse_draws=20,
    )


def test_mesh_warmup_chains_fanout_matches_unsharded():
    """Warmup pool sizing on the mesh: sample(warmup_chains=W) with a
    sharded chain axis produces the same draws as the unsharded run (the
    fanout tile + decorrelation + draw phases are chain-parallel, so GSPMD
    partitioning must be value-preserving)."""
    target = std_gaussian(D)
    kernel = HMCKernel(
        Trajectory(Leapfrog(step_size=jnp.asarray(0.3, jnp.float64)),
                   GeneralisedNoUTurn(max_depth=5), "multinomial")
    )

    def run(mesh):
        return sample(
            jax.random.PRNGKey(3), target, kernel,
            make_metric("diagonal", D, dtype=jnp.float64),
            jnp.zeros((N_CHAINS, D), jnp.float64),
            80, n_adapts=40, adaptor=AdaptorConfig(kind="stan"),
            init_eps=0.3, cross_chain=True, drop_warmup=True,
            fuse_draws=20, warmup_chains=8, fanout_decorrelate=4,
            mesh=mesh,
        )

    res_plain = run(None)
    res_mesh = run(mesh_of_all_devices())
    assert res_plain.thetas.shape == (40, N_CHAINS, D)
    np.testing.assert_allclose(np.asarray(res_plain.thetas),
                               np.asarray(res_mesh.thetas),
                               rtol=0, atol=1e-10)
    draws = np.asarray(res_mesh.thetas).reshape(-1, D)
    assert abs(draws.mean()) < 0.25
