"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from advancedhmc_tpu.ops.fused_leapfrog import (
    fused_gaussian_leapfrog,
    reference_gaussian_leapfrog,
)


def test_fused_leapfrog_matches_reference():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    c, d = 20, 5
    theta = jax.random.normal(k1, (c, d), jnp.float32)
    r = jax.random.normal(k2, (c, d), jnp.float32)
    prec = jnp.linspace(0.5, 2.0, d).astype(jnp.float32)
    m_inv = jnp.linspace(0.8, 1.2, d).astype(jnp.float32)

    th_p, r_p, pot_p, kin_p = fused_gaussian_leapfrog(
        theta, r, prec, m_inv, 0.12, 17, block_chains=8, interpret=True
    )
    th_x, r_x, pot_x, kin_x = reference_gaussian_leapfrog(
        theta, r, prec, m_inv, 0.12, 17
    )
    np.testing.assert_allclose(np.asarray(th_p), np.asarray(th_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pot_p), np.asarray(pot_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(kin_p), np.asarray(kin_x), rtol=2e-5, atol=2e-5)


def test_fused_nuts_megakernel_interpret():
    """Megakernel (interpret mode): correct Gaussian moments, matching the
    XLA fused path's tree-depth regime. Small sizes — interpret is slow."""
    from advancedhmc_tpu.ops.fused_nuts_kernel import fused_nuts_pallas

    def vg(th):
        return -0.5 * jnp.sum(th * th, axis=1, keepdims=True), -th

    thetas, nsteps, depth, div = fused_nuts_pallas(
        vg, jnp.zeros((8, 5), jnp.float32), jnp.ones(5, jnp.float32),
        0.5, 42, (), dim=5, n_transitions=80, max_depth=6, block_chains=8,
        interpret=True)
    d = np.asarray(thetas)[20:].reshape(-1, 5)
    assert np.isfinite(d).all()
    assert np.abs(d.mean(0)).max() < 0.35
    assert np.abs(d.var(0) - 1.0).max() < 0.45
    assert not np.asarray(div).any()
    dep = np.asarray(depth)
    assert 2 <= dep.mean() <= 4  # same regime as the XLA path at eps=0.5
