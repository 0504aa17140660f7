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
