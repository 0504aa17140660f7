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


def test_fused_logistic_value_grad_interpret():
    """One-pass logistic likelihood kernel (interpret mode) matches the
    analytic value_and_grad within bf16-input tolerance."""
    from advancedhmc_tpu.models.logistic import _synthetic_data, hierarchical_logistic
    from advancedhmc_tpu.ops.fused_logistic import fused_logistic_value_grad

    n, p = 300, 19
    x, y = _synthetic_data(n, p)
    apply_fused = fused_logistic_value_grad(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        block_chains=16, interpret=True,
    )
    target = hierarchical_logistic(n=n, p=p, dtype=jnp.float32, fused=False)
    thetas = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (40, p + 1),
                                     jnp.float32)
    lp_ref, g_ref = jax.vmap(target.logdensity_and_grad)(
        thetas.astype(jnp.float64)
    )
    lp_lik, gl = apply_fused(thetas)
    ls, beta = thetas[:, 0], thetas[:, 1:]
    inv_s2 = jnp.exp(-2 * ls)
    bsq = jnp.sum(beta ** 2, -1)
    lp = -0.5 * ls ** 2 - 0.5 * bsq * inv_s2 - p * ls + lp_lik
    g = jnp.concatenate(
        [(-ls + bsq * inv_s2 - p)[:, None], -beta * inv_s2[:, None]], 1
    ) + gl
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=3e-3)
    assert float(jnp.max(jnp.abs(g - g_ref.astype(jnp.float32)))) < 0.01 * scale

    # padding edge: chain count not a multiple of the block
    lp2, gl2 = apply_fused(thetas[:13])
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(lp_lik[:13]),
                               rtol=1e-6)
