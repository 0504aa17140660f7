"""Gaussian-mixture targets (research target zoo parity: the reference's
Riemannian experiments sample a `TwoDimGaussianMixtures` target,
/root/reference/research/src/riemannian_hmc_utility.jl:68)."""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..target import LogDensityTarget


def gaussian_mixture(means, sigmas=1.0, weights=None) -> LogDensityTarget:
    """Isotropic Gaussian mixture in D dimensions.

    `means`: (K, D) component means. `sigmas`: scalar or (K,) component
    standard deviations. `weights`: (K,) mixture weights (default uniform).
    """
    means = jnp.asarray(means)
    if not jnp.issubdtype(means.dtype, jnp.floating):
        means = means.astype(jnp.result_type(float))
    k, d = means.shape
    sigmas = jnp.broadcast_to(jnp.asarray(sigmas, means.dtype), (k,))
    if weights is None:
        log_w = jnp.zeros((k,), means.dtype) - jnp.log(float(k))
    else:
        w = jnp.asarray(weights, means.dtype)
        log_w = jnp.log(w / jnp.sum(w))
    log_norm = -0.5 * d * jnp.log(2.0 * jnp.pi) - d * jnp.log(sigmas)

    def logdensity(theta):
        sq = jnp.sum(jnp.square((theta[None, :] - means) / sigmas[:, None]),
                     axis=-1)
        return logsumexp(log_w + log_norm - 0.5 * sq)

    return LogDensityTarget(logdensity, int(d))


def two_gaussian_mixtures_2d(sep: float = 3.0, sigma: float = 0.5) -> LogDensityTarget:
    """The classic bimodal 2-D benchmark: equal-weight modes at (±sep/2, 0)."""
    half = 0.5 * sep
    return gaussian_mixture([[-half, 0.0], [half, 0.0]], sigma)
