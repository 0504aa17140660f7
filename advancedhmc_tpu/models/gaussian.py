"""Gaussian targets (≅ the hand-coded test densities of
/root/reference/test/common.jl:33-77)."""

from __future__ import annotations

import jax.numpy as jnp

from ..target import LogDensityTarget


def std_gaussian(dim: int) -> LogDensityTarget:
    """Standard normal with analytic gradient."""

    def logdensity(x):
        return -0.5 * jnp.sum(jnp.square(x))

    def logdensity_and_grad(x):
        return -0.5 * jnp.sum(jnp.square(x)), -x

    return LogDensityTarget(logdensity, dim, logdensity_and_grad)


def mvn_diag(variances) -> LogDensityTarget:
    """Independent Gaussian with given variances."""
    variances = jnp.asarray(variances)
    dim = variances.shape[0]

    def logdensity(x):
        return -0.5 * jnp.sum(jnp.square(x) / variances)

    def logdensity_and_grad(x):
        return logdensity(x), -x / variances

    return LogDensityTarget(logdensity, dim, logdensity_and_grad)


def correlated_gaussian(dim: int, rho: float = 0.8) -> LogDensityTarget:
    """Equicorrelated Gaussian (pairwise correlation ρ) — the dense-metric
    baseline target (BASELINE.md config 2)."""
    cov = (1 - rho) * jnp.eye(dim) + rho * jnp.ones((dim, dim))
    prec = jnp.linalg.inv(cov)

    def logdensity(x):
        return -0.5 * x @ prec @ x

    def logdensity_and_grad(x):
        g = prec @ x
        return -0.5 * jnp.dot(x, g), -g

    t = LogDensityTarget(logdensity, dim, logdensity_and_grad)
    object.__setattr__(t, "cov", cov)
    return t
