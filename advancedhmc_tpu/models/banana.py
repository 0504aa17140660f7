"""Banana-shaped posterior (Riemannian baseline target, BASELINE.md config 5;
the reference's research target zoo includes the same family,
/root/reference/research/src/riemannian_hmc_utility.jl)."""

from __future__ import annotations

import jax.numpy as jnp

from ..target import LogDensityTarget


def banana(b: float = 0.03, sigma: float = 10.0) -> LogDensityTarget:
    """2-D twisted Gaussian: θ₁ ~ N(0, σ²), θ₂ | θ₁ ~ N(b(θ₁² - σ²), 1)."""

    def logdensity(theta):
        t1, t2 = theta[0], theta[1]
        lp1 = -0.5 * jnp.square(t1) / sigma**2
        lp2 = -0.5 * jnp.square(t2 - b * (jnp.square(t1) - sigma**2))
        return lp1 + lp2

    return LogDensityTarget(logdensity, 2)
