"""Neal's funnel (BASELINE.md config 3)."""

from __future__ import annotations

import jax.numpy as jnp

from ..target import LogDensityTarget


def neal_funnel(dim: int = 10, sigma_v: float = 3.0) -> LogDensityTarget:
    """θ = (v, x₁..x_{d-1}): v ~ N(0, σ_v²), x_i | v ~ N(0, exp(v)).

    Marginal moments: E[v]=0, Var[v]=σ_v², E[x_i]=0.
    """

    def logdensity(theta):
        v = theta[0]
        x = theta[1:]
        lp_v = -0.5 * jnp.square(v) / sigma_v**2
        lp_x = -0.5 * jnp.sum(jnp.square(x)) * jnp.exp(-v) - 0.5 * (
            dim - 1
        ) * v
        return lp_v + lp_x

    return LogDensityTarget(logdensity, dim)
