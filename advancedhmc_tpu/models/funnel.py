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


def neal_funnel_nc(dim: int = 10, sigma_v: float = 3.0) -> LogDensityTarget:
    """Non-centered funnel: θ̃ = (v, z₁..z_{d-1}) with x_i = z_i·exp(v/2).

    The reparameterisation removes the v-dependent scale entirely — the
    unconstrained target is a standard normal (v/σ_v and z iid N(0,1)), so
    ANY fixed-step sampler (ChEES included) explores it perfectly; transform
    draws back with `funnel_nc_to_centered`. This is the standard fix for
    funnel geometry and the honest recommendation whenever the model admits
    it (the centered funnel stays as the stress test for adaptive-depth
    samplers)."""

    def logdensity(theta):
        v = theta[0]
        z = theta[1:]
        return (-0.5 * jnp.square(v) / sigma_v**2
                - 0.5 * jnp.sum(jnp.square(z)))

    return LogDensityTarget(logdensity, dim)


def funnel_nc_to_centered(thetas):
    """(…, dim) non-centered draws → centered (v, x = z·exp(v/2))."""
    v = thetas[..., :1]
    return jnp.concatenate([v, thetas[..., 1:] * jnp.exp(0.5 * v)], axis=-1)
