"""Eight-schools hierarchical model (non-centered parameterisation).

The classic hierarchical benchmark; complements the funnel as a
centered/non-centered geometry test. θ = (μ, log τ, z₁..z₈), dim = 10.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..target import LogDensityTarget

_Y = (28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0)
_SIGMA = (15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0)


def eight_schools() -> LogDensityTarget:
    y = jnp.asarray(_Y)
    sigma = jnp.asarray(_SIGMA)

    def logdensity(theta):
        mu, log_tau = theta[0], theta[1]
        z = theta[2:]
        tau = jnp.exp(log_tau)
        lp = -0.5 * jnp.square(mu / 5.0)          # μ ~ N(0, 25)
        lp = lp - 0.5 * jnp.square(log_tau / 1.5)  # log τ ~ N(0, 1.5²)
        lp = lp - 0.5 * jnp.sum(jnp.square(z))     # z ~ N(0, 1)
        effects = mu + tau * z
        lp = lp - 0.5 * jnp.sum(jnp.square((y - effects) / sigma))
        return lp

    return LogDensityTarget(logdensity, 10)
