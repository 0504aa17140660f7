"""Spiral-shaped 2-D target (research target zoo parity: the reference's
Riemannian experiments sample a `Spiral(8, 0.1)` target from
MCMCLogDensityProblems, /root/reference/research/src/riemannian_hmc_utility.jl:66).

Fresh construction: mass concentrated along an Archimedean spiral
r = a·φ with Gaussian cross-section σ. The angle ambiguity (φ vs φ+2πk)
is resolved smoothly with a logsumexp over winding numbers, so the density
is C^∞ away from the origin and HMC/RMHMC can traverse the arm.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..target import LogDensityTarget


def spiral(a: float = 0.5, sigma: float = 0.1, n_turns: int = 8,
           decay: float = 0.05) -> LogDensityTarget:
    """2-D Archimedean-spiral density.

    p(x) ∝ Σ_k exp(-(r - a(φ + 2πk))² / 2σ² - decay·(φ + 2πk))
    over winding numbers k = 0..n_turns-1, with r = ‖x‖, φ = atan2 ∈ [0, 2π).
    The `decay` term downweights outer turns so the density is integrable.
    """
    two_pi = 2.0 * jnp.pi

    def logdensity(theta):
        x, y = theta[0], theta[1]
        r = jnp.sqrt(jnp.square(x) + jnp.square(y) + 1e-12)
        phi = jnp.arctan2(y, x) % two_pi
        arm = phi + two_pi * jnp.arange(n_turns)
        lp_k = -0.5 * jnp.square((r - a * arm) / sigma) - decay * arm
        return logsumexp(lp_k)

    return LogDensityTarget(logdensity, 2)
