"""Relativistic momentum sampling (experimental tier).

The reference samples the relativistic momentum magnitude by adaptive
rejection sampling (/root/reference/research/src/relativistic_hmc.jl:48-60) —
a data-dependent loop that maps poorly to XLA. TPU-native replacement
(SURVEY.md hard part #3): a host-precomputed inverse-CDF table for the
magnitude (the magnitude law depends only on the static (m, c, dim), not on
the adapted mass matrix), then direction uniform on the sphere — fixed cost,
vmappable.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..kinetic import RelativisticKinetic
from ..metrics import DiagEuclideanMetric, Metric, UnitEuclideanMetric


@lru_cache(maxsize=None)
def _magnitude_table(m: float, c: float, dim: int, n_grid: int = 4096):
    """Inverse-CDF table for u = |w|, pdf(u) ∝ u^{D-1} exp(-mc²√(u²/(m²c²)+1))."""
    def log_pdf(u):
        with np.errstate(divide="ignore"):
            return (dim - 1) * np.log(u) - m * c**2 * np.sqrt(
                u**2 / (m**2 * c**2) + 1.0
            )

    # bracket: mode is O(sqrt(dim)·max(1, 1/(mc))); expand until 60-nat drop
    u_hi = max(10.0, 10.0 * np.sqrt(dim) * max(1.0, 1.0 / (m * c)))
    peak = np.max(log_pdf(np.linspace(1e-6, u_hi, 512)))
    while log_pdf(u_hi) > peak - 60.0:
        u_hi *= 2.0
    u = np.linspace(0.0, u_hi, n_grid)
    lp = log_pdf(np.maximum(u, 1e-12))
    p = np.exp(lp - lp.max())
    p[0] = 0.0
    cdf = np.cumsum((p[1:] + p[:-1]) * 0.5)
    cdf = np.concatenate([[0.0], cdf])
    cdf /= cdf[-1]
    return jnp.asarray(u), jnp.asarray(cdf)


def rand_momentum_relativistic(kinetic: RelativisticKinetic, metric: Metric, key):
    u_grid, cdf = _magnitude_table(float(kinetic.m), float(kinetic.c), metric.dim)
    k_u, k_dir = jax.random.split(key)
    p = jax.random.uniform(k_u, dtype=u_grid.dtype)
    u = jnp.interp(p, cdf, u_grid)
    n = jax.random.normal(k_dir, (metric.dim,), dtype=u_grid.dtype)
    w = u * n / jnp.linalg.norm(n)
    if isinstance(metric, UnitEuclideanMetric):
        return w.astype(metric.dtype)
    if isinstance(metric, DiagEuclideanMetric):
        # rᵀM⁻¹r = |w|² ⇒ r = w / sqrt(M⁻¹)
        return (w / metric.sqrt_m_inv).astype(metric.dtype)
    raise NotImplementedError(
        "RelativisticKinetic supports unit/diagonal metrics "
        "(as in /root/reference/research/src/relativistic_hmc.jl)"
    )
