"""Hamiltonian layer: energies, phase points, momentum refreshment.

TPU-native redesign of /root/reference/src/hamiltonian.jl:

* `PhasePoint` is an immutable pytree caching the target log density, its
  gradient, and the negative kinetic energy — one gradient evaluation per
  leapfrog step is reused across the trajectory exactly like the reference's
  `DualValue` caching (/root/reference/src/hamiltonian.jl:22-42).
* Non-finite log densities / kinetic energies are clamped to -Inf at phase
  point construction so Metropolis-Hastings steps auto-reject
  (/root/reference/src/hamiltonian.jl:93-106).
* Momentum refreshment (full and partial) mirrors
  /root/reference/src/hamiltonian.jl:211-254.

Everything is single-chain; chains batch via `jax.vmap` at the sampler layer.
"""

from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp
from flax import struct

from .kinetic import GaussianKinetic, RelativisticKinetic
from .metrics import Metric, UnitEuclideanMetric, DiagEuclideanMetric
from .target import LogDensityTarget
from .utils import clamp_nonfinite


class PhasePoint(struct.PyTreeNode):
    """Position + momentum with cached energies and target gradient.

    Mirrors `PhasePoint` (/root/reference/src/hamiltonian.jl:88-107);
    `logdensity` is ℓπ.value, `grad` is ℓπ.gradient, `neg_k` is ℓκ.value.
    """

    theta: jnp.ndarray       # (dim,)
    r: jnp.ndarray           # (dim,)
    logdensity: jnp.ndarray  # scalar, clamped to -inf when non-finite
    grad: jnp.ndarray        # (dim,) gradient of logdensity at theta
    neg_k: jnp.ndarray       # scalar, -K(r), clamped to -inf when non-finite

    def neg_energy(self):
        """-H(z) = ℓπ + ℓκ (ref /root/reference/src/hamiltonian.jl:149)."""
        return self.logdensity + self.neg_k

    def energy(self):
        return -(self.logdensity + self.neg_k)

    def is_finite(self):
        """Finite ℓπ and ℓκ (ref /root/reference/src/hamiltonian.jl:141-142).

        Gradient finiteness is folded into ℓπ in practice: a NaN gradient at a
        finite ℓπ will poison the next step's ℓπ instead.
        """
        return jnp.isfinite(self.logdensity) & jnp.isfinite(self.neg_k)


class Hamiltonian(struct.PyTreeNode):
    """Bundles metric, kinetic energy, and the target density.

    Mirrors `Hamiltonian` (/root/reference/src/hamiltonian.jl:1-6). The target
    and kinetic config are static (not traced); the metric is a pytree whose
    leaves are the adapted mass-matrix arrays.
    """

    metric: Metric
    target: LogDensityTarget = struct.field(pytree_node=False)
    kinetic: Union[GaussianKinetic, RelativisticKinetic] = struct.field(
        pytree_node=False, default=GaussianKinetic()
    )

    @property
    def dim(self):
        return self.target.dim

    # -- kinetic-energy dispatch ------------------------------------------------

    def neg_kinetic_energy(self, r):
        if isinstance(self.kinetic, GaussianKinetic):
            return self.metric.neg_kinetic_energy(r)
        return _relativistic_neg_kinetic(self.kinetic, self.metric, r)

    def velocity(self, r):
        """∂H∂r (ref /root/reference/src/hamiltonian.jl:50-80)."""
        if isinstance(self.kinetic, GaussianKinetic):
            return self.metric.velocity(r)
        return _relativistic_velocity(self.kinetic, self.metric, r)

    def velocity_z(self, z):
        """∂H∂r at a phase point (position-independent for Euclidean
        metrics; the Riemannian Hamiltonian overrides this — the indirection
        lets the iterative NUTS machinery run on both geometries)."""
        return self.velocity(z.r)

    # -- phase point construction ----------------------------------------------

    def phasepoint(self, theta, r, logdensity=None, grad=None):
        """Build a phase point, evaluating ℓπ/∇ℓπ unless provided.

        Mirrors `phasepoint` (/root/reference/src/hamiltonian.jl:115-133).
        """
        if logdensity is None or grad is None:
            logdensity, grad = self.target.logdensity_and_grad(theta)
        neg_k = self.neg_kinetic_energy(r)
        return PhasePoint(
            theta=theta,
            r=r,
            logdensity=clamp_nonfinite(jnp.asarray(logdensity)),
            grad=grad,
            neg_k=clamp_nonfinite(jnp.asarray(neg_k)),
        )

    def rand_momentum(self, key):
        if isinstance(self.kinetic, GaussianKinetic):
            return self.metric.rand_momentum(key)
        return _relativistic_rand_momentum(self.kinetic, self.metric, key)

    def init_phasepoint(self, key, theta):
        """Fresh-momentum phase point (ref /root/reference/src/hamiltonian.jl:200-206)."""
        return self.phasepoint(theta, self.rand_momentum(key))


# -- momentum refreshment ------------------------------------------------------


class FullMomentumRefreshment(struct.PyTreeNode):
    """Completely resample momentum (ref /root/reference/src/hamiltonian.jl:211-220)."""

    def refresh(self, key, h: Hamiltonian, z: PhasePoint) -> PhasePoint:
        r = h.rand_momentum(key)
        return h.phasepoint(z.theta, r, logdensity=z.logdensity, grad=z.grad)


class PartialMomentumRefreshment(struct.PyTreeNode):
    """r' = α·r + sqrt(1-α²)·G (ref /root/reference/src/hamiltonian.jl:239-254)."""

    alpha: float

    def refresh(self, key, h: Hamiltonian, z: PhasePoint) -> PhasePoint:
        g = h.rand_momentum(key)
        a = jnp.asarray(self.alpha, dtype=z.r.dtype)
        r = a * z.r + jnp.sqrt(1 - a**2) * g
        return h.phasepoint(z.theta, r, logdensity=z.logdensity, grad=z.grad)


AnyRefreshment = Union[FullMomentumRefreshment, PartialMomentumRefreshment]


# -- relativistic kinetic (experimental tier) ----------------------------------


def _mass_inv_diag(metric: Metric):
    if isinstance(metric, UnitEuclideanMetric):
        return jnp.ones((metric.dim,), dtype=metric.dtype)
    if isinstance(metric, DiagEuclideanMetric):
        return metric.m_inv
    raise NotImplementedError(
        "RelativisticKinetic supports unit/diagonal metrics only "
        "(as in /root/reference/research/src/relativistic_hmc.jl)"
    )


def _relativistic_mass_term(kinetic: RelativisticKinetic, metric: Metric, r):
    m_inv = _mass_inv_diag(metric)
    m, c = kinetic.m, kinetic.c
    return jnp.sqrt(jnp.sum(jnp.square(r) * m_inv) / (m**2 * c**2) + 1.0)


def _relativistic_neg_kinetic(kinetic: RelativisticKinetic, metric: Metric, r):
    # K(r) = m c² sqrt(rᵀM⁻¹r / (m²c²) + 1)
    m, c = kinetic.m, kinetic.c
    return -m * c**2 * _relativistic_mass_term(kinetic, metric, r)


def _relativistic_velocity(kinetic: RelativisticKinetic, metric: Metric, r):
    # ∂K/∂r = M⁻¹ r / (m · sqrt(...))
    m_inv = _mass_inv_diag(metric)
    denom = kinetic.m * _relativistic_mass_term(kinetic, metric, r)
    return m_inv * r / denom


def _relativistic_rand_momentum(kinetic: RelativisticKinetic, metric: Metric, key):
    # Deferred to the experimental module (adaptive rejection sampling in the
    # reference, /root/reference/research/src/relativistic_hmc.jl:48-60).
    from .riemannian.relativistic import rand_momentum_relativistic

    return rand_momentum_relativistic(kinetic, metric, key)
