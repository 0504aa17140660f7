"""Experimental tier: Riemannian HMC (SoftAbs), generalized leapfrog,
relativistic kinetic energy (≅ /root/reference/src/riemannian/ +
/root/reference/research/src/)."""

from .metric import DenseRiemannianMetric, IdentityMap, SoftAbsMap, softabs
from .hamiltonian import RiemannianHamiltonian, RiemannianPhasePoint
from .integrator import (
    GeneralizedLeapfrog,
    generalized_leapfrog_step,
    transition_rmhmc,
)
from .relativistic import rand_momentum_relativistic
from .sampler import sample_rmhmc

__all__ = [
    "DenseRiemannianMetric",
    "IdentityMap",
    "SoftAbsMap",
    "softabs",
    "RiemannianHamiltonian",
    "RiemannianPhasePoint",
    "GeneralizedLeapfrog",
    "generalized_leapfrog_step",
    "transition_rmhmc",
    "rand_momentum_relativistic",
    "sample_rmhmc",
]
