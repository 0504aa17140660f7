"""Riemannian metrics: position-dependent G(θ) with Identity / SoftAbs maps.

TPU-native redesign of /root/reference/src/riemannian/hamiltonian.jl:154-220.
`softabs` uses `jnp.linalg.eigh`, which is differentiable in JAX — removing
the reference's ReverseDiff-cannot-diff-eigen caveat (riemannian/hamiltonian.jl:169).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class IdentityMap:
    """G ↦ G (ref riemannian/hamiltonian.jl:158-160)."""


@dataclasses.dataclass(frozen=True)
class SoftAbsMap:
    """Eigendecomposition PSD-ification λ ↦ λ·coth(αλ)
    (Betancourt 2012; ref riemannian/hamiltonian.jl:162-176)."""

    alpha: float = 20.0


def _coth(x):
    return 1.0 / jnp.tanh(x)


def softabs(x, alpha=20.0):
    """Return (softabs(X), Q, λ, softabs(λ)) (ref :168-174).

    softabs(X) = Q · diag(λ coth(αλ)) · Qᵀ; uses a Taylor-safe form at λ→0
    (λ coth(αλ) → 1/α)."""
    lam, q = jnp.linalg.eigh(x)
    al = alpha * lam
    soft = jnp.where(jnp.abs(al) < 1e-4, (1.0 + jnp.square(al) / 3.0) / alpha,
                     lam * _coth(al))
    g = (q * soft[None, :]) @ q.T
    return g, q, lam, soft


def apply_map(map_cfg, x):
    if isinstance(map_cfg, IdentityMap):
        return x
    return softabs(x, map_cfg.alpha)[0]


class DenseRiemannianMetric(struct.PyTreeNode):
    """Position-dependent dense metric G(θ) with analytic/AD derivative tensor.

    Mirrors `DenseRiemannianMetric(size, G, ∂G∂θ, map)`
    (ref riemannian/hamiltonian.jl:178-197). `g_fn(θ) → (D, D)`;
    `dg_fn(θ) → (D, D, D)` with `dg[:, :, i] = ∂G/∂θᵢ`.
    """

    size: int = struct.field(pytree_node=False)
    g_fn: Callable = struct.field(pytree_node=False)
    dg_fn: Callable = struct.field(pytree_node=False)
    map: object = struct.field(pytree_node=False, default=IdentityMap())

    @property
    def dim(self):
        return self.size

    @classmethod
    def from_hessian(cls, target, map_cfg=None, jitter=0.0):
        """G(θ) = -∇²logπ(θ) (+ jitter·I), derivatives by AD — the pattern of
        /root/reference/research/src/riemannian_hmc_utility.jl:1-117."""
        if map_cfg is None:
            map_cfg = SoftAbsMap(20.0)

        def g_fn(theta):
            h = -jax.hessian(target.logdensity)(theta)
            if jitter:
                h = h + jitter * jnp.eye(theta.shape[-1], dtype=theta.dtype)
            return h

        def dg_fn(theta):
            # jacfwd returns (D, D, D) with last axis = ∂/∂θᵢ, matching the
            # reference's ∂G∂θ[:, :, i] layout.
            return jax.jacfwd(g_fn)(theta)

        return cls(size=target.dim, g_fn=g_fn, dg_fn=dg_fn, map=map_cfg)
