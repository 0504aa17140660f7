"""Riemannian Hamiltonian: position-dependent kinetic energy and gradients.

TPU-native redesign of /root/reference/src/riemannian/hamiltonian.jl:229-358
(Girolami & Calderhead 2011 Eqs 13-15; Betancourt 2012 SoftAbs gradients).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..target import LogDensityTarget
from ..utils import clamp_nonfinite
from .metric import DenseRiemannianMetric, IdentityMap, SoftAbsMap, softabs


class RiemannianPhasePoint(struct.PyTreeNode):
    """Phase point caching ℓπ, the full ∂H∂θ (which depends on θ AND r), and
    the position-dependent negative kinetic energy."""

    theta: jnp.ndarray
    r: jnp.ndarray
    logdensity: jnp.ndarray
    dHdtheta: jnp.ndarray   # ∂H∂θ(θ, r) — NOT just -∇ℓπ
    neg_k: jnp.ndarray

    def neg_energy(self):
        return self.logdensity + self.neg_k

    def energy(self):
        return -(self.logdensity + self.neg_k)

    def is_finite(self):
        return jnp.isfinite(self.logdensity) & jnp.isfinite(self.neg_k)


def _dsoftabs_dlam(alpha, lam):
    """d/dλ [λ coth(αλ)] (ref riemannian/hamiltonian.jl:279), Taylor-safe."""
    al = alpha * lam
    coth = 1.0 / jnp.tanh(al)
    csch2 = 1.0 / jnp.square(jnp.sinh(al))
    val = coth - al * csch2
    return jnp.where(jnp.abs(al) < 1e-4, 2.0 * al / (3.0 * alpha) * alpha, val)


def _make_j(lam, alpha):
    """Betancourt's J matrix (ref riemannian/hamiltonian.jl:282-293):
    J_ij = (sλ_i - sλ_j)/(λ_i - λ_j), diagonal/degenerate → dsoftabs/dλ."""
    sl = lam / jnp.tanh(alpha * lam)
    sl = jnp.where(jnp.abs(alpha * lam) < 1e-4, 1.0 / alpha, sl)
    num = sl[:, None] - sl[None, :]
    den = lam[:, None] - lam[None, :]
    diag = _dsoftabs_dlam(alpha, lam)
    safe = jnp.abs(den) > 1e-10
    return jnp.where(safe, num / jnp.where(safe, den, 1.0),
                     0.5 * (diag[:, None] + diag[None, :]))


class RiemannianHamiltonian(struct.PyTreeNode):
    """Hamiltonian with DenseRiemannianMetric (GaussianKinetic only)."""

    metric: DenseRiemannianMetric
    target: LogDensityTarget = struct.field(pytree_node=False)

    @property
    def dim(self):
        return self.target.dim

    # -- G(θ) machinery --------------------------------------------------------

    def _mapped_g(self, theta):
        return self.metric.g_fn(theta), self.metric.map

    def neg_kinetic_energy(self, theta, r):
        """-K = -½(D·log2π + logdet G) - ½ rᵀG⁻¹r (Eq 13, ref :241-250)."""
        from .metric import apply_map

        g = apply_map(self.metric.map, self.metric.g_fn(theta))
        d = g.shape[-1]
        sign, logdet = jnp.linalg.slogdet(g)
        logz = 0.5 * (d * jnp.log(2 * jnp.pi) + logdet)
        quad = jnp.dot(r, jnp.linalg.solve(g, r))
        return -logz - 0.5 * quad

    def velocity(self, theta, r):
        """∂H∂r = G(θ)⁻¹ r (Eq 14, ref :346-358)."""
        from .metric import apply_map

        g = apply_map(self.metric.map, self.metric.g_fn(theta))
        return jnp.linalg.solve(g, r)

    def velocity_z(self, z):
        """∂H∂r at a phase point — position-dependent here; this is the hook
        the iterative NUTS tree uses so dynamic trajectories work on the
        Riemannian geometry too (beyond the reference, whose RMHMC is
        static-only: /root/reference/test/riemannian.jl uses FixedNSteps)."""
        return self.velocity(z.theta, z.r)

    def dH_dtheta(self, theta, r, cache=None, return_cache=False):
        """∂H∂θ(θ, r) (Eq 15 / Betancourt 2012; ref :253-343).

        `cache` carries the θ-only terms across the generalized-leapfrog
        fixed-point loop (ref ∂H∂θ_cache, riemannian/integrator.jl:62-68).
        """
        if isinstance(self.metric.map, IdentityMap):
            if cache is None:
                lp, glp = self.target.logdensity_and_grad(theta)
                g = self.metric.g_fn(theta)
                inv_g = jnp.linalg.inv(g)
                dg = self.metric.dg_fn(theta)           # (D, D, i)
                cache = (lp, glp, inv_g, dg)
            else:
                lp, glp, inv_g, dg = cache
            # gᵢ = ∂ℓπᵢ - ½tr(G⁻¹∂Gᵢ) + ½ rᵀG⁻¹ ∂Gᵢ G⁻¹r  (ref :266-273)
            tr_term = jnp.einsum("ab,bai->i", inv_g, dg)
            gr = inv_g @ r
            quad_term = jnp.einsum("a,abi,b->i", gr, dg, gr)
            grad_h = -(glp - 0.5 * tr_term + 0.5 * quad_term)
            out = (lp, grad_h)
            return (out, cache) if return_cache else out

        assert isinstance(self.metric.map, SoftAbsMap)
        alpha = self.metric.map.alpha
        if cache is None:
            lp, glp = self.target.logdensity_and_grad(theta)
            h_raw = self.metric.g_fn(theta)
            dh = self.metric.dg_fn(theta)               # (D, D, i)
            _, q, lam, soft_lam = softabs(h_raw, alpha)
            j = _make_j(lam, alpha)
            # term1 = Q diag(J_kk / sλ_k) Qᵀ (ref :317-326)
            term1 = (q * (jnp.diag(j) / soft_lam)[None, :]) @ q.T
            cache = (lp, glp, dh, q, soft_lam, j, term1)
        else:
            lp, glp, dh, q, soft_lam, j, term1 = cache
        # term2 = Q D J D Qᵀ with D = diag((Qᵀr)/sλ) (ref :330-332)
        dvec = (q.T @ r) / soft_lam
        term2 = (q * dvec[None, :]) @ j @ (dvec[:, None] * q.T)
        tr1 = jnp.einsum("ab,abi->i", term1, dh)
        tr2 = jnp.einsum("ab,abi->i", term2, dh)
        grad_h = -(glp - 0.5 * tr1 + 0.5 * tr2)         # (ref :333-339)
        out = (lp, grad_h)
        return (out, cache) if return_cache else out

    # -- phase points / momentum -----------------------------------------------

    def phasepoint(self, theta, r):
        lp, grad_h = self.dH_dtheta(theta, r)
        neg_k = self.neg_kinetic_energy(theta, r)
        return RiemannianPhasePoint(
            theta=theta,
            r=r,
            logdensity=clamp_nonfinite(jnp.asarray(lp)),
            dHdtheta=grad_h,
            neg_k=clamp_nonfinite(jnp.asarray(neg_k)),
        )

    def rand_momentum(self, key, theta):
        """r ~ N(0, G(θ)) via chol of G⁻¹ (ref :209-220)."""
        from .metric import apply_map

        g = apply_map(self.metric.map, self.metric.g_fn(theta))
        inv_g = jnp.linalg.inv(g)
        u = jnp.linalg.cholesky(inv_g).T  # upper, UᵀU = G⁻¹
        z = jax.random.normal(key, (self.dim,), dtype=theta.dtype)
        return jax.scipy.linalg.solve_triangular(u, z, lower=False)

    def init_phasepoint(self, key, theta):
        return self.phasepoint(theta, self.rand_momentum(key, theta))
