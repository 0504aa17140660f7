"""Generalized (implicit) leapfrog for Riemannian HMC + endpoint transition.

TPU-native redesign of /root/reference/src/riemannian/integrator.jl:15-103
(Girolami & Calderhead 2011 Eqs 16-18): the two implicit updates run as
fixed-count fixed-point loops (static `n_fp` iterations — compiler-friendly,
no data-dependent convergence test), with the θ-only SoftAbs terms cached
across the r-half fixed-point exactly like the reference's ∂H∂θ_cache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..trajectory import mh_accept_ratio
from .hamiltonian import RiemannianHamiltonian, RiemannianPhasePoint


class GeneralizedLeapfrog(struct.PyTreeNode):
    """Implicit leapfrog with `n_fp` fixed-point iterations
    (ref riemannian/integrator.jl:17-21)."""

    step_size: jnp.ndarray
    n_fp: int = struct.field(pytree_node=False, default=6)

    @property
    def nom_step_size(self):
        return self.step_size

    @property
    def current_step_size(self):
        return self.step_size

    def with_nom_step_size(self, eps):
        return self.replace(step_size=eps)

    def jitter(self, key):
        return self

    def step(self, h, z, eps, step_index=0, n_steps=1):
        """Integrator-protocol step — lets this integrator slot into the
        iterative NUTS machinery (nuts.py) for Riemannian NUTS."""
        return generalized_leapfrog_step(self, h, z, eps)


def generalized_leapfrog_step(
    integ: GeneralizedLeapfrog,
    h: RiemannianHamiltonian,
    z: RiemannianPhasePoint,
    eps,
) -> RiemannianPhasePoint:
    """One implicit step (ref riemannian/integrator.jl:34-103).

    Eq 16: r½ = r₀ - ϵ/2 ∂H∂θ(θ₀, r½)   — fixed point in r½, θ-terms cached;
    Eq 17: θ₁ = θ₀ + ϵ/2 (∂H∂r(θ₀,r½) + ∂H∂r(θ₁,r½)) — fixed point in θ₁;
    Eq 18: r₁ = r½ - ϵ/2 ∂H∂θ(θ₁, r½).
    """
    theta0, r0 = z.theta, z.r

    # --- Eq 16: implicit half kick. Iteration 1 reuses the phase point's
    # cached ∂H∂θ (ref :62-63); iteration 2 computes and caches the θ-only
    # terms (ref :64-66); further iterations reuse the cache (ref :67-68).
    r_half = r0 - 0.5 * eps * z.dHdtheta
    (_, grad2), cache = h.dH_dtheta(theta0, r_half, return_cache=True)
    r_half = r0 - 0.5 * eps * grad2

    def kick_body(i, r_half):
        _, grad_h = h.dH_dtheta(theta0, r_half, cache=cache)
        return r0 - 0.5 * eps * grad_h

    r_half = jax.lax.fori_loop(0, max(integ.n_fp - 2, 0), kick_body, r_half)

    # --- Eq 17: implicit drift. term1 = ∂H∂r(θ₀, r½) fixed (ref :75).
    term1 = h.velocity(theta0, r_half)

    def drift_body(i, theta_full):
        return theta0 + 0.5 * eps * (term1 + h.velocity(theta_full, r_half))

    theta_full = jax.lax.fori_loop(0, integ.n_fp, drift_body, theta0)

    # --- Eq 18: explicit half kick at the new position.
    lp, grad_h = h.dH_dtheta(theta_full, r_half)
    r_full = r_half - 0.5 * eps * grad_h

    from ..utils import clamp_nonfinite

    neg_k = h.neg_kinetic_energy(theta_full, r_full)
    # ∂H∂θ cache of the new point is at (θ₁, r₁), recomputed lazily: use the
    # r½ gradient as the stored seed exactly like the reference caches the
    # Eq-18 DualValue (ref :81-87).
    return RiemannianPhasePoint(
        theta=theta_full,
        r=r_full,
        logdensity=clamp_nonfinite(jnp.asarray(lp)),
        dHdtheta=grad_h,
        neg_k=clamp_nonfinite(jnp.asarray(neg_k)),
    )


def transition_rmhmc(key, h: RiemannianHamiltonian, integ: GeneralizedLeapfrog,
                     n_steps: int, z: RiemannianPhasePoint):
    """Static endpoint-MH Riemannian transition (the reference's supported
    combination: GeneralizedLeapfrog + EndPointTS + FixedNSteps,
    /root/reference/research/tests + test/riemannian.jl)."""
    h0 = z.energy()
    eps = integ.current_step_size

    def body(carry, _):
        zc, done = carry
        z_new = generalized_leapfrog_step(integ, h, zc, eps)
        take = jnp.logical_not(done)
        z_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take, b, a), zc, z_new
        )
        return (z_out, done | jnp.logical_not(z_new.is_finite())), None

    (z_prop, _), _ = jax.lax.scan(body, (z, jnp.asarray(False)), None,
                                  length=n_steps)
    is_accept, alpha = mh_accept_ratio(key, h0, z_prop.energy())
    z_next = jax.tree_util.tree_map(
        lambda a, b: jnp.where(is_accept, a, b), z_prop, z
    )
    z_next = z_next.replace(r=-z_next.r)
    stats = {
        "n_steps": jnp.asarray(n_steps),
        "is_accept": is_accept,
        "acceptance_rate": alpha,
        "log_density": z_next.logdensity,
        "hamiltonian_energy": z_next.energy(),
        "hamiltonian_energy_error": z_next.energy() - h0,
        "numerical_error": jnp.logical_not(jnp.isfinite(z_prop.energy())),
        "step_size": eps,
        "nom_step_size": eps,
    }
    return z_next, stats
