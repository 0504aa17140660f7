"""Symplectic integrators (leapfrog family) as fused XLA scan loops.

TPU-native redesign of /root/reference/src/integrator.jl:

* One target-gradient evaluation per leapfrog step, with the gradient cached in
  the `PhasePoint` and reused across steps (mirrors the fused loop at
  /root/reference/src/integrator.jl:216-265).
* Multi-step trajectories run under `jax.lax.scan` with static step counts —
  no data-dependent Python control flow, so XLA compiles one fused kernel.
* The reference's early `break` on a non-finite phase point
  (/root/reference/src/integrator.jl:252-258) becomes a `done` flag in the scan
  carry: the first non-finite point is kept (its -Inf log density auto-rejects
  downstream) and all later steps are masked no-ops.
* Jittered and tempered variants mirror
  /root/reference/src/integrator.jl:112-156 (Stan-style ϵ0·(1+jitter·(2u-1)))
  and /root/reference/src/integrator.jl:174-209 (sqrt(α) momentum scaling on a
  half-step schedule).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .hamiltonian import Hamiltonian, PhasePoint


class Leapfrog(struct.PyTreeNode):
    """Leapfrog with fixed step size (ref /root/reference/src/integrator.jl:71-74)."""

    step_size: jnp.ndarray  # scalar, traced so adaptation can update it

    @property
    def nom_step_size(self):
        """Nominal step size used by adaptation (ref integrator.jl:26-32)."""
        return self.step_size

    @property
    def current_step_size(self):
        return self.step_size

    def with_nom_step_size(self, eps):
        """update_nom_step_size (ref integrator.jl:42-47,60)."""
        return self.replace(step_size=eps)

    def jitter(self, key):
        """No-op for plain leapfrog (ref integrator.jl:52)."""
        return self

    def temper_scale(self, i, is_half_first, n_steps):
        """Momentum tempering multiplier; identity for plain leapfrog."""
        return None

    def step(self, h, z, eps, step_index=0, n_steps=1):
        """One integrator step with signed step size (pluggable verb — the
        analogue of the reference's `step` dispatch surface that the
        OrdinaryDiffEq extension overloads, ext/…SymplecticRKExt.jl:6-47)."""
        return leapfrog_step(self, h, z, eps, step_index, n_steps)


class JitteredLeapfrog(struct.PyTreeNode):
    """Leapfrog with per-trajectory jittered step size.

    ϵ = ϵ0 · (1 + jitter · (2u − 1)), u ~ U(0,1)
    (ref /root/reference/src/integrator.jl:112-156, Stan base_hmc.hpp).
    """

    step_size0: jnp.ndarray      # nominal step size (adapted)
    step_size: jnp.ndarray       # current jittered step size
    jitter_frac: float = struct.field(pytree_node=False, default=0.1)

    @classmethod
    def create(cls, step_size0, jitter_frac=0.1):
        eps0 = jnp.asarray(step_size0)
        return cls(step_size0=eps0, step_size=eps0, jitter_frac=jitter_frac)

    @property
    def nom_step_size(self):
        return self.step_size0

    @property
    def current_step_size(self):
        return self.step_size

    def with_nom_step_size(self, eps):
        # also resets the current (jittered) value: a stale `step_size`
        # would otherwise leak the template's create-time ϵ into the first
        # transition of a fused block (jitter re-draws it at every
        # subsequent transition boundary / scan step)
        return self.replace(step_size0=eps, step_size=eps)

    def jitter(self, key):
        u = jax.random.uniform(key, dtype=jnp.result_type(self.step_size0))
        eps = self.step_size0 * (1 + self.jitter_frac * (2 * u - 1))
        return self.replace(step_size=eps)

    def temper_scale(self, i, is_half_first, n_steps):
        return None

    def step(self, h, z, eps, step_index=0, n_steps=1):
        return leapfrog_step(self, h, z, eps, step_index, n_steps)


class TemperedLeapfrog(struct.PyTreeNode):
    """Leapfrog with momentum tempering parameter α.

    Momentum is multiplied by sqrt(α) on the first half of the trajectory's
    half-steps and divided by sqrt(α) on the second half
    (ref /root/reference/src/integrator.jl:198-209).
    """

    step_size: jnp.ndarray
    alpha: float = struct.field(pytree_node=False, default=1.05)

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

    def temper_scale(self, i, is_half_first, n_steps):
        # i_temper = 2(i-1) + 1 + !is_half, 1-indexed (ref integrator.jl:207)
        i_temper = 2 * i + 1 + jnp.where(is_half_first, 0, 1)  # i is 0-indexed here
        sqrt_a = jnp.sqrt(jnp.asarray(self.alpha, dtype=jnp.result_type(self.step_size)))
        return jnp.where(i_temper <= n_steps, sqrt_a, 1.0 / sqrt_a)

    def step(self, h, z, eps, step_index=0, n_steps=1):
        return leapfrog_step(self, h, z, eps, step_index, n_steps)


class ComposedLeapfrog(struct.PyTreeNode):
    """Higher-order symplectic integrator as a composition of leapfrog steps
    with sub-step fractions γᵢ (triple-jump / Yoshida-style splitting).

    This is the pluggable-symplectic-solver capability of the reference's
    OrdinaryDiffEqSymplecticRK extension
    (/root/reference/ext/AdvancedHMCOrdinaryDiffEqSymplecticRKExt.jl:6-47),
    rebuilt natively: any palindromic composition Π L(γᵢ·ϵ) of the base
    leapfrog is itself symplectic and time-reversible; `yoshida4` gives the
    classic 4th-order triple jump.
    """

    step_size: jnp.ndarray
    gammas: tuple = struct.field(pytree_node=False)

    @classmethod
    def yoshida4(cls, step_size):
        w1 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
        w0 = 1.0 - 2.0 * w1
        return cls(step_size=jnp.asarray(step_size), gammas=(w1, w0, w1))

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

    def temper_scale(self, i, is_half_first, n_steps):
        return None

    def step(self, h, z, eps, step_index=0, n_steps=1):
        for g in self.gammas:
            z = leapfrog_step(self, h, z, g * eps)
        return z


class SolverIntegrator(struct.PyTreeNode):
    """Plug an EXTERNAL symplectic stepper into the kernel — the true
    third-party-solver extension point (the reference delegates to
    OrdinaryDiffEq solvers the same way,
    /root/reference/ext/AdvancedHMCOrdinaryDiffEqSymplecticRKExt.jl:6-47).

    `stepper(q, p, eps, grad_fn, velocity_fn) -> (q', p')` advances the
    Hamiltonian flow one step of size `eps` (signed; negative integrates
    backwards): `grad_fn(q)` is ∇ℓπ (the NEGATIVE potential gradient, i.e.
    ṗ = grad_fn(q)) and `velocity_fn(p)` is M⁻¹p (q̇). Any separable-
    Hamiltonian solver from an external library adapts in a few lines —
    e.g. diffrax's `SemiImplicitEuler`/`Yoshida` terms, or a hand-written
    Ruth/McLachlan composition (tests/test_integrators.py plugs in a
    third-order Ruth stepper and checks the O(ϵ³) local order).

    Correctness contract: the stepper must be symplectic and time-
    reversible (self-adjoint: integrating back with -eps inverts the flow)
    for the MH acceptance to be exact; the kernel handles the accept test,
    caching, and non-finite aborts. NOTE: asymmetric compositions like
    Ruth-3 are symplectic but NOT self-adjoint — backward integration with
    -eps is the adjoint method, not the inverse flow, so detailed balance
    (and hence MH exactness) holds only approximately, at the method's
    order. Prefer palindromic/symmetric steppers (leapfrog, Yoshida,
    symmetric McLachlan) when exactness matters. (The reference's
    OrdinaryDiffEq extension never checks this either.) The log density/gradient
    cache is refreshed once per step after the external stepper returns
    (one extra gradient per step vs the fused native leapfrog — the price
    of a black-box solver; prefer the native integrators when speed
    matters).
    """

    step_size: jnp.ndarray
    stepper: Callable = struct.field(pytree_node=False)

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

    def temper_scale(self, i, is_half_first, n_steps):
        return None

    def step(self, h, z, eps, step_index=0, n_steps=1):
        grad_fn = lambda q: h.target.logdensity_and_grad(q)[1]
        q, p = self.stepper(z.theta, z.r, eps, grad_fn, h.velocity)
        logdensity, grad = h.target.logdensity_and_grad(q)
        return h.phasepoint(q, p, logdensity=logdensity, grad=grad)


def leapfrog_step(
    integrator,
    h: Hamiltonian,
    z: PhasePoint,
    eps,
    step_index=0,
    n_steps=1,
) -> PhasePoint:
    """One fused kick-drift-kick step reusing the cached gradient.

    `eps` is the signed step size (negative integrates backwards in time).
    Mirrors the loop body at /root/reference/src/integrator.jl:233-259; note
    the reference's `gradient` is ∂H∂θ = -∇ℓπ while our cached `grad` is ∇ℓπ.
    """
    r = z.r
    scale = integrator.temper_scale(step_index, True, n_steps)
    if scale is not None:
        r = r * scale
    r = r + 0.5 * eps * z.grad
    theta = z.theta + eps * h.velocity(r)
    logdensity, grad = h.target.logdensity_and_grad(theta)
    r = r + 0.5 * eps * grad
    scale = integrator.temper_scale(step_index, False, n_steps)
    if scale is not None:
        r = r * scale
    return h.phasepoint(theta, r, logdensity=logdensity, grad=grad)


def leapfrog_steps(
    integrator,
    h: Hamiltonian,
    z: PhasePoint,
    n_steps: int,
    fwd: bool = True,
) -> PhasePoint:
    """Integrate `n_steps` leapfrog steps, aborting after a non-finite point.

    Static-shape scan equivalent of /root/reference/src/integrator.jl:216-265
    (no full-trajectory storage). Returns the final phase point — possibly the
    first non-finite one, whose clamped -Inf log density auto-rejects.
    """
    eps = integrator.current_step_size
    eps = jnp.where(fwd, eps, -eps) if not isinstance(fwd, bool) else (eps if fwd else -eps)

    def body(carry, i):
        z, done = carry
        z_new = integrator.step(h, z, eps, step_index=i, n_steps=n_steps)
        take = jnp.logical_not(done)
        z_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take, b, a), z, z_new
        )
        done_new = done | jnp.logical_not(z_new.is_finite())
        return (z_out, done_new), None

    (z_final, _), _ = jax.lax.scan(
        body, (z, jnp.asarray(False)), jnp.arange(n_steps)
    )
    return z_final


def leapfrog_trajectory(
    integrator,
    h: Hamiltonian,
    z: PhasePoint,
    n_steps: int,
    fwd: bool = True,
) -> Tuple[PhasePoint, jnp.ndarray]:
    """Integrate and return the whole trajectory (stacked) plus a taken-mask.

    Equivalent of `full_trajectory=Val(true)` at
    /root/reference/src/integrator.jl:229,249-258: entries after the first
    non-finite point are untaken (mask False); the non-finite point itself is
    kept in the trajectory (True) but carries -Inf weight downstream.
    """
    eps = integrator.current_step_size
    eps = jnp.where(fwd, eps, -eps) if not isinstance(fwd, bool) else (eps if fwd else -eps)

    def body(carry, i):
        z, done = carry
        z_new = integrator.step(h, z, eps, step_index=i, n_steps=n_steps)
        take = jnp.logical_not(done)
        z_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take, b, a), z, z_new
        )
        done_new = done | jnp.logical_not(z_new.is_finite())
        return (z_out, done_new), (z_out, take)

    (_, _), (zs, taken) = jax.lax.scan(
        body, (z, jnp.asarray(False)), jnp.arange(n_steps)
    )
    return zs, taken
