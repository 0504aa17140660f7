"""Static-trajectory HMC transitions (endpoint-MH and multinomial sampling).

TPU-native redesign of the static paths of /root/reference/src/trajectory.jl:

* `transition` for `StaticTerminationCriterion` mirrors
  /root/reference/src/trajectory.jl:271-300 (integrate → sample phase point →
  accept/reject → negate momentum).
* The endpoint sampler mirrors :336-340; the multinomial sampler mirrors
  :369-390 but replaces the stored `[n_steps][dim]` trajectory + categorical
  draw with a *streaming* Gumbel-free reservoir inside one `lax.scan`: each
  new leaf replaces the running candidate with probability
  w_leaf / w_so_far — distributionally identical to the reference's
  `randcat` over the whole trajectory, with O(1) memory.
* The reference's random forward/backward split (`rand_coupled(rng, 0:L)`,
  :373) is a traced integer: the scan takes L steps total, integrating
  backwards for the first `n_bwd` steps, then restarting from the origin and
  integrating forwards — preserving one gradient evaluation per step.
* Everything is single-chain and vmappable; data-dependent trajectory lengths
  (FixedIntegrationTime, :241-243) run under a bounded `lax.while_loop`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .hamiltonian import (
    AnyRefreshment,
    FullMomentumRefreshment,
    Hamiltonian,
    PhasePoint,
)
from .integrators import leapfrog_step, leapfrog_steps
from .termination import (
    ENDPOINT,
    MULTINOMIAL,
    DynamicTerminationCriterion,
    FixedIntegrationTime,
    FixedNSteps,
    StaticTerminationCriterion,
    TerminationCriterion,
    check_ts_kind,
)
from .utils import rand_exponential


class Trajectory(struct.PyTreeNode):
    """Integrator + termination criterion + (static) trajectory sampler kind.

    Analogue of `Trajectory{TS,I,TC}` (/root/reference/src/trajectory.jl:213-224):
    the integrator is a pytree (its step size adapts), the criterion and TS
    kind are static config.
    """

    integrator: "object"
    criterion: TerminationCriterion = struct.field(pytree_node=False)
    ts_kind: str = struct.field(pytree_node=False, default=MULTINOMIAL)
    # Optional reduced-precision storage for the NUTS U-turn checkpoint
    # stacks (e.g. "bfloat16"): halves the dominant hot-loop HBM/VMEM
    # traffic on TPU at the cost of bf16 rounding in the U-turn dot
    # products (a stopping heuristic — the invariant distribution is
    # unaffected; termination decisions remain deterministic). None keeps
    # full precision (the default; required for oracle-exact tests).
    stack_dtype: str = struct.field(pytree_node=False, default=None)
    # Matmul precision for the fused U-turn stack read. None lets XLA's
    # bfloat16-propagation pass demote the checkpoint stacks to bf16 (their
    # only consumer is this dot); "highest" pins the dot — and therefore the
    # stack buffers — to float32.
    uturn_precision: str = struct.field(pytree_node=False, default=None)

    def __post_init__(self):
        check_ts_kind(self.ts_kind, self.criterion)

    def with_nom_step_size(self, eps):
        return self.replace(integrator=self.integrator.with_nom_step_size(eps))


class HMCKernel(struct.PyTreeNode):
    """Momentum refreshment + trajectory (ref /root/reference/src/trajectory.jl:249-254)."""

    trajectory: Trajectory
    refreshment: AnyRefreshment = FullMomentumRefreshment()

    def with_nom_step_size(self, eps):
        return self.replace(trajectory=self.trajectory.with_nom_step_size(eps))


def mh_accept_ratio(key, h_original, h_proposal):
    """Log-space MH accept: H' < H + Exp(1); α = min(1, exp(H-H')).

    Mirrors /root/reference/src/trajectory.jl:855-861. A NaN/Inf proposal
    energy (clamped upstream) yields accept=False, α=0.
    """
    dtype = jnp.result_type(h_original)
    e = rand_exponential(key, dtype=dtype)
    accept = h_proposal < h_original + e
    delta = h_original - h_proposal
    alpha = jnp.exp(jnp.minimum(delta, jnp.zeros((), dtype)))
    alpha = jnp.where(jnp.isnan(alpha), jnp.zeros_like(alpha), alpha)
    return accept, alpha


def _flip_momentum(z: PhasePoint) -> PhasePoint:
    """Negate momentum to preserve reversibility (ref trajectory.jl:283).

    The Gaussian kinetic energy is even in r, so cached ℓκ is unchanged.
    """
    return z.replace(r=-z.r)


def _select_phasepoint(pred, a: PhasePoint, b: PhasePoint) -> PhasePoint:
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _num_static_steps(traj: Trajectory):
    """(static_bound, traced_count) for the static trajectory length.

    Mirrors `nsteps` (/root/reference/src/trajectory.jl:240-243).
    """
    c = traj.criterion
    if isinstance(c, FixedNSteps):
        return c.n_steps, jnp.asarray(c.n_steps, dtype=jnp.int32)
    if isinstance(c, FixedIntegrationTime):
        eps = traj.integrator.nom_step_size
        n = jnp.maximum(1, jnp.floor(c.lam / eps)).astype(jnp.int32)
        n = jnp.minimum(n, c.max_steps)
        return c.max_steps, n
    raise TypeError(f"not a static criterion: {type(c)}")


def transition_static(key, h: Hamiltonian, traj: Trajectory, z: PhasePoint,
                      coupled_key=None):
    """One static-HMC transition; returns (z_next, stats dict).

    Mirrors /root/reference/src/trajectory.jl:271-300. `coupled_key`, when
    given, is a key shared across all vmapped chains and drives the
    forward/backward split — the reference's `rand_coupled` semantics
    (/root/reference/src/trajectory.jl:373, src/utilities.jl:39-47).
    """
    h0 = z.energy()
    key_sample, key_mh = jax.random.split(key)

    if traj.ts_kind == ENDPOINT:
        z_prop, is_accept, alpha, numerical_error, n_steps = _endpoint_proposal(
            key_mh, h, traj, z
        )
        z_next = _select_phasepoint(is_accept, z_prop, z)
    elif traj.ts_kind == MULTINOMIAL:
        z_prop, is_accept, alpha, numerical_error, n_steps = _multinomial_proposal(
            key_sample, h, traj, z, coupled_key=coupled_key
        )
        z_next = z_prop
    else:  # pragma: no cover
        raise ValueError(traj.ts_kind)

    z_next = _flip_momentum(z_next)
    h_next = z_next.energy()
    stats = {
        "n_steps": n_steps,
        "is_accept": is_accept,
        "acceptance_rate": alpha,
        "log_density": z_next.logdensity,
        "hamiltonian_energy": h_next,
        "hamiltonian_energy_error": h_next - h0,
        "numerical_error": numerical_error,
        "step_size": traj.integrator.current_step_size,
        "nom_step_size": traj.integrator.nom_step_size,
    }
    return z_next, stats


def _endpoint_proposal(key, h, traj: Trajectory, z: PhasePoint):
    """Endpoint proposal + MH (ref /root/reference/src/trajectory.jl:336-340)."""
    bound, n_steps = _num_static_steps(traj)
    integ = traj.integrator
    eps = integ.current_step_size

    if isinstance(traj.criterion, FixedNSteps):
        z_prop = leapfrog_steps(integ, h, z, bound, fwd=True)
    else:
        # Bounded while_loop: runs max-over-chains iterations under vmap
        # instead of always `bound`.
        def cond(carry):
            i, _, done = carry
            return jnp.logical_not(done)

        def body(carry):
            i, zc, done = carry
            z_new = integ.step(h, zc, eps, step_index=i, n_steps=n_steps)
            done_new = jnp.logical_not(z_new.is_finite()) | (i + 1 >= n_steps)
            return (i + 1, z_new, done_new)

        _, z_prop, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), z, n_steps <= 0))

    h_prop = z_prop.energy()
    is_accept, alpha = mh_accept_ratio(key, z.energy(), h_prop)
    numerical_error = jnp.logical_not(jnp.isfinite(h_prop))
    return z_prop, is_accept, alpha, numerical_error, n_steps


def _multinomial_proposal(key, h, traj: Trajectory, z: PhasePoint,
                          coupled_key=None):
    """Streaming multinomial sampling over a randomly split trajectory.

    Distributionally equivalent to /root/reference/src/trajectory.jl:369-390:
    the candidate is drawn from all L+1 trajectory points with probability
    ∝ exp(-H); the acceptance statistic α is the trajectory mean of
    min(1, exp(H0 - H_i)).
    """
    bound, n_steps = _num_static_steps(traj)
    integ = traj.integrator
    eps = integ.current_step_size
    key_split, key_scan = jax.random.split(key)
    h0 = z.energy()
    dtype = jnp.result_type(h0)

    # Random forward/backward split (ref :373). With `coupled_key` set, all
    # chains share one split draw (`rand_coupled`, ref utilities.jl:39-47).
    if coupled_key is not None:
        key_split = coupled_key
    n_fwd = jax.random.randint(key_split, (), 0, n_steps + 1)
    n_bwd = n_steps - n_fwd

    # Initial reservoir holds the origin with weight exp(-H0) (ℓw relative
    # weights use -H_i; constant shifts cancel in the reservoir ratio).
    init = dict(
        z_edge=z,
        z_cand=z,
        logw=-h0,
        sum_alpha=jnp.minimum(jnp.asarray(1.0, dtype), jnp.exp(h0 - h0)),
        count=jnp.asarray(1.0, dtype),
        done_dir=jnp.asarray(False),
    )

    def body(carry):
        t = carry["t"]
        key_t = jax.random.fold_in(key_scan, t)
        in_bwd = t < n_bwd
        switching = t == n_bwd  # first forward step restarts from the origin
        z_from = _select_phasepoint(switching, z, carry["z_edge"])
        done_dir = jnp.where(switching, jnp.asarray(False), carry["done_dir"])
        seg_len = jnp.where(in_bwd, n_bwd, n_fwd)
        seg_idx = jnp.where(in_bwd, t, t - n_bwd)
        eps_signed = jnp.where(in_bwd, -eps, eps)
        z_new = integ.step(
            h, z_from, eps_signed, step_index=seg_idx, n_steps=seg_len
        )
        active = jnp.logical_not(done_dir) & (t < n_steps)
        z_edge = _select_phasepoint(active, z_new, z_from)
        done_dir = done_dir | jnp.logical_not(z_new.is_finite())

        h_new = z_new.energy()
        lw_new = jnp.where(active, -h_new, -jnp.inf)
        logw = jnp.logaddexp(carry["logw"], lw_new)
        u = jax.random.uniform(key_t, dtype=dtype)
        take = jnp.log(u) < lw_new - logw
        z_cand = _select_phasepoint(take, z_new, carry["z_cand"])

        alpha_new = jnp.exp(jnp.minimum(jnp.zeros((), dtype), h0 - h_new))
        alpha_new = jnp.where(jnp.isnan(alpha_new), 0.0, alpha_new)
        sum_alpha = carry["sum_alpha"] + jnp.where(active, alpha_new, 0.0)
        count = carry["count"] + jnp.where(active, 1.0, 0.0)
        return dict(
            z_edge=z_edge,
            z_cand=z_cand,
            logw=logw,
            sum_alpha=sum_alpha,
            count=count,
            done_dir=done_dir,
            t=t + 1,
        )

    # Bounded while_loop: runs the traced step count (max over vmapped
    # chains), not the static `bound` — the win for FixedIntegrationTime's
    # adapted, data-dependent lengths (ref trajectory.jl:241-243).
    init["t"] = jnp.asarray(0, jnp.int32)
    carry = jax.lax.while_loop(
        lambda c: c["t"] < n_steps, body, init
    )

    alpha = carry["sum_alpha"] / carry["count"]
    z_prop = carry["z_cand"]
    numerical_error = jnp.logical_not(jnp.isfinite(z_prop.energy()))
    is_accept = jnp.asarray(True)
    return z_prop, is_accept, alpha, numerical_error, n_steps
