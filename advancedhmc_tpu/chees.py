"""ChEES-HMC: jittered fixed-length HMC with gradient-based trajectory-length
adaptation (Hoffman, Radul & Sountsov 2021) — see adaptation/chees.py for the
criterion. Step size follows Nesterov dual averaging (default target 0.651,
the optimal acceptance rate for jittered-HMC per the paper) and the mass
matrix follows the Stan windowed cross-chain Welford schedule, both reusing
the engine's standard adaptation layer.

Capability beyond the reference: AdvancedHMC.jl has no trajectory-length
adaptation at all (HMCDA's λ is fixed, /root/reference/src/constructors.jl:
148-165; NUTS side-steps the problem with tree doubling). ChEES-HMC is the
TPU-friendly alternative to NUTS: every chain runs the SAME number of
leapfrog steps per iteration (the jitter u_m and length T are shared), so
there is zero lane divergence under vmap — the while-loop trip count is
uniform device-wide, unlike NUTS where chains wait for the slowest tree.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .adaptation import AdaptorConfig, AdaptState, adapt_flags, adapt_step_batch
from .adaptation.chees import (
    CheesConfig,
    CheesState,
    chees_update,
    halton_sequence,
)
from .adaptation.stepsize import DualAveragingConfig
from .hamiltonian import Hamiltonian
from .metrics import Metric, make_metric
from .sampler import SampleResult
from .stepsize_search import find_good_stepsize
from .target import LogDensityTarget


def _batched_lp_grad(target, thetas):
    return jax.vmap(target.logdensity_and_grad)(thetas)


def chees_transition(key, target, metric, eps, tau, max_steps,
                     theta, lp, grad):
    """One jittered-HMC transition over the whole chain batch.

    The leapfrog trip count n = clip(ceil(τ/ϵ), 1, max_steps) is a traced
    scalar shared by every chain — `fori_loop` lowers to a single uniform
    while-loop (no per-chain divergence). Returns the accepted state plus the
    proposal quantities ChEES needs (proposed θ′, end velocity, per-chain α).
    """
    n_chains = theta.shape[0]
    dtype = theta.dtype
    n = jnp.clip(jnp.ceil(tau / eps).astype(jnp.int32), 1, max_steps)

    k_mom, k_mh = jax.random.split(key)
    r0 = jax.vmap(metric.rand_momentum)(jax.random.split(k_mom, n_chains))
    neg_k0 = jax.vmap(metric.neg_kinetic_energy)(r0)
    h0 = -(lp + neg_k0)                                        # (C,)

    # leapfrog: half kick folded as n full kicks minus a trailing half
    r = r0 + 0.5 * eps * grad

    def body(i, carry):
        th, rr, _, g = carry
        th = th + eps * jax.vmap(metric.velocity)(rr)
        lp_i, g_i = _batched_lp_grad(target, th)
        rr = rr + eps * g_i
        return (th, rr, lp_i, g_i)

    theta1, r1, lp1, grad1 = jax.lax.fori_loop(
        0, n, body, (theta, r, lp, grad)
    )
    r1 = r1 - 0.5 * eps * grad1

    lp1c = jnp.where(jnp.isfinite(lp1), lp1, -jnp.inf)
    neg_k1 = jax.vmap(metric.neg_kinetic_energy)(r1)
    h1 = -(lp1c + jnp.where(jnp.isfinite(neg_k1), neg_k1, -jnp.inf))
    dh = h1 - h0
    alpha = jnp.exp(jnp.minimum(jnp.zeros_like(dh), -dh))
    alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)            # (C,)
    accept = jax.random.uniform(k_mh, (n_chains,), dtype) < alpha

    v_prop = jax.vmap(metric.velocity)(r1)
    acc = accept[:, None]
    theta_new = jnp.where(acc, theta1, theta)
    lp_new = jnp.where(accept, lp1c, lp)
    grad_new = jnp.where(acc, grad1, grad)

    stats = {
        "n_steps": jnp.broadcast_to(n, (n_chains,)),
        "is_accept": accept,
        "acceptance_rate": alpha,
        "log_density": lp_new,
        "hamiltonian_energy": jnp.where(accept, h1, h0),
        "hamiltonian_energy_error": jnp.where(accept, dh, jnp.zeros_like(dh)),
        "numerical_error": ~jnp.isfinite(h1),
        "step_size": jnp.broadcast_to(eps, (n_chains,)),
        "trajectory_length": jnp.broadcast_to(tau, (n_chains,)),
    }
    return (theta_new, lp_new, grad_new), (theta1, v_prop, alpha), stats


def chees_tau_sweep(n_total: int, n_adapts: int, boost: float = 8.0,
                    frac: float = 0.5) -> np.ndarray:
    """Long→converged warmup τ-schedule: an (n_total,) multiplier on the
    adapted mean trajectory length, decaying geometrically from `boost` to 1
    over the first `frac` of warmup and 1 thereafter. Long early
    trajectories explore multiscale geometry (e.g. the funnel mouth) before
    the SGA settles; the SGA still adapts on the ACTUAL τ used, so the
    finalized T is unaffected by the sweep tail. Pass as
    `sample_chees(..., t_schedule=...)`."""
    sched = np.ones(n_total)
    n_sweep = max(1, int(n_adapts * frac))
    sched[:n_sweep] = boost ** (1.0 - np.arange(n_sweep) / n_sweep)
    return sched


def make_chees_step(target, cfg: AdaptorConfig, chees: CheesConfig,
                    max_steps: int):
    """Build the per-iteration scan step shared by `sample_chees` and
    chunked drivers (bench.py runs the same step in host-synced chunks to
    respect the TPU tunnel's per-execution limit).

    carry = (theta, lp, grad, metric, AdaptState, CheesState, key);
    xs = (flags_slice, u) with u the Halton jitter for the iteration, or
    (flags_slice, u, s) with s a per-iteration τ multiplier (the warmup
    sweep of `chees_tau_sweep`).
    """

    def step(carry, xs):
        theta, lp, grad, metric_c, adapt, cs, k = carry
        if len(xs) == 3:
            f, u, s = xs
        else:
            f, u = xs
            s = jnp.ones(())
        k, k_tr = jax.random.split(k)
        is_adapt = f["is_adapt"]
        # post-warmup uses the finalized (iterate-averaged) T
        t_mean = jnp.where(is_adapt, cs.trajectory_length,
                           jnp.exp(cs.log_t_avg))
        # τ-schedule multipliers are a WARMUP exploration aid: force s=1 on
        # draw iterations so a user schedule with a non-1 tail cannot
        # silently rescale post-warmup trajectory lengths (ADVICE r4).
        s = jnp.where(is_adapt, s, jnp.ones_like(s))
        tau = u * t_mean * s
        (theta_n, lp_n, grad_n), (theta_p, v_p, alpha), stats = (
            chees_transition(k_tr, target, metric_c, adapt.da.eps, tau,
                             max_steps, theta, lp, grad)
        )
        # trajectory-length SGA (warmup only)
        cs_new = chees_update(chees, cs, theta, theta_p, v_p, alpha, tau)
        cs = jax.tree_util.tree_map(
            lambda a, b: jnp.where(is_adapt, a, b), cs_new, cs
        )
        # step size + mass matrix (cross-chain, Stan windows)
        adapt_new = adapt_step_batch(cfg, adapt, theta_n, grad_n, alpha, f)
        metric_new = metric_c
        if cfg.uses_mm:
            renewed = metric_c.renew(adapt_new.mm.m_inv)
            metric_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(is_adapt, a, b), renewed, metric_c
            )
        stats = dict(stats)
        stats["is_adapt"] = jnp.broadcast_to(is_adapt, alpha.shape)
        stats["nom_step_size"] = stats["step_size"]
        return (theta_n, lp_n, grad_n, metric_new, adapt_new, cs, k), (
            theta_n, stats
        )

    return step


def make_chees_draw_step(target, max_steps: int):
    """Draws-only ChEES scan step: transition only, adaptation frozen OUT
    of the program (not just `where`-gated).

    The full step computes the trajectory-length SGA, the Welford push, and
    dual averaging every iteration and discards them via `where` when
    is_adapt=False — at the ChEES-optimal τ ≈ 1 (2-4 leapfrogs/transition)
    that dead adaptation work is a large fraction of the draw-phase wall.
    This step runs the transition alone. Bit-identical draws to the full
    step with is_adapt=False: both consume the PRNG key with one
    `jax.random.split` and run the same `chees_transition`
    (tests/test_chees.py pins the equality).

    carry = (theta, lp, grad, metric, eps, t_mean, key); xs = u (jitter).
    """

    def step(carry, u):
        theta, lp, grad, metric_c, eps, t_mean, k = carry
        k, k_tr = jax.random.split(k)
        (theta_n, lp_n, grad_n), _, stats = chees_transition(
            k_tr, target, metric_c, eps, u * t_mean, max_steps,
            theta, lp, grad)
        stats = dict(stats)
        stats["is_adapt"] = jnp.zeros_like(stats["acceptance_rate"],
                                           dtype=bool)
        stats["nom_step_size"] = stats["step_size"]
        return (theta_n, lp_n, grad_n, metric_c, eps, t_mean, k), (
            theta_n, stats
        )

    return step


def sample_chees(
    key,
    target: LogDensityTarget,
    init_theta,
    n_samples: int,
    n_adapts: int,
    metric: Optional[Metric] = None,
    init_eps=None,
    init_t: float = 1.0,
    chees: CheesConfig = CheesConfig(),
    da: DualAveragingConfig = DualAveragingConfig(delta=0.651),
    mm_kind: str = "welford_var",
    max_steps: int = 1024,
    drop_warmup: bool = False,
    t_schedule=None,
) -> SampleResult:
    """ChEES-HMC over a chain batch (many chains strongly recommended —
    the criterion centers on cross-chain means).

    Returns a SampleResult; `final_state` here is the (theta, lp, grad,
    AdaptState, CheesState, key) tuple of the scan carry. The adapted mean
    trajectory length is in `result.stats["trajectory_length"]` (post-warmup
    rows hold the finalized T·u_m values).

    `t_schedule` ((n_samples,) multipliers, or the string "sweep" for
    `chees_tau_sweep`'s long→converged warmup schedule) scales τ per
    iteration during WARMUP only — a multiscale-geometry exploration aid.
    On draw iterations the multiplier is forced to 1 regardless of the
    schedule's tail, so post-warmup trajectory lengths always follow the
    finalized adapted T.

    Hard-geometry guidance (funnels and similar): pair ChEES with
    `da=DualAveragingConfig(delta=0.95)` and a large `init_t` exactly as the
    NUTS funnel config does (VALIDATION.md config 3) — at the default
    δ=0.651 the adapted step size is too coarse for the neck and the v
    marginal biases high (measured; gated by tests/test_chees.py). Where a
    non-centered reparameterisation exists (e.g. models.neal_funnel_nc) it
    remains the strictly better fix for ANY fixed-step sampler.
    """
    import dataclasses as _dc

    theta = jnp.asarray(init_theta)
    if theta.ndim == 1:
        raise ValueError("ChEES needs a chain batch: init_theta (C, D)")
    if chees.avg_start is None:
        # tail-average the finalize T over the second half of warmup (the
        # whole-history average lags the SGA when T0 is off; PERF.md)
        chees = _dc.replace(chees, avg_start=n_adapts // 2)
    n_chains, dim = theta.shape
    dtype = theta.dtype

    if metric is None:
        metric = make_metric("diagonal", dim, dtype=dtype)
    cfg = AdaptorConfig(kind="stan", mm_kind=mm_kind, da=da)

    key, k_eps = jax.random.split(key)
    if init_eps is None:
        h = Hamiltonian(metric=metric, target=target)
        eps0 = find_good_stepsize(k_eps, h, theta[0])
    else:
        eps0 = jnp.asarray(init_eps, dtype)

    lp, grad = _batched_lp_grad(target, theta)
    lp = jnp.where(jnp.isfinite(lp), lp, -jnp.inf)
    adapt = AdaptState.init(cfg, dim, eps0, dtype)
    cheesst = CheesState.init(init_t, dtype)
    flags = adapt_flags(cfg, n_adapts, n_samples)
    u_all = jnp.asarray(halton_sequence(n_samples), dtype)

    step = make_chees_step(target, cfg, chees, max_steps)

    carry0 = (theta, lp, grad, metric, adapt, cheesst, key)
    if t_schedule is not None:
        if isinstance(t_schedule, str):
            if t_schedule != "sweep":
                raise ValueError(f"unknown t_schedule {t_schedule!r}")
            t_schedule = chees_tau_sweep(n_samples, n_adapts)
        sched = jnp.asarray(t_schedule, dtype)
        if sched.shape != (n_samples,):
            raise ValueError("t_schedule must have one multiplier per "
                             "iteration")
        xs = (flags, u_all, sched)
    else:
        xs = (flags, u_all)
    carry, (thetas, stats) = jax.lax.scan(step, carry0, xs)

    warmup_stats = None
    if drop_warmup and n_adapts > 0:
        warmup_stats = {k: v[:n_adapts] for k, v in stats.items()}
        thetas = thetas[n_adapts:]
        stats = {k: v[n_adapts:] for k, v in stats.items()}
    return SampleResult(
        thetas=thetas, stats=stats, warmup_stats=warmup_stats,
        final_state=carry, target=target,
    )
