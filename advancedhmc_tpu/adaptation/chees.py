"""ChEES: gradient-based trajectory-length adaptation (Hoffman, Radul &
Sountsov, AISTATS 2021).

A warmup-quality capability beyond the reference (whose only trajectory-length
"adaptation" is the static HMCDA λ, /root/reference/src/constructors.jl:148-165):
the mean trajectory length T of jittered fixed-length HMC is adapted by
stochastic gradient ascent on the Change-in-Estimator-of-Expected-Squared
jump distance criterion

    ChEES(T) = ¼ E[ (‖θ′ − μ′‖² − ‖θ − μ‖²)² ]

whose per-chain pathwise gradient w.r.t. the trajectory time τ is

    d/dτ  =  (‖θ′ − μ′‖² − ‖θ − μ‖²) · (θ′ − μ′)ᵀ v′        (v′ = M⁻¹r′)

aggregated across chains with acceptance-probability weights — an
intrinsically *cross-chain* scheme (the centering means μ, μ′ are chain-batch
means), which is exactly the many-chain regime this engine targets: under a
sharded chain axis the means/reductions lower to psums over ICI.

Trajectory times are jittered with a quasi-random Halton sequence,
τ_m = u_m · T (shared across chains at iteration m, so the leapfrog
while-loop has a uniform, device-wide trip count). log T follows Adam.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp
from flax import struct


def halton_sequence(n: int, base: int = 2) -> np.ndarray:
    """First n points of the van-der-Corput/Halton sequence in (0, 1).

    Quasi-random jitter (low discrepancy) covers trajectory-length space
    more evenly than iid uniforms — the ChEES paper's choice.
    """
    out = np.zeros(n)
    for i in range(n):
        f, r, idx = 1.0, 0.0, i + 1
        while idx > 0:
            f /= base
            r += f * (idx % base)
            idx //= base
        out[i] = r
    return out


@dataclasses.dataclass(frozen=True)
class CheesConfig:
    """Adam-on-log-T hyperparameters (defaults per the TFP implementation)."""

    learning_rate: float = 0.025
    beta1: float = 0.9
    beta2: float = 0.999
    adam_eps: float = 1e-8
    max_trajectory_length: float = 100.0
    min_trajectory_length: float = 1e-3
    # Polyak tail-averaging: fold iterates into the finalize average only
    # AFTER this many SGA steps. A whole-history average (avg_start=0) lags
    # the descent when T0 is far from the optimum — measured on TPU: the
    # T0=2 run finalizes τ=1.27 while the converged SGA sits near 1.3, and
    # T0=1 finalizes 0.97 (PERF.md "ChEES"). `sample_chees` defaults this
    # to n_adapts//2 via avg_start=None ("auto").
    avg_start: Optional[int] = None


class CheesState(struct.PyTreeNode):
    """Running trajectory-length adaptation state."""

    log_t: jnp.ndarray      # log mean trajectory length T
    log_t_avg: jnp.ndarray  # iterate average (used after finalize)
    m: jnp.ndarray          # Adam first moment
    v: jnp.ndarray          # Adam second moment
    count: jnp.ndarray      # Adam step counter

    @classmethod
    def init(cls, t0, dtype=jnp.float32):
        z = jnp.zeros((), dtype)
        return cls(
            log_t=jnp.log(jnp.asarray(t0, dtype)),
            log_t_avg=jnp.log(jnp.asarray(t0, dtype)),
            m=z,
            v=z,
            count=jnp.zeros((), jnp.int32),
        )

    @property
    def trajectory_length(self):
        return jnp.exp(self.log_t)

    def finalize(self):
        """Freeze T at the iterate average (reduces SGA noise, as the paper's
        final-T choice)."""
        return self.replace(log_t=self.log_t_avg)


def chees_update(
    cfg: CheesConfig,
    st: CheesState,
    theta_prev,    # (C, D) current positions
    theta_prop,    # (C, D) PROPOSED end states (even if rejected)
    v_prop,        # (C, D) end-state velocities M⁻¹r′
    alpha,         # (C,)  per-chain acceptance probabilities
    tau,           # ()    this iteration's trajectory time u·T
) -> CheesState:
    """One stochastic-gradient-ascent step on log T."""
    dtype = st.log_t.dtype
    mu_prev = jnp.mean(theta_prev, axis=0)
    mu_prop = jnp.mean(theta_prop, axis=0)
    c_prev = theta_prev - mu_prev
    c_prop = theta_prop - mu_prop
    dsq = jnp.sum(jnp.square(c_prop), -1) - jnp.sum(jnp.square(c_prev), -1)
    per_chain = dsq * jnp.sum(c_prop * v_prop, -1)          # d ChEES/dτ ∝
    w = jnp.clip(alpha, 0.0, 1.0)
    w = jnp.where(jnp.isfinite(per_chain), w, 0.0)
    per_chain = jnp.where(jnp.isfinite(per_chain), per_chain, 0.0)
    grad_tau = jnp.sum(w * per_chain) / jnp.maximum(jnp.sum(w), 1e-6)
    # τ = u·exp(log T) ⇒ dτ/dlogT = τ ; normalise by the criterion scale so
    # the Adam step size is unit-free (TFP normalises similarly).
    grad = grad_tau * tau
    grad = grad / (jnp.sqrt(jnp.mean(jnp.square(dsq))) + 1e-6)

    count = st.count + 1
    cf = count.astype(dtype)
    m = cfg.beta1 * st.m + (1.0 - cfg.beta1) * grad
    v = cfg.beta2 * st.v + (1.0 - cfg.beta2) * jnp.square(grad)
    m_hat = m / (1.0 - cfg.beta1 ** cf)
    v_hat = v / (1.0 - cfg.beta2 ** cf)
    log_t = st.log_t + cfg.learning_rate * m_hat / (
        jnp.sqrt(v_hat) + cfg.adam_eps
    )
    log_t = jnp.clip(
        log_t,
        jnp.log(cfg.min_trajectory_length),
        jnp.log(cfg.max_trajectory_length),
    )
    # harmonic iterate average of log T; with tail-averaging (avg_start>0)
    # the average restarts once the SGA has had time to descend, so the
    # finalized T tracks the converged iterate instead of the init
    start = float(cfg.avg_start or 0)
    eta = 1.0 / jnp.maximum(cf - start, 1.0)
    log_t_avg = jnp.where(
        cf <= start, log_t, (1.0 - eta) * st.log_t_avg + eta * log_t
    )
    ok = jnp.isfinite(log_t)
    return CheesState(
        log_t=jnp.where(ok, log_t, st.log_t),
        log_t_avg=jnp.where(ok, log_t_avg, st.log_t_avg),
        m=jnp.where(ok, m, st.m),
        v=jnp.where(ok, v, st.v),
        count=count,
    )
