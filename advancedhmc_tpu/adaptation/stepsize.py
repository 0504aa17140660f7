"""Nesterov dual-averaging step-size adaptation.

Mirrors /root/reference/src/adaptation/stepsize.jl with Stan-equivalent
defaults γ=0.05, t₀=10, κ=0.75 (stepsize.jl:168-172). State is a pure pytree
threaded through `lax.scan`; the update is branch-free so it vmaps across
chains (per-chain ϵ, the reference's vector-ϵ mode) or runs once on a
cross-chain mean α.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class DualAveragingConfig:
    """Hyperparameters (ref stepsize.jl:111-121,168-172)."""

    delta: float = 0.8
    gamma: float = 0.05
    t0: float = 10.0
    kappa: float = 0.75


class DualAveragingState(struct.PyTreeNode):
    """State {m, ϵ, μ, x̄, H̄} (ref stepsize.jl:13-36)."""

    m: jnp.ndarray        # iteration counter
    eps: jnp.ndarray      # current step size
    mu: jnp.ndarray       # log(10·ϵ0) shrinkage target
    x_bar: jnp.ndarray    # running average of log ϵ
    h_bar: jnp.ndarray    # running average statistic

    @classmethod
    def init(cls, eps):
        eps = jnp.asarray(eps)
        return cls(
            m=jnp.zeros_like(eps, dtype=jnp.int32),
            eps=eps,
            mu=jnp.log(10.0 * eps),
            x_bar=jnp.zeros_like(eps),
            h_bar=jnp.zeros_like(eps),
        )

    def reset(self):
        """reset! recomputes μ from the *current* ϵ (ref stepsize.jl:38-52)."""
        return DualAveragingState.init(self.eps)

    def finalize(self):
        """ϵ ← exp(x̄) (ref stepsize.jl:54-62)."""
        return self.replace(eps=jnp.exp(self.x_bar))


class FixedStepSize(struct.PyTreeNode):
    """Step-size "adaptor" that never changes ϵ (ref stepsize.jl:77-84).

    In the functional design a fixed step size is normally expressed as
    `AdaptorConfig(kind="none")` + `init_eps`; this state exists for users
    composing adaptors manually (same role as the reference's struct — its
    update verbs are all identities).
    """

    eps: jnp.ndarray

    @classmethod
    def init(cls, eps):
        return cls(eps=jnp.asarray(eps))

    def update(self, alpha):
        return self

    def reset(self):
        return self

    def finalize(self):
        return self


class ManualSSAdaptor:
    """Manually-driven step size (ref stepsize.jl:64-95, `MSSState`).

    The reference mutates `state.ϵ` between transitions; the functional
    analog is a host-side holder whose `set` records a new ϵ and whose
    `state` materialises a `FixedStepSize` pytree. For a running sampler
    use `HMCState.with_step_size(eps)` — the direct equivalent of writing
    `mssa.state.ϵ` mid-run.
    """

    def __init__(self, eps):
        self.eps = jnp.asarray(eps)

    def set(self, eps):
        self.eps = jnp.asarray(eps)

    @property
    def state(self):
        return FixedStepSize.init(self.eps)


def da_update(cfg: DualAveragingConfig, st: DualAveragingState, alpha):
    """One dual-averaging step (ref stepsize.jl:178-210).

    `alpha` is the per-transition acceptance statistic (scalar, or matching
    the state's shape in per-chain mode). Non-finite ϵ reverts the update.
    """
    dtype = st.eps.dtype
    m = st.m + 1
    mf = m.astype(dtype)
    eta_h = 1.0 / (mf + cfg.t0)
    h_bar = (1.0 - eta_h) * st.h_bar + eta_h * (
        cfg.delta - jnp.minimum(jnp.asarray(1.0, dtype), alpha)
    )
    x = st.mu - h_bar * jnp.sqrt(mf) / cfg.gamma
    eta_x = mf ** (-cfg.kappa)
    x_bar = (1.0 - eta_x) * st.x_bar + eta_x * x
    eps = jnp.exp(x)

    ok = jnp.isfinite(eps)
    new = DualAveragingState(
        m=jnp.where(ok, m, st.m),  # non-finite ϵ reverts the whole state (ref :199-203)
        eps=jnp.where(ok, eps, st.eps),
        mu=st.mu,
        x_bar=jnp.where(ok, x_bar, st.x_bar),
        h_bar=jnp.where(ok, h_bar, st.h_bar),
    )
    return new
