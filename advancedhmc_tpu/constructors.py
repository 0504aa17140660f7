"""Convenience sampler constructors (ecosystem API layer).

Mirrors /root/reference/src/constructors.jl and the factory logic of
/root/reference/src/abstractmcmc.jl:296-431:

* `NUTS(δ)` → multinomial sampling + generalised no-U-turn + Stan windowed
  adaptation (abstractmcmc.jl:395-397,415-419);
* `HMC(ϵ, L)` → endpoint sampling + fixed steps + no adaptation
  (abstractmcmc.jl:403-405,421-423);
* `HMCDA(δ, λ)` → endpoint sampling + fixed integration time + dual-averaging
  step-size adaptation (abstractmcmc.jl:399-401,425-427).

Each returns a `SamplerConfig` facade whose `.sample(...)` drives the scan
loop in `sampler.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

from .adaptation import (
    AdaptorConfig,
    DualAveragingConfig,
    MM_NUTPIE,
    MM_UNIT,
    MM_WELFORD_COV,
    MM_WELFORD_VAR,
    NONE,
    STAN,
    STEPSIZE,
)
from .hamiltonian import FullMomentumRefreshment
from .integrators import (
    ComposedLeapfrog,
    JitteredLeapfrog,
    Leapfrog,
    TemperedLeapfrog,
)
from .metrics import make_metric
from .sampler import SampleResult, sample
from .target import LogDensityTarget, as_target
from .termination import (
    ENDPOINT,
    MULTINOMIAL,
    FixedIntegrationTime,
    FixedNSteps,
    GeneralisedNoUTurn,
)
from .trajectory import HMCKernel, Trajectory


def make_integrator(kind: str, eps=0.1, jitter_frac=0.1, temper_alpha=1.05,
                    stepper=None):
    """:leapfrog/:jitteredleapfrog/:temperedleapfrog resolution
    (ref abstractmcmc.jl:356-370), plus the higher-order symplectic
    composition (:yoshida4) — the pluggable-solver capability of the
    reference's OrdinaryDiffEqSymplecticRK extension
    (/root/reference/ext/AdvancedHMCOrdinaryDiffEqSymplecticRKExt.jl:6-47)."""
    eps = jnp.asarray(eps)
    if kind in ("leapfrog",):
        return Leapfrog(step_size=eps)
    if kind in ("jitteredleapfrog", "jittered"):
        return JitteredLeapfrog.create(eps, jitter_frac)
    if kind in ("temperedleapfrog", "tempered"):
        return TemperedLeapfrog(step_size=eps, alpha=temper_alpha)
    if kind in ("yoshida4", "composed"):
        return ComposedLeapfrog.yoshida4(eps)
    if kind in ("solver", "external"):
        # third-party symplectic stepper plug-in (≅ the OrdinaryDiffEq
        # extension's solver delegation); see SolverIntegrator's contract
        if stepper is None:
            raise ValueError("kind='solver' requires stepper=...")
        from .integrators import SolverIntegrator

        return SolverIntegrator(step_size=eps, stepper=stepper)
    raise ValueError(f"unknown integrator kind {kind!r}")


_MM_FOR_METRIC = {
    "unit": MM_UNIT,
    "diag": MM_WELFORD_VAR,
    "diagonal": MM_WELFORD_VAR,
    "dense": MM_WELFORD_COV,
    # the RankUpdate metric exists to CARRY a low-rank factorisation — pair
    # it with the rank-preserving estimator (r4); init_state auto-sizes the
    # metric's rank slots to the adaptor's mm_rank
    "rank_update": "lowrank",
    "rankupdate": "lowrank",
    "nutpie": MM_NUTPIE,
}


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """A (kernel, metric kind, adaptor) bundle ≅ `HMCSampler`
    (ref constructors.jl:54-64)."""

    kernel: HMCKernel
    metric_kind: str
    adaptor: AdaptorConfig

    def sample(
        self,
        key,
        target,
        init_theta,
        n_samples: int,
        n_adapts: Optional[int] = None,
        dim: Optional[int] = None,
        metric=None,
        init_eps=None,
        n_chains: Optional[int] = None,
        cross_chain: bool = False,
        drop_warmup: bool = False,
        dtype=jnp.float32,
        **kwargs,
    ) -> SampleResult:
        target = as_target(target, dim=dim)
        if metric is None:
            metric = make_metric(self.metric_kind, target.dim, dtype=dtype)
        return sample(
            key,
            target,
            self.kernel,
            metric,
            init_theta,
            n_samples,
            n_adapts=n_adapts,
            adaptor=self.adaptor,
            init_eps=init_eps,
            n_chains=n_chains,
            cross_chain=cross_chain,
            drop_warmup=drop_warmup,
            **kwargs,
        )


def NUTS(
    delta: float = 0.8,
    max_depth: int = 10,
    delta_max: float = 1000.0,
    integrator: str = "leapfrog",
    metric: str = "diagonal",
    ts_kind: str = MULTINOMIAL,
    criterion=None,
    init_eps: float = 0.1,
) -> SamplerConfig:
    """NUTS(δ) (ref constructors.jl:78-97)."""
    if criterion is None:
        criterion = GeneralisedNoUTurn(max_depth=max_depth, delta_max=delta_max)
    integ = make_integrator(integrator, init_eps)
    traj = Trajectory(integrator=integ, criterion=criterion, ts_kind=ts_kind)
    kernel = HMCKernel(trajectory=traj, refreshment=FullMomentumRefreshment())
    adaptor = AdaptorConfig(
        kind=STAN,
        mm_kind=_MM_FOR_METRIC.get(metric, MM_WELFORD_VAR),
        da=DualAveragingConfig(delta=delta),
    )
    return SamplerConfig(kernel=kernel, metric_kind=metric, adaptor=adaptor)


def HMC(
    eps: float = 0.1,
    n_leapfrog: int = 10,
    integrator: str = "leapfrog",
    metric: str = "diagonal",
    ts_kind: str = ENDPOINT,
) -> SamplerConfig:
    """HMC(ϵ, L) (ref constructors.jl:111-126): static trajectory, no adaptation."""
    integ = make_integrator(integrator, eps)
    traj = Trajectory(
        integrator=integ, criterion=FixedNSteps(n_leapfrog), ts_kind=ts_kind
    )
    kernel = HMCKernel(trajectory=traj, refreshment=FullMomentumRefreshment())
    return SamplerConfig(
        kernel=kernel, metric_kind=metric, adaptor=AdaptorConfig(kind=NONE)
    )


def HMCDA(
    delta: float = 0.8,
    lam: float = 1.0,
    integrator: str = "leapfrog",
    metric: str = "diagonal",
    max_steps: int = 1024,
    init_eps: float = 0.1,
) -> SamplerConfig:
    """HMCDA(δ, λ) (ref constructors.jl:148-165)."""
    integ = make_integrator(integrator, init_eps)
    traj = Trajectory(
        integrator=integ,
        criterion=FixedIntegrationTime(lam=lam, max_steps=max_steps),
        ts_kind=ENDPOINT,
    )
    kernel = HMCKernel(trajectory=traj, refreshment=FullMomentumRefreshment())
    adaptor = AdaptorConfig(kind=STEPSIZE, da=DualAveragingConfig(delta=delta))
    return SamplerConfig(kernel=kernel, metric_kind=metric, adaptor=adaptor)
