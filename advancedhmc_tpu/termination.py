"""Termination criteria and trajectory-sampler configuration.

Mirrors the criterion lattice at /root/reference/src/trajectory.jl:62-80 and
:400-452. All criteria are *static* frozen dataclasses — they carry only
hyperparameters, so they act as trace-time configuration for the compiled
kernels (the analogue of Julia type-parameter dispatch on
`Trajectory{TS,I,TC}`, /root/reference/src/trajectory.jl:213-224).
"""

from __future__ import annotations

import dataclasses


class TerminationCriterion:
    pass


class StaticTerminationCriterion(TerminationCriterion):
    pass


class DynamicTerminationCriterion(TerminationCriterion):
    pass


@dataclasses.dataclass(frozen=True)
class FixedNSteps(StaticTerminationCriterion):
    """Static HMC with a fixed number of leapfrog steps
    (ref /root/reference/src/trajectory.jl:62-65)."""

    n_steps: int


@dataclasses.dataclass(frozen=True)
class FixedIntegrationTime(StaticTerminationCriterion):
    """Fixed total integration time λ: L = max(1, floor(λ/ϵ)) steps
    (ref /root/reference/src/trajectory.jl:77-80,241-243).

    Because ϵ adapts, L is data-dependent; under XLA the trajectory runs as a
    bounded `lax.while_loop` capped at `max_steps`.
    """

    lam: float
    max_steps: int = 1024


@dataclasses.dataclass(frozen=True)
class ClassicNoUTurn(DynamicTerminationCriterion):
    """Position-based U-turn criterion, Eq. (9) of Hoffman & Gelman (2014)
    (ref /root/reference/src/trajectory.jl:414-417,551-557)."""

    max_depth: int = 10
    delta_max: float = 1000.0


@dataclasses.dataclass(frozen=True)
class GeneralisedNoUTurn(DynamicTerminationCriterion):
    """Momentum-sum (ρ) criterion, Betancourt (2017) A.4.2
    (ref /root/reference/src/trajectory.jl:429-432,566-570)."""

    max_depth: int = 10
    delta_max: float = 1000.0


@dataclasses.dataclass(frozen=True)
class StrictGeneralisedNoUTurn(DynamicTerminationCriterion):
    """Generalised criterion plus left/right subtree checks (stan#2800)
    (ref /root/reference/src/trajectory.jl:446-452,579-613)."""

    max_depth: int = 10
    delta_max: float = 1000.0


# Trajectory samplers are identified by static string kind (the analogue of
# the TS type parameter): 'endpoint' (EndPointTS), 'multinomial'
# (MultinomialTS), 'slice' (SliceTS) — /root/reference/src/trajectory.jl:90-136.
ENDPOINT = "endpoint"
MULTINOMIAL = "multinomial"
SLICE = "slice"

_VALID_TS = (ENDPOINT, MULTINOMIAL, SLICE)


def check_ts_kind(ts_kind: str, criterion: TerminationCriterion):
    if ts_kind not in _VALID_TS:
        raise ValueError(f"unknown trajectory sampler kind {ts_kind!r}")
    if isinstance(criterion, StaticTerminationCriterion) and ts_kind == SLICE:
        raise ValueError(
            "slice sampling is only defined for dynamic (NUTS) trajectories"
        )
    if isinstance(criterion, DynamicTerminationCriterion) and ts_kind == ENDPOINT:
        raise ValueError(
            "endpoint sampling is only defined for static trajectories"
        )
