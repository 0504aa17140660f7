"""Adaptation layer (step size + mass matrix + composition schedules).

TPU-native analogue of the reference's AdvancedHMC.Adaptation submodule
(/root/reference/src/adaptation/): all adaptor state is immutable pytrees
threaded through `lax.scan`.
"""

from .stepsize import (
    DualAveragingConfig,
    DualAveragingState,
    FixedStepSize,
    ManualSSAdaptor,
    da_update,
)
from .massmatrix import (
    LowRankCovState,
    NaiveCov,
    NaiveVar,
    NutpieVarState,
    UnitMassMatrixState,
    WelfordCovState,
    WelfordVarState,
)
from .chees import CheesConfig, CheesState, chees_update, halton_sequence
from .stan import (
    MM_LOWRANK,
    MM_NUTPIE,
    MM_UNIT,
    MM_WELFORD_COV,
    MM_WELFORD_VAR,
    NAIVE,
    NONE,
    MASSMATRIX,
    STAN,
    STEPSIZE,
    AdaptState,
    AdaptorConfig,
    adapt_flags,
    transient_depth_caps,
    adapt_step,
    adapt_step_batch,
    stan_schedule,
)

__all__ = [
    "CheesConfig",
    "CheesState",
    "chees_update",
    "halton_sequence",
    "DualAveragingConfig",
    "DualAveragingState",
    "FixedStepSize",
    "ManualSSAdaptor",
    "da_update",
    "NaiveCov",
    "NaiveVar",
    "LowRankCovState",
    "NutpieVarState",
    "UnitMassMatrixState",
    "WelfordCovState",
    "WelfordVarState",
    "AdaptState",
    "AdaptorConfig",
    "adapt_flags",
    "transient_depth_caps",
    "adapt_step",
    "adapt_step_batch",
    "stan_schedule",
    "MM_LOWRANK",
    "MM_NUTPIE",
    "MM_UNIT",
    "MM_WELFORD_COV",
    "MM_WELFORD_VAR",
    "NAIVE",
    "NONE",
    "MASSMATRIX",
    "STAN",
    "STEPSIZE",
]
