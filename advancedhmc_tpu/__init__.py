"""advancedhmc_tpu — a TPU-native HMC/NUTS inference engine.

Brand-new JAX/XLA/pjit/Pallas framework with the capability surface of
TuringLang/AdvancedHMC.jl (reference mounted read-only at /root/reference;
structural analysis in SURVEY.md). Every algorithm is the composition of five
orthogonal choices — metric × kinetic × integrator × (trajectory sampler ×
termination criterion) × adaptor — expressed as pytree state + pure function
kernels instead of Julia type dispatch.
"""

from .target import LogDensityTarget, as_target, target_from_pytree
from .metrics import (
    DenseEuclideanMetric,
    DiagEuclideanMetric,
    RankUpdateEuclideanMetric,
    UnitEuclideanMetric,
    make_metric,
)
from .kinetic import GaussianKinetic, RelativisticKinetic
from .hamiltonian import (
    FullMomentumRefreshment,
    Hamiltonian,
    PartialMomentumRefreshment,
    PhasePoint,
)
from .integrators import (
    ComposedLeapfrog,
    JitteredLeapfrog,
    Leapfrog,
    SolverIntegrator,
    TemperedLeapfrog,
    leapfrog_step,
    leapfrog_steps,
    leapfrog_trajectory,
)
from .termination import (
    ClassicNoUTurn,
    ENDPOINT,
    FixedIntegrationTime,
    FixedNSteps,
    GeneralisedNoUTurn,
    MULTINOMIAL,
    SLICE,
    StrictGeneralisedNoUTurn,
)
from .trajectory import HMCKernel, Trajectory, transition_static
from .nuts import nuts_transition
from .stepsize_search import find_good_stepsize
from .adaptation import (
    AdaptState,
    AdaptorConfig,
    DualAveragingConfig,
    stan_schedule,
)
from .sampler import (HMCState, SampleResult, SampleSpec, fanout_warmup_state,
                      init_state, sample, sample_step)
from .aot import aot_program, aot_signature
from .chees import chees_tau_sweep, sample_chees
from .constructors import HMC, HMCDA, NUTS, SamplerConfig, make_integrator
from .diagnostics import (ebfmi, effective_sample_size, ess_bulk,
                          ess_tail, rhat, split_rhat, summarize)

__version__ = "0.1.0"

__all__ = [
    "LogDensityTarget", "as_target", "target_from_pytree",
    "UnitEuclideanMetric", "DiagEuclideanMetric", "DenseEuclideanMetric",
    "RankUpdateEuclideanMetric", "make_metric",
    "GaussianKinetic", "RelativisticKinetic",
    "Hamiltonian", "PhasePoint",
    "FullMomentumRefreshment", "PartialMomentumRefreshment",
    "Leapfrog", "JitteredLeapfrog", "TemperedLeapfrog", "ComposedLeapfrog",
    "SolverIntegrator",
    "leapfrog_step", "leapfrog_steps", "leapfrog_trajectory",
    "FixedNSteps", "FixedIntegrationTime",
    "ClassicNoUTurn", "GeneralisedNoUTurn", "StrictGeneralisedNoUTurn",
    "ENDPOINT", "MULTINOMIAL", "SLICE",
    "Trajectory", "HMCKernel", "transition_static", "nuts_transition",
    "find_good_stepsize",
    "AdaptorConfig", "AdaptState", "DualAveragingConfig", "stan_schedule",
    "HMCState", "SampleSpec", "SampleResult", "init_state", "sample",
    "sample_step", "fanout_warmup_state", "sample_chees", "chees_tau_sweep",
    "NUTS", "HMC", "HMCDA", "SamplerConfig", "make_integrator",
    "ebfmi", "effective_sample_size", "ess_bulk", "ess_tail", "rhat",
    "split_rhat", "summarize",
    "aot_program", "aot_signature",
]
