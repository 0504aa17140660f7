"""Compile-lattice quality gate: AOT-lower (`jax.jit(...).lower()` — trace
only, no execution) the config cross-product and assert clean tracing, plus
a no-Python-recompile guarantee on structurally-equal spec reuse.

This is the native analogue of the reference's whole-package static-quality
run (Aqua + JET over every method signature,
/root/reference/test/quality.jl:7-12): instead of type-stability analysis,
the gate proves every metric × integrator × criterion × sampler × adaptor ×
chain-mode combination traces and lowers without error — the failure mode
XLA-land actually has (shape/dtype/tracer leaks at trace time).

Budget note: a single sample_step lowering costs ~0.5 s on CPU, so the
FULL ~2000-combo product does not fit the <2 min budget. The lattice is
tiered instead, with every PAIR of axes covered by a full sub-product over
the axes that actually interact in code:
  tier 1: metric × (criterion, sampler) × chain-mode  (full product, the
          trajectory machinery is where metric state threads through)
  tier 2: integrator × adaptor-kind                    (full product)
  tier 3: mm_kind edge combos (nutpie, cov/dense, unit-mm) × chain-mode
"""

import itertools

import pytest

import jax
import jax.numpy as jnp

from advancedhmc_tpu import (
    AdaptorConfig,
    ClassicNoUTurn,
    ComposedLeapfrog,
    FixedIntegrationTime,
    FixedNSteps,
    GeneralisedNoUTurn,
    HMCKernel,
    JitteredLeapfrog,
    Leapfrog,
    SolverIntegrator,
    StrictGeneralisedNoUTurn,
    TemperedLeapfrog,
    Trajectory,
    init_state,
    make_metric,
)
from advancedhmc_tpu.adaptation import adapt_flags
from advancedhmc_tpu.models import std_gaussian
from advancedhmc_tpu.sampler import SampleSpec, sample_step

D, C = 3, 2
TARGET = std_gaussian(D)

_CRITERIA = {
    "fixed_n": lambda: FixedNSteps(4),
    "fixed_t": lambda: FixedIntegrationTime(0.8),
    "classic": lambda: ClassicNoUTurn(max_depth=3),
    "generalised": lambda: GeneralisedNoUTurn(max_depth=3),
    "strict": lambda: StrictGeneralisedNoUTurn(max_depth=3),
}
_STATIC = ("fixed_n", "fixed_t")
# valid (criterion, sampler) pairs: endpoint needs a static criterion,
# slice needs a dynamic one (termination.py:82-92)
_TRAJ_COMBOS = [
    (c, s)
    for c in _CRITERIA
    for s in (("endpoint", "multinomial") if c in _STATIC
              else ("slice", "multinomial"))
]

_EPS = 0.3


def _ruth3(q, p, eps, grad_fn, velocity_fn):
    # third-order Ruth composition (asymmetric; used as an opaque stepper)
    cs = (1.0, -2.0 / 3.0, 2.0 / 3.0)
    ds = (-1.0 / 24.0, 3.0 / 4.0, 7.0 / 24.0)
    for ci, di in zip(cs, ds):
        p = p + di * eps * grad_fn(q)
        q = q + ci * eps * velocity_fn(p)
    return q, p


_INTEGRATORS = {
    "leapfrog": lambda: Leapfrog(step_size=jnp.asarray(_EPS)),
    "jittered": lambda: JitteredLeapfrog.create(jnp.asarray(_EPS), 0.1),
    "tempered": lambda: TemperedLeapfrog(step_size=jnp.asarray(_EPS),
                                         alpha=1.05),
    "yoshida4": lambda: ComposedLeapfrog.yoshida4(jnp.asarray(_EPS)),
    "solver": lambda: SolverIntegrator(step_size=jnp.asarray(_EPS),
                                       stepper=_ruth3),
}

_ADAPTORS = {
    "none": AdaptorConfig(kind="none"),
    "stepsize": AdaptorConfig(kind="stepsize"),
    "massmatrix": AdaptorConfig(kind="massmatrix"),
    "naive": AdaptorConfig(kind="naive"),
    "stan": AdaptorConfig(kind="stan"),
}

# mm estimator matched to the metric's renew() input shape
_MM_FOR_METRIC = {
    "unit": "welford_var",
    "diagonal": "welford_var",
    "dense": "welford_cov",
    "rank_update": "lowrank",
}


def _lower_combo(metric_kind, integrator, criterion_key, sampler,
                 adaptor, cross_chain):
    crit = _CRITERIA[criterion_key]()
    kernel = HMCKernel(Trajectory(integrator, crit, sampler))
    spec = SampleSpec(target=TARGET, kernel=kernel, adaptor=adaptor,
                      cross_chain=cross_chain)
    metric = make_metric(metric_kind, D, dtype=jnp.float64)
    state = init_state(jax.random.PRNGKey(0), spec, metric,
                       jnp.zeros((C, D), jnp.float64), init_eps=_EPS)
    flags = jax.tree_util.tree_map(
        lambda a: a[0], adapt_flags(spec.adaptor, 10, 20)
    )
    # .lower() = trace + StableHLO lowering, no backend compile — the gate
    # is about clean tracing across the lattice, and stays CPU-cheap
    jax.jit(sample_step, static_argnums=0).lower(spec, state, flags)


@pytest.mark.parametrize("metric_kind", ["unit", "diagonal", "dense",
                                         "rank_update"])
@pytest.mark.parametrize("traj", _TRAJ_COMBOS,
                         ids=[f"{c}-{s}" for c, s in _TRAJ_COMBOS])
@pytest.mark.parametrize("cross_chain", [False, True],
                         ids=["perchain", "crosschain"])
def test_lattice_metric_trajectory(metric_kind, traj, cross_chain):
    criterion_key, sampler = traj
    adaptor = AdaptorConfig(kind="stan", mm_kind=_MM_FOR_METRIC[metric_kind])
    _lower_combo(metric_kind, _INTEGRATORS["leapfrog"](), criterion_key,
                 sampler, adaptor, cross_chain)


@pytest.mark.parametrize("integ_key", list(_INTEGRATORS))
@pytest.mark.parametrize("adaptor_key", list(_ADAPTORS))
def test_lattice_integrator_adaptor(integ_key, adaptor_key):
    _lower_combo("diagonal", _INTEGRATORS[integ_key](), "generalised",
                 "multinomial", _ADAPTORS[adaptor_key], False)


@pytest.mark.parametrize("combo", [
    ("diagonal", "nutpie", False),
    ("diagonal", "nutpie", True),
    ("dense", "welford_cov", True),
    ("unit", "unit", False),
    ("rank_update", "lowrank", True),
], ids=lambda c: f"{c[0]}-{c[1]}-{'cc' if c[2] else 'pc'}")
def test_lattice_mm_edges(combo):
    metric_kind, mm_kind, cross_chain = combo
    adaptor = AdaptorConfig(kind="stan", mm_kind=mm_kind)
    _lower_combo(metric_kind, _INTEGRATORS["leapfrog"](), "generalised",
                 "multinomial", adaptor, cross_chain)


def test_no_recompile_on_structurally_equal_spec():
    """Two fresh-but-structurally-equal SampleSpec objects share ONE
    jit-cache entry (the `_fingerprint` hash/eq path, sampler.py:145-156) —
    spec reuse across user calls must never retrigger tracing."""
    def build_spec():
        kernel = HMCKernel(Trajectory(
            Leapfrog(step_size=jnp.asarray(_EPS)),
            GeneralisedNoUTurn(max_depth=3), "multinomial",
        ))
        return SampleSpec(target=TARGET, kernel=kernel,
                          adaptor=AdaptorConfig(kind="stan"))

    spec_a, spec_b = build_spec(), build_spec()
    assert spec_a is not spec_b and spec_a == spec_b
    assert hash(spec_a) == hash(spec_b)

    metric = make_metric("diagonal", D, dtype=jnp.float64)
    state = init_state(jax.random.PRNGKey(0), spec_a, metric,
                       jnp.zeros((C, D), jnp.float64), init_eps=_EPS)
    flags = jax.tree_util.tree_map(
        lambda a: a[0], adapt_flags(spec_a.adaptor, 10, 20)
    )
    step = jax.jit(sample_step, static_argnums=0)
    s1, _ = step(spec_a, state, flags)
    jax.block_until_ready(s1.z.theta)
    n_after_first = step._cache_size()
    s2, _ = step(spec_b, state, flags)
    jax.block_until_ready(s2.z.theta)
    assert step._cache_size() == n_after_first, (
        "structurally equal spec retriggered compilation"
    )
