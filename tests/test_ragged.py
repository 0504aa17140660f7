"""Variable-draws-per-chain (ragged) fused collection.

The ragged loop is a pure re-positioning of the rectangular batch-explicit
fused loop's stopping rule: per-chain randomness is keyed by the chain's own
transition counter, so chain c's first counts[c] draws must be BIT-IDENTICAL
to the rectangular run's draws for the same chain/key. The ragged ESS
estimator (per-chain Geyer, summed) is validated against iid ground truth
and against the pooled estimator on rectangular data.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advancedhmc_tpu import (
    AdaptorConfig,
    GeneralisedNoUTurn,
    HMCKernel,
    Leapfrog,
    LogDensityTarget,
    Trajectory,
    init_state,
    make_metric,
)
from advancedhmc_tpu.adaptation import NONE
from advancedhmc_tpu.diagnostics import (
    effective_sample_size,
    effective_sample_size_ragged,
)
from advancedhmc_tpu.experimental import fused_draw_phase_ragged
from advancedhmc_tpu.sampler import SampleSpec, fused_draw_phase

D = 5
TARGET = LogDensityTarget(lambda x: -0.5 * jnp.sum(x**2), D)
NO_ADAPT = AdaptorConfig(kind=NONE)


def _spec(cross_chain=False):
    kernel = HMCKernel(
        Trajectory(Leapfrog(step_size=jnp.asarray(0.25, jnp.float64)),
                   GeneralisedNoUTurn(max_depth=6), "multinomial")
    )
    return SampleSpec(target=TARGET, kernel=kernel, adaptor=NO_ADAPT,
                      cross_chain=cross_chain)


def _init(spec, n_chains=8, seed=0):
    metric = make_metric("diagonal", D, dtype=jnp.float64)
    theta0 = 0.3 * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                     (n_chains, D), jnp.float64)
    return init_state(jax.random.PRNGKey(seed), spec, metric, theta0,
                      init_eps=jnp.asarray(0.25, jnp.float64))


@pytest.mark.parametrize("cross_chain", [False, True])
def test_ragged_prefix_bit_identical_to_rectangular(cross_chain):
    """Chain c's counts[c] ragged draws == the rectangular run's first
    counts[c] draws for the same chain (same keys; only the stopping rule
    differs)."""
    t_min, t_max = 12, 40
    spec = _spec(cross_chain)
    state = _init(spec)
    st_r, ths_r, counts, stats_r = fused_draw_phase_ragged(
        spec, state, t_max, t_min
    )
    # rectangular reference: one fused block of t_max transitions
    st_f, ths_f, stats_f = fused_draw_phase(spec, state, t_max, t_max)
    counts = np.asarray(counts)
    assert (counts >= t_min).all() and (counts <= t_max).all()
    # the slowest chain stops the loop near t_min — not everything maxes out
    assert counts.min() < t_max
    ths_r = np.asarray(ths_r)              # (C, t_max, D)
    ths_f = np.asarray(jnp.swapaxes(ths_f, 0, 1))   # (C, t_max, D)
    for c in range(ths_r.shape[0]):
        np.testing.assert_array_equal(ths_r[c, : counts[c]],
                                      ths_f[c, : counts[c]])
        # rows past the count stay zero-initialised
        assert (ths_r[c, counts[c]:] == 0).all()
        # per-transition stats match on the valid prefix too
        np.testing.assert_array_equal(
            np.asarray(stats_r["n_steps"])[c, : counts[c]],
            np.asarray(jnp.swapaxes(stats_f["n_steps"], 0, 1))[c, : counts[c]],
        )
        assert (np.asarray(stats_r["n_steps"])[c, counts[c]:] == 0).all()
    # resume point = last completed draw
    z_theta = np.asarray(st_r.z.theta)
    for c in range(ths_r.shape[0]):
        np.testing.assert_array_equal(z_theta[c], ths_r[c, counts[c] - 1])
    # iteration advances by the guaranteed common count
    assert int(st_r.iteration) == int(state.iteration) + t_min


def test_ragged_collects_more_than_rectangular():
    """The point of the mode: at the same slowest-chain wall, total draws
    exceed the rectangular C·t_min."""
    t_min, t_max = 16, 48
    spec = _spec(False)
    state = _init(spec, n_chains=16, seed=3)
    _, _, counts, _ = fused_draw_phase_ragged(spec, state, t_max, t_min)
    counts = np.asarray(counts)
    assert counts.sum() > 16 * t_min   # strictly more than rectangular


def test_ragged_moments_count_weighted():
    """Count-weighted pooled moments on a longer ragged run match the
    standard Gaussian."""
    spec = _spec(False)
    state = _init(spec, n_chains=16, seed=7)
    parts, cnts = [], []
    for _ in range(12):
        state, ths, counts, _ = fused_draw_phase_ragged(spec, state, 48, 24)
        parts.append(np.asarray(ths))
        cnts.append(np.asarray(counts))
    mask = np.concatenate(
        [np.arange(p.shape[1])[None, :] < c[:, None]
         for p, c in zip(parts, cnts)], axis=1
    )                                          # (C, 12*48)
    x = np.concatenate(parts, axis=1)          # (C, 12*48, D)
    n = mask.sum()
    mean = (x * mask[..., None]).sum((0, 1)) / n
    var = ((x - mean) ** 2 * mask[..., None]).sum((0, 1)) / n
    assert np.linalg.norm(mean) < 0.5
    np.testing.assert_allclose(var, np.ones(D), atol=0.35)


def test_ragged_ess_iid_ground_truth():
    """On iid draws with random counts, per-chain-sum ESS ≈ total count."""
    key = jax.random.PRNGKey(0)
    C, T, dim = 64, 256, 3
    x = jax.random.normal(key, (C, T, dim), jnp.float64)
    counts = jnp.asarray(
        np.random.default_rng(1).integers(128, T + 1, size=C)
    )
    ess = np.asarray(effective_sample_size_ragged(x, counts))
    total = float(np.asarray(counts).sum())
    np.testing.assert_allclose(ess, total, rtol=0.25)


def test_ragged_ess_rectangular_matches_pooled():
    """On rectangular correlated data, the per-chain-sum estimator agrees
    with the pooled estimator within estimator noise."""
    rng = np.random.default_rng(2)
    C, T, dim = 32, 512, 2
    phi = 0.7
    e = rng.normal(size=(T, C, dim))
    x = np.zeros((T, C, dim))
    for t in range(1, T):
        x[t] = phi * x[t - 1] + e[t]
    pooled = np.asarray(effective_sample_size(jnp.asarray(x)))
    ragged = np.asarray(effective_sample_size_ragged(
        jnp.asarray(np.swapaxes(x, 0, 1)), jnp.full((C,), T)
    ))
    np.testing.assert_allclose(ragged, pooled, rtol=0.25)


def test_ragged_validation_errors():
    spec = _spec(False)
    state = _init(spec)
    with pytest.raises(ValueError):
        fused_draw_phase_ragged(spec, state, 16, 16)   # t_min == t_max
    import dataclasses

    with pytest.raises(ValueError):
        fused_draw_phase_ragged(dataclasses.replace(spec, coupled=True),
                                state, 16, 8)
