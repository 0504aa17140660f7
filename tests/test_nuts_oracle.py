"""Iterative NUTS vs the reference-semantics recursion oracle.

Validates SURVEY.md hard part #1: the while-loop tree must match the
recursion's leaf order, U-turn check set, termination and statistics
(/root/reference/src/trajectory.jl:626-742) — verified here over a sweep of
targets × step sizes × criteria × samplers × direction sequences.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advancedhmc_tpu import (
    ClassicNoUTurn,
    DiagEuclideanMetric,
    GeneralisedNoUTurn,
    Hamiltonian,
    Leapfrog,
    LogDensityTarget,
    StrictGeneralisedNoUTurn,
    Trajectory,
    nuts_transition,
)
from advancedhmc_tpu.utils import rand_exponential

from nuts_oracle import nuts_oracle


def _std_normal(dim):
    return LogDensityTarget(lambda x: -0.5 * jnp.sum(x**2), dim)


def _corr_normal(dim):
    prec = jnp.eye(dim) + 0.5 * jnp.ones((dim, dim))
    return LogDensityTarget(lambda x: -0.5 * x @ prec @ x, dim)


def _rosenbrock(dim):
    def logp(x):
        return -jnp.sum(
            100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
        ) / 20.0

    return LogDensityTarget(logp, dim)


CRITERIA = {
    "classic": ClassicNoUTurn,
    "generalised": GeneralisedNoUTurn,
    "strict": StrictGeneralisedNoUTurn,
}


def _run_pair(target, dim, eps, crit_name, ts_kind, max_depth, seed):
    key = jax.random.PRNGKey(seed)
    k_dir, k_init, k_mom, k_tr = jax.random.split(key, 4)

    criterion = CRITERIA[crit_name](max_depth=max_depth, delta_max=1000.0)
    metric = DiagEuclideanMetric.create(
        jnp.linspace(0.5, 2.0, dim).astype(jnp.float64)
    )
    h = Hamiltonian(metric=metric, target=target)
    integ = Leapfrog(step_size=jnp.asarray(eps, jnp.float64))
    traj = Trajectory(integrator=integ, criterion=criterion, ts_kind=ts_kind)

    theta0 = jax.random.normal(k_init, (dim,), jnp.float64)
    z0 = h.init_phasepoint(k_mom, theta0)

    directions = np.where(
        np.asarray(jax.random.bernoulli(k_dir, shape=(max_depth,))), 1, -1
    )

    zc, stats, dbg = nuts_transition(
        k_tr, h, traj, z0, force_directions=directions, return_debug=True
    )

    # Reproduce the slice variable the transition drew (nuts.py derivation).
    _, key_slice = jax.random.split(k_tr)
    h0 = float(z0.energy())
    lu = None
    if ts_kind == "slice":
        lu = float(-z0.energy() - rand_exponential(key_slice, dtype=jnp.float64))

    oracle = nuts_oracle(h, integ, criterion, ts_kind, z0, directions, lu=lu)
    return stats, dbg, oracle


CASES = []
for seed in range(12):
    CASES.append(("std", 5, 0.45, "generalised", "multinomial", 6, seed))
for seed in range(6):
    CASES.append(("corr", 4, 0.3, "strict", "multinomial", 6, seed))
    CASES.append(("std", 3, 0.6, "classic", "multinomial", 5, seed))
    CASES.append(("std", 5, 0.45, "generalised", "slice", 6, seed))
    CASES.append(("corr", 4, 0.35, "strict", "slice", 5, seed))
    CASES.append(("rosen", 3, 0.15, "strict", "multinomial", 8, seed))
    # Large step sizes → divergences exercised
    CASES.append(("std", 2, 2.9, "generalised", "multinomial", 6, seed))
    CASES.append(("rosen", 3, 1.5, "generalised", "multinomial", 6, seed))
for seed in range(6, 14):
    # extra strict-criterion coverage (backward builds exercise the
    # orientation-flipped half-tree checks)
    CASES.append(("corr", 6, 0.25, "strict", "multinomial", 7, seed))
    CASES.append(("std", 8, 0.35, "strict", "slice", 7, seed))
    CASES.append(("rosen", 4, 0.12, "strict", "multinomial", 9, seed))
    CASES.append(("corr", 3, 0.5, "classic", "slice", 6, seed))


@pytest.mark.parametrize(
    "tname,dim,eps,crit,ts,max_depth,seed", CASES
)
def test_iterative_matches_recursion(tname, dim, eps, crit, ts, max_depth, seed):
    target = {"std": _std_normal, "corr": _corr_normal, "rosen": _rosenbrock}[
        tname
    ](dim)
    stats, dbg, oracle = _run_pair(target, dim, eps, crit, ts, max_depth, seed)

    assert int(stats["n_steps"]) == oracle["n_steps"]
    assert int(stats["tree_depth"]) == oracle["depth"]
    assert bool(stats["numerical_error"]) == oracle["diverged"]
    np.testing.assert_allclose(
        float(stats["acceptance_rate"]),
        oracle["sum_alpha"] / max(oracle["n_steps"], 1),
        rtol=1e-10,
    )
    if np.isfinite(oracle["dh_max"]):
        np.testing.assert_allclose(
            float(stats["max_hamiltonian_energy_error"]),
            oracle["dh_max"],
            rtol=1e-8,
        )
    np.testing.assert_allclose(np.asarray(dbg["t_rho"]), oracle["rho"], rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(dbg["t_zleft"].theta), oracle["zleft_theta"], rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(dbg["t_zright"].theta), oracle["zright_theta"], rtol=1e-8
    )
    if ts == "multinomial":
        if np.isfinite(oracle["logw"]):
            np.testing.assert_allclose(
                float(dbg["t_w"]), oracle["logw"], rtol=1e-8
            )
    else:
        assert float(dbg["t_w"]) == oracle["n_slice"]


def test_candidate_is_a_trajectory_point():
    """The returned candidate must be a leaf of the built tree (finite logp)."""
    target = _std_normal(5)
    stats_any = False
    for seed in range(5):
        stats, dbg, oracle = _run_pair(
            target, 5, 0.5, "generalised", "multinomial", 6, seed
        )
        assert np.isfinite(float(dbg["zcand"].logdensity))
        stats_any = True
    assert stats_any
