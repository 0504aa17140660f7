"""Distributional tests of progressive/biased trajectory sampling
(≅ /root/reference/test/trajectory.jl:143-177 combine-frequency checks).

With forced directions and no U-turns, the NUTS candidate distribution is
analytically computable from the leaf weights: in-subtree combines are
unbiased (P ∝ w), top-level doubling accepts are biased
(P(new) = min(1, W_new/W_old)). We check empirical frequencies over many
keys against the exact composition of those rules.
"""

import numpy as np

import jax
import jax.numpy as jnp

from advancedhmc_tpu import (
    GeneralisedNoUTurn,
    Hamiltonian,
    Leapfrog,
    LogDensityTarget,
    Trajectory,
    UnitEuclideanMetric,
    nuts_transition,
)
from advancedhmc_tpu.integrators import leapfrog_step


def _setup(max_depth):
    # A gentle 1-D quadratic so no U-turn fires within 4 leaves at eps=0.3
    target = LogDensityTarget(lambda x: -0.5 * jnp.sum(x**2), 1)
    h = Hamiltonian(metric=UnitEuclideanMetric(size=1, _dtype=jnp.float64),
                    target=target)
    integ = Leapfrog(step_size=jnp.asarray(0.3, jnp.float64))
    traj = Trajectory(integrator=integ,
                      criterion=GeneralisedNoUTurn(max_depth=max_depth),
                      ts_kind="multinomial")
    z0 = h.phasepoint(jnp.asarray([0.4]), jnp.asarray([1.1]))
    return h, integ, traj, z0


def _leaf_energies(h, integ, z0, n):
    zs = [z0]
    z = z0
    for _ in range(n):
        z = leapfrog_step(integ, h, z, float(integ.current_step_size))
        zs.append(z)
    return zs, [float(zz.energy()) for zz in zs]


def test_depth1_biased_accept_frequency():
    """2-leaf tree: P(candidate = new leaf) = min(1, w1/w0)."""
    h, integ, traj, z0 = _setup(max_depth=1)
    dirs = np.asarray([1])
    zs, hs = _leaf_energies(h, integ, z0, 1)
    w = np.exp(hs[0] - np.asarray(hs))  # w0 = 1, w1 = exp(H0 - H1)
    p_new_expected = min(1.0, w[1] / w[0])

    n = 40000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    run = jax.jit(jax.vmap(
        lambda k: nuts_transition(k, h, traj, z0,
                                  force_directions=dirs)[0].theta[0]
    ))
    thetas = np.asarray(run(keys))
    new_theta = float(zs[1].theta[0])
    frac_new = np.mean(np.abs(thetas - new_theta) < 1e-9)
    assert abs(frac_new - p_new_expected) < 0.01, (frac_new, p_new_expected)


def test_depth2_candidate_distribution():
    """4-leaf tree with forced forward directions: compose unbiased in-subtree
    reservoir + biased top-level accept, compare all 4 leaf frequencies."""
    h, integ, traj, z0 = _setup(max_depth=2)
    dirs = np.asarray([1, 1])
    zs, hs = _leaf_energies(h, integ, z0, 3)
    w = np.exp(hs[0] - np.asarray(hs))  # (w0..w3), w0 = 1

    # doubling 1: candidate ∈ {z0, z1}: P(z1) = min(1, w1/w0)
    p1 = min(1.0, w[1] / w[0])
    probs = np.asarray([1 - p1, p1, 0.0, 0.0])
    # doubling 2: subtree {z2, z3}: reservoir P(z3|sub) = w3/(w2+w3);
    # accept subtree candidate with min(1, (w2+w3)/(w0+w1))
    acc = min(1.0, (w[2] + w[3]) / (w[0] + w[1]))
    sub = np.asarray([0.0, 0.0, w[2], w[3]]) / (w[2] + w[3])
    probs = (1 - acc) * probs + acc * sub

    n = 60000
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    run = jax.jit(jax.vmap(
        lambda k: nuts_transition(k, h, traj, z0,
                                  force_directions=dirs)[0].theta[0]
    ))
    thetas = np.asarray(run(keys))
    leaf_thetas = np.asarray([float(z.theta[0]) for z in zs])
    counts = np.zeros(4)
    for i, lt in enumerate(leaf_thetas):
        counts[i] = np.mean(np.abs(thetas - lt) < 1e-9)
    assert counts.sum() > 0.999  # candidate always a tree leaf
    np.testing.assert_allclose(counts, probs, atol=0.012)


def test_static_multinomial_is_weight_proportional():
    """Static multinomial with fixed split (L encompasses both directions):
    aggregate over random splits, empirical support matches trajectory."""
    h, integ, traj0, z0 = _setup(max_depth=1)
    from advancedhmc_tpu import FixedNSteps
    from advancedhmc_tpu.trajectory import transition_static

    traj = Trajectory(integrator=integ, criterion=FixedNSteps(3),
                      ts_kind="multinomial")
    n = 30000
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    run = jax.jit(jax.vmap(
        lambda k: transition_static(k, h, traj, z0)[0].theta[0]
    ))
    thetas = np.asarray(run(keys))
    # All candidates must be leapfrog-reachable points of the ±3-step fan
    fan = [z0]
    z = z0
    for _ in range(3):
        z = leapfrog_step(integ, h, z, 0.3)
        fan.append(z)
    z = z0
    for _ in range(3):
        z = leapfrog_step(integ, h, z, -0.3)
        fan.append(z)
    fan_thetas = np.asarray(sorted(float(zz.theta[0]) for zz in fan))
    # momentum flip doesn't change theta; check support
    ok = np.zeros(len(thetas), bool)
    for ft in fan_thetas:
        ok |= np.abs(thetas - ft) < 1e-9
    assert ok.all()
    # center (z0) must have positive mass; extremes reachable
    assert np.mean(np.abs(thetas - float(z0.theta[0])) < 1e-9) > 0.05
