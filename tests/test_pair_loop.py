"""Leaf-pair fused loop (nuts.py body_pair) equivalence.

Two tiers:

1. EAGER bitwise: driven op-by-op (no jit), `body_pair` reproduces the
   single-leaf `body` EXACTLY — full final state, every field, every
   checkpoint stack — across criteria × samplers × metric modes ×
   divergence regimes. Eager execution removes XLA fusion/FMA
   nondeterminism, so any discrepancy is a real specialization bug.

2. Compiled statistical: under jit the two loop layouts produce different
   HLO, and XLA's FMA contraction differs at ~1e-15/op; a reservoir
   comparison landing within that noise can select a different (equally
   correct) leaf. So the compiled fused paths are compared statistically:
   posterior moments, tree-depth distribution, acceptance, divergence.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advancedhmc_tpu import (
    ClassicNoUTurn,
    GeneralisedNoUTurn,
    HMCKernel,
    Leapfrog,
    StrictGeneralisedNoUTurn,
    Trajectory,
    init_state,
    make_metric,
)
from advancedhmc_tpu.adaptation import AdaptorConfig
from advancedhmc_tpu.hamiltonian import Hamiltonian
from advancedhmc_tpu.models import neal_funnel, std_gaussian
from advancedhmc_tpu.nuts import nuts_transition
from advancedhmc_tpu.sampler import SampleSpec, fused_draw_phase

D = 6


def _compare_eager(crit, ts, metric_kind, eps, target, seed, slim,
                   coupled=False):
    """Drive one full transition through both bodies eagerly; the single
    path is advanced leaf-by-leaf to the pair path's leaf total each
    pair-iteration. Returns the list of mismatching state fields."""
    metric = make_metric(metric_kind, D, dtype=jnp.float64)
    h = Hamiltonian(metric=metric, target=target)
    traj = Trajectory(Leapfrog(step_size=jnp.asarray(eps, jnp.float64)),
                      crit, ts)
    key = jax.random.PRNGKey(seed)
    ck = jax.random.PRNGKey(seed + 300) if coupled else None
    theta0 = 0.3 * jax.random.normal(jax.random.PRNGKey(seed + 100), (D,),
                                     jnp.float64)
    z0 = h.init_phasepoint(jax.random.PRNGKey(seed + 200), theta0)
    st1, _, b1, _ = nuts_transition(key, h, traj, z0,
                                    _return_machinery=True,
                                    _slim_candidates=slim, coupled_key=ck)
    _, _, b2, _ = nuts_transition(key, h, traj, z0, _return_machinery=True,
                                  _slim_candidates=slim, coupled_key=ck,
                                  _pair=True)
    s1, s2 = dict(st1), dict(st1)
    it = 0
    while not bool(s2["done"]) and it < 40:
        s2 = b2(s2)
        it += 1

        def tot(s):
            return int(s["n_alpha"]) + int(s["s_n_alpha"])

        while (tot(s1) < tot(s2)
               or (tot(s1) == tot(s2)
                   and int(s1["leaf"]) != int(s2["leaf"]))) \
                and not bool(s1["done"]):
            s1 = b1(s1)
    while not bool(s1["done"]):
        s1 = b1(s1)
    bad = []
    for k in s1:
        for x, y in zip(jax.tree_util.tree_leaves(s1[k]),
                        jax.tree_util.tree_leaves(s2[k])):
            if not np.array_equal(np.asarray(x), np.asarray(y),
                                  equal_nan=True):
                bad.append(k)
                break
    return bad


_CRITS = [GeneralisedNoUTurn(max_depth=6), ClassicNoUTurn(max_depth=6),
          StrictGeneralisedNoUTurn(max_depth=6)]


@pytest.mark.parametrize("crit", _CRITS, ids=lambda c: type(c).__name__)
@pytest.mark.parametrize("ts", ["multinomial", "slice"])
def test_pair_body_bitwise_eager(crit, ts):
    for seed, (eps, tgt), mk, slim in itertools.product(
        range(3),
        [(0.4, std_gaussian(D)), (1.3, neal_funnel(D))],  # incl. divergences
        ["diagonal"], [True],
    ):
        bad = _compare_eager(crit, ts, mk, eps, tgt, seed, slim)
        assert not bad, (type(crit).__name__, ts, mk, eps, seed, bad)


def test_pair_body_bitwise_eager_variants():
    """unit metric (cheap_vel) and non-slim candidate carry."""
    crit = GeneralisedNoUTurn(max_depth=6)
    for mk, slim in [("unit", True), ("diagonal", False)]:
        bad = _compare_eager(crit, "multinomial", mk, 0.4, std_gaussian(D),
                             1, slim)
        assert not bad, (mk, slim, bad)


def _fused(pair, n_draws=256, fuse=16, eps=0.45):
    target = std_gaussian(D)
    kernel = HMCKernel(Trajectory(
        Leapfrog(step_size=jnp.asarray(eps, jnp.float64)),
        GeneralisedNoUTurn(max_depth=5), "multinomial",
    ))
    spec = SampleSpec(target=target, kernel=kernel,
                      adaptor=AdaptorConfig(kind="none"))
    state = init_state(jax.random.PRNGKey(3), spec,
                       make_metric("diagonal", D, dtype=jnp.float64),
                       0.3 * jax.random.normal(jax.random.PRNGKey(5),
                                               (64, D), jnp.float64),
                       init_eps=eps)
    return fused_draw_phase(spec, state, n_draws, fuse, pair=pair)


def test_pair_fused_statistical_equivalence():
    _, th1, s1 = _fused(False)
    _, th2, s2 = _fused(True)
    a1 = np.asarray(th1).reshape(-1, D)
    a2 = np.asarray(th2).reshape(-1, D)
    # std normal target: moments agree within MC error
    np.testing.assert_allclose(a1.mean(0), a2.mean(0), atol=0.06)
    np.testing.assert_allclose(a1.std(0), a2.std(0), atol=0.06)
    np.testing.assert_allclose(
        float(np.asarray(s1["acceptance_rate"]).mean()),
        float(np.asarray(s2["acceptance_rate"]).mean()), atol=0.01,
    )
    # identical tree-shape distribution (depth histogram)
    d1 = np.bincount(np.asarray(s1["tree_depth"]).ravel(), minlength=6)
    d2 = np.bincount(np.asarray(s2["tree_depth"]).ravel(), minlength=6)
    n = d1.sum()
    np.testing.assert_allclose(d1 / n, d2 / n, atol=0.03)
    # leaf accounting: n_steps counts USEFUL leaves only (the lone unit's
    # wasted second leapfrog is never recorded)
    assert np.asarray(s2["n_steps"]).min() >= 1


def test_pair_per_chain_fused_warmup():
    """Per-chain in-loop adaptation (fused_warmup_phase) composes with the
    pair body: boundary adaptation fires once per completed transition
    regardless of leaves-per-iteration. Gate: adapted eps/metric land where
    the single-leaf fused warmup lands, and sampling stays calibrated."""
    from advancedhmc_tpu import sample
    from advancedhmc_tpu.adaptation import AdaptorConfig

    target = std_gaussian(D)
    kernel = HMCKernel(Trajectory(
        Leapfrog(step_size=jnp.asarray(0.3, jnp.float64)),
        GeneralisedNoUTurn(max_depth=5), "multinomial",
    ))
    theta0 = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (32, D),
                                     jnp.float64)

    def run(fuse_pair):
        return sample(
            jax.random.PRNGKey(0), target, kernel,
            make_metric("diagonal", D, dtype=jnp.float64), theta0,
            n_samples=320, n_adapts=192,
            adaptor=AdaptorConfig(kind="stan"), init_eps=0.3,
            fuse_warmup=True, fuse_pair=fuse_pair,
        )

    single, paired = run(False), run(True)
    eps_s = np.asarray(single.final_state.adapt.da.eps)
    eps_p = np.asarray(paired.final_state.adapt.da.eps)
    assert abs(np.log(eps_p.mean() / eps_s.mean())) < 0.35
    np.testing.assert_allclose(
        np.asarray(paired.final_state.metric.m_inv).mean(0),
        np.asarray(single.final_state.metric.m_inv).mean(0), rtol=0.3,
    )
    draws = np.asarray(paired.thetas[192:]).reshape(-1, D)
    assert np.abs(draws.mean(0)).max() < 0.3
    assert np.abs(draws.std(0) - 1.0).max() < 0.3


def test_pair_body_bitwise_eager_coupled_key():
    """coupled_key (shared doubling directions, ref utilities.jl:39-47)
    threads through body_pair bitwise-identically to the single-leaf body's
    fold-in-by-depth draw (VERDICT r4 missing #2). Covers both criteria
    tiers and a divergence-prone step size."""
    for crit in (_CRITS[0], _CRITS[2]):
        for eps, tgt in [(0.4, std_gaussian(D)), (1.3, neal_funnel(D))]:
            for seed in range(2):
                bad = _compare_eager(crit, "multinomial", "diagonal", eps,
                                     tgt, seed, True, coupled=True)
                assert not bad, (type(crit).__name__, eps, seed, bad)


def test_pair_coupled_shared_directions():
    """Under vmap with one coupled_key, pair-loop chains draw the SAME
    direction sequence: identical-start chains produce identical
    trajectories (the defining property of the reference's rand_coupled
    vectorized mode)."""
    target = std_gaussian(D)
    metric = make_metric("diagonal", D, dtype=jnp.float64)
    h = Hamiltonian(metric=metric, target=target)
    traj = Trajectory(Leapfrog(step_size=jnp.asarray(0.4, jnp.float64)),
                      GeneralisedNoUTurn(max_depth=5), "multinomial")
    ck = jax.random.PRNGKey(11)
    theta0 = 0.3 * jax.random.normal(jax.random.PRNGKey(12), (D,),
                                     jnp.float64)
    z0 = h.init_phasepoint(jax.random.PRNGKey(13), theta0)
    # same per-chain key + same start: coupled directions make the whole
    # transition deterministic-identical across the batch
    keys = jnp.broadcast_to(jax.random.PRNGKey(14), (8, 2))
    zb = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), z0)
    z1, s1 = jax.jit(jax.vmap(
        lambda k, z: nuts_transition(k, h, traj, z, coupled_key=ck,
                                     _pair=True)))(keys, zb)
    th = np.asarray(z1.theta)
    assert np.all(th == th[0])
    assert np.all(np.asarray(s1["tree_depth"]) ==
                  np.asarray(s1["tree_depth"])[0])


def test_pair_direct_path_uses_pair_body():
    """nuts_transition(_pair=True) without _return_machinery must run the
    PAIR body (ADVICE r4 #1: the flag was silently dropped). Pinned via the
    pair body's force_directions rejection: reaching body_pair raises, the
    single-leaf body would silently accept."""
    target = std_gaussian(D)
    metric = make_metric("diagonal", D, dtype=jnp.float64)
    h = Hamiltonian(metric=metric, target=target)
    traj = Trajectory(Leapfrog(step_size=jnp.asarray(0.4, jnp.float64)),
                      GeneralisedNoUTurn(max_depth=5), "multinomial")
    theta0 = jnp.zeros((D,), jnp.float64)
    z0 = h.init_phasepoint(jax.random.PRNGKey(1), theta0)
    fd = jnp.ones((5,), jnp.int32)
    with pytest.raises(AssertionError, match="force_directions"):
        nuts_transition(jax.random.PRNGKey(0), h, traj, z0,
                        force_directions=fd, _pair=True)
    # sanity: the same call without _pair works (oracle-test hook intact)
    z1, s1 = nuts_transition(jax.random.PRNGKey(0), h, traj, z0,
                             force_directions=fd)
    assert np.isfinite(np.asarray(z1.theta)).all()


def test_pair_compiled_f64_crosscheck():
    """Compiled (jit) pair-vs-single cross-check at f64 (VERDICT r4 weak
    #6): XLA FMA re-association noise is ~1e-15 relative, so ONE
    transition's outputs agree to ~1e-9 unless a specialization bug causes
    a different leaf/candidate selection — which would show up
    macroscopically. Integer statistics (depth, n_steps) must be exact."""
    target = neal_funnel(D)
    metric = make_metric("diagonal", D, dtype=jnp.float64)
    h = Hamiltonian(metric=metric, target=target)
    traj = Trajectory(Leapfrog(step_size=jnp.asarray(0.25, jnp.float64)),
                      GeneralisedNoUTurn(max_depth=6), "multinomial")
    keys = jax.random.split(jax.random.PRNGKey(21), 64)
    th0 = 0.3 * jax.random.normal(jax.random.PRNGKey(22), (64, D),
                                  jnp.float64)
    zb = jax.vmap(h.init_phasepoint)(jax.random.split(
        jax.random.PRNGKey(23), 64), th0)

    def run(pair):
        f = jax.jit(jax.vmap(
            lambda k, z: nuts_transition(k, h, traj, z, _pair=pair)))
        return f(keys, zb)

    z1, s1 = run(False)
    z2, s2 = run(True)
    np.testing.assert_array_equal(np.asarray(s1["tree_depth"]),
                                  np.asarray(s2["tree_depth"]))
    np.testing.assert_array_equal(np.asarray(s1["n_steps"]),
                                  np.asarray(s2["n_steps"]))
    np.testing.assert_allclose(np.asarray(z1.theta), np.asarray(z2.theta),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s1["acceptance_rate"]),
                               np.asarray(s2["acceptance_rate"]),
                               rtol=1e-9, atol=1e-9)


def test_pair_body_bitwise_eager_deep_trees():
    """Small step size → cap-terminated depth-8 trees: exercises the high
    checkpoint slots and repeated doubling merges."""
    crit = GeneralisedNoUTurn(max_depth=8)
    for seed in range(2):
        bad = _compare_eager(crit, "multinomial", "diagonal", 0.05,
                             std_gaussian(D), seed, True)
        assert not bad, (seed, bad)


def test_pair_body_bitwise_eager_traced_cap():
    """Traced depth cap (the transient-gated warmup schedule) binds the
    pair body identically to the single-leaf body."""
    crit = GeneralisedNoUTurn(max_depth=6)
    target = std_gaussian(D)
    metric = make_metric("diagonal", D, dtype=jnp.float64)
    h = Hamiltonian(metric=metric, target=target)
    from advancedhmc_tpu.trajectory import Trajectory as _T
    from advancedhmc_tpu import Leapfrog as _L

    traj = _T(_L(step_size=jnp.asarray(0.1, jnp.float64)), crit,
              "multinomial")
    key = jax.random.PRNGKey(2)
    theta0 = 0.3 * jax.random.normal(jax.random.PRNGKey(102), (D,),
                                     jnp.float64)
    z0 = h.init_phasepoint(jax.random.PRNGKey(202), theta0)
    st1, _, b1, _ = nuts_transition(key, h, traj, z0,
                                    _return_machinery=True,
                                    _slim_candidates=True, _traced_cap=True)
    _, _, b2, _ = nuts_transition(key, h, traj, z0, _return_machinery=True,
                                  _slim_candidates=True, _traced_cap=True,
                                  _pair=True)
    cap = jnp.asarray(3, jnp.int32)
    s1 = dict(st1, cap=cap)
    s2 = dict(st1, cap=cap)
    it = 0
    while not bool(s2["done"]) and it < 40:
        s2 = b2(s2)
        it += 1

        def tot(s):
            return int(s["n_alpha"]) + int(s["s_n_alpha"])

        while (tot(s1) < tot(s2)
               or (tot(s1) == tot(s2)
                   and int(s1["leaf"]) != int(s2["leaf"]))) \
                and not bool(s1["done"]):
            s1 = b1(s1)
    while not bool(s1["done"]):
        s1 = b1(s1)
    assert int(s1["depth"]) <= 3 and int(s2["depth"]) <= 3
    for k in s1:
        for x, y in zip(jax.tree_util.tree_leaves(s1[k]),
                        jax.tree_util.tree_leaves(s2[k])):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=k)
