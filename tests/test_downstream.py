"""Downstream-consumer suite (≅ /root/reference/test/turing/runtests.jl:14-22).

Drives ONLY the public API, the way an external PPL / workflow layer would:
build a target (flat, pytree, constrained), sample with the convenience
constructors, read diagnostics, export named posteriors (arviz-style
round-trip), checkpoint and resume — across the models zoo. No engine
internals are imported; everything reachable from `advancedhmc_tpu` and its
documented submodules only.
"""

import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp
import pytest

import advancedhmc_tpu as ahmc
from advancedhmc_tpu.checkpoint import load_state, save_state
from advancedhmc_tpu.models import (
    banana,
    correlated_gaussian,
    eight_schools,
    gdemo,
    neal_funnel,
    std_gaussian,
)
from advancedhmc_tpu.transforms import Positive, transformed_target

SEED = jax.random.PRNGKey(11)


def _run(target, n=300, n_adapts=150, chains=16, delta=0.8, **kw):
    return ahmc.NUTS(delta).sample(
        SEED, target, jnp.zeros(target.dim, jnp.float64), n,
        n_adapts=n_adapts, n_chains=chains, drop_warmup=True,
        dtype=jnp.float64, **kw)


# name: (target, delta, mean0, sd0, max_div, max_rhat) — the funnel runs at
# δ=0.95 like VALIDATION.md config 3 (its neck diverges at looser targets)
ZOO = {
    "std_gaussian": (std_gaussian(5), 0.8, 0.0, 1.0, 0.05, 1.2),
    "correlated_gaussian": (correlated_gaussian(4, rho=0.5), 0.8, 0.0, None,
                            0.05, 1.2),
    "funnel": (neal_funnel(5), 0.95, None, None, 0.05, 1.6),
    "eight_schools": (eight_schools(), 0.8, None, None, 0.05, 1.2),
    "banana": (banana(), 0.8, None, None, 0.05, 1.2),
}


@pytest.mark.parametrize("name", sorted(ZOO))
def test_zoo_sample_summarize_export(name):
    target, delta, mean0, sd0, max_div, max_rhat = ZOO[name]
    res = _run(target, delta=delta)
    # draws exist and are finite
    th = np.asarray(res.thetas)
    assert th.shape == (150, 16, target.dim)
    assert np.isfinite(th).all()
    # diagnostics: the consumer-facing report runs and is sane
    rep = ahmc.summarize(res, verbose=False)
    assert float(np.asarray(rep["divergence_rate"]).mean()) < max_div
    rh = np.asarray(ahmc.split_rhat(res.thetas))
    assert rh.max() < max_rhat, (name, rh.max())
    # export round-trip: named posterior dict with (chain, draw, ...) layout
    idata = res.to_inference_dict()
    post = idata["posterior"]
    (k0, v0), = [next(iter(post.items()))] if len(post) == 1 else [
        list(post.items())[0]]
    assert v0.shape[:2] == (16, 150)
    stats_ = idata["sample_stats"]
    assert "acceptance_rate" in stats_ and "diverging" in stats_
    # summary table runs
    table = res.summary(verbose=False)
    assert len(table) >= 1
    if mean0 is not None:
        np.testing.assert_allclose(th.mean(), mean0, atol=0.2)
    if sd0 is not None:
        np.testing.assert_allclose(th.std(), sd0, rtol=0.2)


def test_pytree_target_named_roundtrip():
    example = {"mu": jnp.zeros(3), "scales": {"log_s": jnp.zeros(2)}}

    def lp(p):
        return (-0.5 * jnp.sum(p["mu"] ** 2)
                - 0.5 * jnp.sum(p["scales"]["log_s"] ** 2))

    target = ahmc.target_from_pytree(lp, example)
    res = _run(target, n=200, n_adapts=100)
    post = res.to_inference_dict()["posterior"]
    assert set(post) == {"mu", "scales.log_s"}
    assert post["mu"].shape == (16, 100, 3)
    assert post["scales.log_s"].shape == (16, 100, 2)


def test_constrained_target_invlink_roundtrip():
    def lp_c(sigma):  # sigma > 0, two Exp(1)-ish scales
        return -jnp.sum(sigma)

    target = transformed_target(lp_c, [Positive(2)], names=["sigma"])
    res = _run(target, n=200, n_adapts=100)
    post_u = res.to_inference_dict()["posterior"]["theta"]  # unconstrained
    post_c = res.to_inference_dict(constrained=True)["posterior"]["sigma"]
    assert (np.asarray(post_c) > 0).all()
    np.testing.assert_allclose(np.exp(np.asarray(post_u)),
                               np.asarray(post_c), rtol=1e-6)
    # Exp(1) posterior mean ≈ 1
    np.testing.assert_allclose(np.asarray(post_c).mean(), 1.0, atol=0.25)


def test_gdemo_constrained_moments():
    # the reference's own demo model, via the public constrained pipeline
    from advancedhmc_tpu.models import GDEMO_MEAN
    from advancedhmc_tpu.models.gdemo import constrain as gdemo_constrain

    res = _run(gdemo(), n=400, n_adapts=200)
    con = np.asarray(gdemo_constrain(jnp.asarray(res.thetas)))
    np.testing.assert_allclose(con[..., 1].mean(), GDEMO_MEAN[1], atol=0.25)
    np.testing.assert_allclose(con[..., 0].mean(), GDEMO_MEAN[0], atol=0.6)


def test_checkpoint_resume_roundtrip():
    # consumer flow: long run → checkpoint → new process-style resume from
    # `like` → continued draws identical to an uninterrupted run
    target = std_gaussian(4)
    kernel = ahmc.HMCKernel(ahmc.Trajectory(
        ahmc.Leapfrog(step_size=jnp.asarray(0.5, jnp.float64)),
        ahmc.GeneralisedNoUTurn(), "multinomial"))
    metric = ahmc.make_metric("diagonal", 4, dtype=jnp.float64)
    adaptor = ahmc.AdaptorConfig(kind="stan")
    spec = ahmc.SampleSpec(target=target, kernel=kernel, adaptor=adaptor)
    from advancedhmc_tpu.adaptation import adapt_flags

    st = ahmc.init_state(SEED, spec, metric,
                         jnp.zeros((8, 4), jnp.float64), init_eps=0.5)
    flags = adapt_flags(adaptor, 16, 48)

    def run(state, lo, hi):
        for i in range(lo, hi):
            f = jax.tree_util.tree_map(lambda a: a[i], flags)
            state, _ = ahmc.sample_step(spec, state, f)
        return state

    mid = run(st, 0, 24)
    path = os.path.join(tempfile.mkdtemp(), "ck.npz")
    save_state(path, mid)
    resumed = load_state(path, like=st)
    a = run(mid, 24, 48)
    b = run(resumed, 24, 48)
    np.testing.assert_array_equal(np.asarray(a.z.theta),
                                  np.asarray(b.z.theta))


def test_chees_consumer_surface():
    target = std_gaussian(6)
    theta0 = 0.3 * jax.random.normal(SEED, (32, 6), jnp.float64)
    res = ahmc.sample_chees(SEED, target, theta0, n_samples=150,
                            n_adapts=100, drop_warmup=True)
    th = np.asarray(res.thetas)
    assert th.shape == (50, 32, 6)
    np.testing.assert_allclose(th.mean(), 0.0, atol=0.2)
    assert "trajectory_length" in res.stats


def test_summary_min_ess_steering_warning():
    """summary() warns when one dimension's bulk ESS collapses below 0.2×
    the median (VERDICT r4 weak #3: surface the NUTS-vs-ChEES decision) and
    stays silent on balanced mixing."""
    import warnings

    from advancedhmc_tpu.sampler import SampleResult

    rng = np.random.default_rng(0)
    n, c, d = 600, 4, 4
    x = rng.normal(size=(n, c, d))
    # dim 0: near-unit-root AR(1) → bulk ESS collapses vs the iid dims
    for t in range(1, n):
        x[t, :, 0] = 0.995 * x[t - 1, :, 0] + 0.1 * x[t, :, 0]

    def result_of(arr):
        return SampleResult(thetas=jnp.asarray(arr), stats={},
                            warmup_stats=None, final_state=None,
                            target=std_gaussian(d))

    with pytest.warns(UserWarning, match="min/median bulk-ESS"):
        result_of(x).summary(verbose=False)

    y = rng.normal(size=(n, c, d))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        result_of(y).summary(verbose=False)
