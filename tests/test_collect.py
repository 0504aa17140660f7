"""Collection modes: thinning and storage-free online summaries.

The reference always materialises every draw (/root/reference/src/sampler.jl:
188,224-227); `thin` and `collect="online"` are new memory-bound-long-run
capabilities. These tests pin their semantics against the store-everything
path on the same PRNG stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedhmc_tpu import (
    AdaptorConfig,
    GeneralisedNoUTurn,
    HMCKernel,
    Leapfrog,
    Trajectory,
    make_metric,
    sample,
)
from advancedhmc_tpu.diagnostics import (
    effective_sample_size,
    online_init,
    online_summary,
    online_update,
)
from advancedhmc_tpu.models import std_gaussian


DIM = 4
N_CHAINS = 8


def _kernel(max_depth=5):
    return HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.4)),
            GeneralisedNoUTurn(max_depth=max_depth),
            "multinomial",
        )
    )


def _run(**kw):
    target = std_gaussian(DIM)
    key = jax.random.PRNGKey(7)
    theta0 = jax.random.normal(jax.random.PRNGKey(1), (N_CHAINS, DIM))
    return sample(
        key, target, _kernel(), make_metric("diagonal", DIM, dtype=jnp.float64), theta0,
        init_eps=0.4, **kw,
    )


def test_online_moments_match_numpy():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(100, 3, 2))
    om = online_init(3, 2, n_lags=8, dtype=jnp.float64)
    for x in xs:
        om = online_update(om, jnp.asarray(x))
    s = online_summary(om)
    np.testing.assert_allclose(np.asarray(s["mean"]), xs.mean(0), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(s["var"]), xs.var(0, ddof=1), rtol=1e-10
    )
    # iid stream → ESS ≈ total draw count (rough: autocov noise at n=100)
    assert np.all(np.asarray(s["ess"]) > 0.4 * 300)


def test_online_ess_tracks_stored_ess_on_ar1():
    # AR(1) with strong autocorrelation: online (lag-truncated) ESS should
    # agree with the FFT estimator within a factor.
    rho = 0.7
    rng = np.random.default_rng(1)
    n, c, d = 800, 4, 2
    x = np.zeros((n, c, d))
    eps = rng.normal(size=(n, c, d)) * np.sqrt(1 - rho**2)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + eps[t]
    om = online_init(c, d, n_lags=24, dtype=jnp.float64)
    for xt in x:
        om = online_update(om, jnp.asarray(xt))
    ess_online = np.asarray(online_summary(om)["ess"])
    ess_fft = np.asarray(effective_sample_size(jnp.asarray(x)))
    assert np.all(ess_online / ess_fft > 0.5)
    assert np.all(ess_online / ess_fft < 2.0)


def test_thin_matches_unthinned_stream():
    full = _run(n_samples=48, n_adapts=0)
    thinned = _run(n_samples=48, n_adapts=0, thin=4)
    assert thinned.thetas.shape == (12, N_CHAINS, DIM)
    np.testing.assert_allclose(
        np.asarray(thinned.thetas), np.asarray(full.thetas[3::4]), rtol=1e-12
    )
    # leapfrog totals are preserved, divergences OR-ed
    ns_full = np.asarray(full.stats["n_steps"]).reshape(12, 4, N_CHAINS)
    np.testing.assert_array_equal(
        np.asarray(thinned.stats["n_steps"]), ns_full.sum(1)
    )
    np.testing.assert_allclose(
        np.asarray(thinned.stats["log_density"]),
        np.asarray(full.stats["log_density"][3::4]),
        rtol=1e-12,
    )


def test_thin_with_warmup_requires_drop():
    with pytest.raises(ValueError):
        _run(n_samples=40, n_adapts=8, adaptor=AdaptorConfig(kind="stepsize"),
             thin=2)
    out = _run(n_samples=40, n_adapts=8,
               adaptor=AdaptorConfig(kind="stepsize"), thin=2,
               drop_warmup=True)
    assert out.thetas.shape == (16, N_CHAINS, DIM)


def test_online_matches_stored_draws():
    full = _run(n_samples=64, n_adapts=0)
    online = _run(n_samples=64, n_adapts=0, collect="online")
    assert online.thetas is None
    assert online.online["n"] == 64
    np.testing.assert_allclose(
        np.asarray(online.online["mean"]),
        np.asarray(full.thetas).mean(0),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(online.online["var"]),
        np.asarray(full.thetas).var(0, ddof=1),
        rtol=1e-10,
    )
    # stats stream identical
    np.testing.assert_allclose(
        np.asarray(online.stats["log_density"]),
        np.asarray(full.stats["log_density"]),
        rtol=1e-12,
    )


def test_online_fused_matches_fused_draws():
    full = _run(n_samples=32, n_adapts=0, fuse_draws=8)
    online = _run(n_samples=32, n_adapts=0, fuse_draws=8, collect="online")
    assert online.thetas is None
    np.testing.assert_allclose(
        np.asarray(online.online["mean"]),
        np.asarray(full.thetas).mean(0),
        rtol=1e-10,
    )


def test_thin_fused_matches_fused_stream():
    full = _run(n_samples=32, n_adapts=0, fuse_draws=8)
    thinned = _run(n_samples=32, n_adapts=0, fuse_draws=8, thin=4)
    assert thinned.thetas.shape == (8, N_CHAINS, DIM)
    np.testing.assert_allclose(
        np.asarray(thinned.thetas), np.asarray(full.thetas[3::4]), rtol=1e-12
    )


def test_chain_chunked_fused_draws_bit_identical():
    """chain_chunks=S (the 8192-chain VMEM-spill mitigation) is a pure
    residency change: draw-phase chains are independent with adaptation
    frozen, so the chunked stream must equal the unchunked one exactly —
    draws, stats, and final state."""
    full = _run(n_samples=32, n_adapts=0, fuse_draws=8)
    for s in (2, 4):
        chunked = _run(n_samples=32, n_adapts=0, fuse_draws=8,
                       fuse_chain_chunks=s)
        np.testing.assert_array_equal(
            np.asarray(chunked.thetas), np.asarray(full.thetas)
        )
        for k in full.stats:
            np.testing.assert_array_equal(
                np.asarray(chunked.stats[k]), np.asarray(full.stats[k]),
                err_msg=k,
            )
        np.testing.assert_array_equal(
            np.asarray(chunked.final_state.z.theta),
            np.asarray(full.final_state.z.theta),
        )


def test_chain_chunked_cross_chain_and_online():
    """Chunking composes with the cross-chain (shared-metric) layout and
    online collection."""
    full = _run(n_samples=32, n_adapts=0, fuse_draws=8, cross_chain=True)
    chunked = _run(n_samples=32, n_adapts=0, fuse_draws=8, cross_chain=True,
                   fuse_chain_chunks=4)
    np.testing.assert_array_equal(
        np.asarray(chunked.thetas), np.asarray(full.thetas)
    )
    online = _run(n_samples=32, n_adapts=0, fuse_draws=8,
                  fuse_chain_chunks=2, collect="online")
    stored = _run(n_samples=32, n_adapts=0, fuse_draws=8)
    np.testing.assert_allclose(
        np.asarray(online.online["mean"]),
        np.asarray(stored.thetas).mean(0),
        rtol=1e-10,
    )


def test_chain_chunks_compose_with_pair():
    """chain_chunks and the leaf-pair loop together (the 8192-chain bench
    layout): chunked+paired equals unchunked+paired exactly (chunking is
    pure residency; pair determinism is per-chain)."""
    full = _run(n_samples=32, n_adapts=0, fuse_draws=8, fuse_pair=True)
    chunked = _run(n_samples=32, n_adapts=0, fuse_draws=8, fuse_pair=True,
                   fuse_chain_chunks=4)
    np.testing.assert_array_equal(
        np.asarray(chunked.thetas), np.asarray(full.thetas)
    )
    for k in full.stats:
        np.testing.assert_array_equal(
            np.asarray(chunked.stats[k]), np.asarray(full.stats[k]),
            err_msg=k,
        )
