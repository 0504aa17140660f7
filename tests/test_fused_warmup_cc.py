"""Cross-chain fused warmup (block-replayed adaptation).

Gates: the block-synchronised adaptor state must land where the
per-transition scan lands (same window schedule, once-per-block DA), and the
resulting sampler must stay calibrated to the DA target.
"""

import jax
import jax.numpy as jnp
import numpy as np

from advancedhmc_tpu import (
    AdaptorConfig,
    GeneralisedNoUTurn,
    HMCKernel,
    Leapfrog,
    Trajectory,
    make_metric,
    sample,
)
from advancedhmc_tpu.models import std_gaussian


DIM, CHAINS = 6, 64


def _run(fuse_warmup, key=0, n=320, warm=192, **kw):
    target = std_gaussian(DIM)
    kernel = HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.3, jnp.float64)),
            GeneralisedNoUTurn(max_depth=5),
            "multinomial",
        )
    )
    theta0 = 0.2 * jax.random.normal(
        jax.random.PRNGKey(1), (CHAINS, DIM), jnp.float64
    )
    adaptor = kw.pop("adaptor", AdaptorConfig(kind="stan"))
    return sample(
        jax.random.PRNGKey(key), target, kernel,
        make_metric("diagonal", DIM, dtype=jnp.float64), theta0,
        n_samples=n, n_adapts=warm, adaptor=adaptor,
        cross_chain=True, init_eps=0.3, fuse_warmup=fuse_warmup, **kw,
    )


def test_fused_cc_matches_scan_adaptation():
    scan = _run(False)
    fused = _run(True, fuse_warmup_block=8)
    eps_s = float(np.asarray(scan.stats["step_size"])[-1, 0])
    eps_f = float(np.asarray(fused.stats["step_size"])[-1, 0])
    assert abs(np.log(eps_f / eps_s)) < 0.35, (eps_s, eps_f)
    mi_s = np.asarray(scan.final_state.metric.m_inv)
    mi_f = np.asarray(fused.final_state.metric.m_inv)
    np.testing.assert_allclose(mi_f, mi_s, rtol=0.25)
    # calibration: post-warmup acceptance near the 0.8 target
    acc = float(np.mean(np.asarray(fused.stats["acceptance_rate"][192:])))
    assert 0.65 < acc <= 1.0, acc
    # statistical correctness
    post = np.asarray(fused.thetas[192:]).reshape(-1, DIM)
    np.testing.assert_allclose(post.mean(0), np.zeros(DIM), atol=0.15)
    np.testing.assert_allclose(post.std(0), np.ones(DIM), rtol=0.15)


def test_fused_warmup_dense_per_chain():
    """Per-chain DENSE metric adaptation INSIDE the fused warmup loop
    (in-loop Welford-cov + Cholesky refresh at window ends): the adapted
    per-chain covariance must approach the true covariance of a correlated
    Gaussian (rtol 0.25, ≅ /root/reference/test/adaptation.jl dense-cov
    quality gate) and the post-warmup draws must be calibrated. Exceeds the
    reference (dense metric is single-chain only, metric.jl:103)."""
    from advancedhmc_tpu.models import correlated_gaussian

    dim, chains = 4, 32
    target = correlated_gaussian(dim, rho=0.7)
    kernel = HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.3, jnp.float64)),
            GeneralisedNoUTurn(max_depth=6),
            "multinomial",
        )
    )
    theta0 = 0.2 * jax.random.normal(
        jax.random.PRNGKey(2), (chains, dim), jnp.float64
    )
    res = sample(
        jax.random.PRNGKey(3), target, kernel,
        make_metric("dense", dim, dtype=jnp.float64), theta0,
        1300, n_adapts=900,
        adaptor=AdaptorConfig(kind="stan", mm_kind="welford_cov"),
        init_eps=0.3, cross_chain=False, fuse_warmup=True,
        drop_warmup=True,
    )
    m_inv = np.asarray(res.final_state.metric.m_inv)   # (chains, dim, dim)
    assert m_inv.shape == (chains, dim, dim)
    true_cov = np.asarray(target.cov)
    # chains adapt independently; their MEAN estimate is the tight gate,
    # each individual chain a loose one
    np.testing.assert_allclose(m_inv.mean(axis=0), true_cov,
                               rtol=0.25, atol=0.12)
    err = np.abs(m_inv - true_cov[None]).max(axis=(1, 2))
    assert np.median(err) < 0.55
    # per-chain chol factors were refreshed in-loop: draws stay calibrated
    draws = np.asarray(res.thetas).reshape(-1, dim)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.2)
    emp = np.cov(draws.T)
    np.testing.assert_allclose(emp, true_cov, atol=0.35)
    accept = float(np.asarray(res.stats["acceptance_rate"]).mean())
    assert 0.6 < accept <= 1.0


def test_fused_cc_requires_divisible_blocks():
    # 192 % 7 != 0 → falls back to the scan path silently is NOT wanted;
    # the gate simply keeps use_fused_warmup_cc False, so it must still run
    out = _run(True, fuse_warmup_block=7, n=200, warm=100)
    assert out.thetas.shape[0] == 200


def test_fused_cc_nutpie_falls_back():
    # nutpie needs grads (not recorded) → gate falls back to scan warmup
    out = _run(True, n=120, warm=64,
               adaptor=AdaptorConfig(kind="stan", mm_kind="nutpie"))
    assert out.thetas.shape[0] == 120


def test_warmup_depth_cap_fused_cc():
    # Fast warmup: depth-capped early phase + eps re-anchor at the switch
    # (library form of the bench study, PERF.md "Warmup anatomy").
    out = _run(True, fuse_warmup_block=8, drop_warmup=True,
               warmup_depth_cap=2, warmup_cap_frac=0.75,
               warmup_eps_research=True)
    wd = np.asarray(out.warmup_stats["tree_depth"])  # (warm, C)
    n_cap = 192 * 3 // 4
    assert wd[:n_cap].max() <= 2, wd[:n_cap].max()
    # full depth available again after the switch (trees may still be short,
    # but the cap itself must be lifted by the end of warmup)
    assert wd[n_cap:].max() <= 5
    post = np.asarray(out.thetas).reshape(-1, DIM)
    np.testing.assert_allclose(post.mean(0), np.zeros(DIM), atol=0.15)
    np.testing.assert_allclose(post.std(0), np.ones(DIM), rtol=0.15)
    eps_end = float(np.asarray(out.stats["step_size"])[-1, 0])
    assert np.isfinite(eps_end) and eps_end > 0


def test_warmup_depth_cap_3phase_fused_cc():
    # 3-phase schedule: cap [0, 0.5) → eps re-anchor → cap [0.5, 0.75) →
    # full depth [0.75, 1). The DA descent after the re-anchor runs under
    # the cap (warmup_cap_frac2), bounding its deep-tree episodes.
    out = _run(True, fuse_warmup_block=8, drop_warmup=True,
               warmup_depth_cap=2, warmup_cap_frac=0.5,
               warmup_eps_research=True, warmup_cap_frac2=0.75)
    wd = np.asarray(out.warmup_stats["tree_depth"])  # (warm, C)
    n_cap2 = 192 * 3 // 4
    assert wd[:n_cap2].max() <= 2, wd[:n_cap2].max()
    assert wd[n_cap2:].max() <= 5
    post = np.asarray(out.thetas).reshape(-1, DIM)
    np.testing.assert_allclose(post.mean(0), np.zeros(DIM), atol=0.15)
    np.testing.assert_allclose(post.std(0), np.ones(DIM), rtol=0.15)
    eps_end = float(np.asarray(out.stats["step_size"])[-1, 0])
    assert np.isfinite(eps_end) and eps_end > 0


def test_warmup_cap_frac2_validation():
    import pytest

    with pytest.raises(ValueError, match="cap_frac2"):
        _run(True, fuse_warmup_block=8, drop_warmup=True,
             warmup_depth_cap=2, warmup_cap_frac=0.75,
             warmup_eps_research=True, warmup_cap_frac2=0.5)
    with pytest.raises(ValueError, match="full-depth tail"):
        _run(True, fuse_warmup_block=8, drop_warmup=True,
             warmup_depth_cap=2, warmup_cap_frac=0.5,
             warmup_eps_research=True, warmup_cap_frac2=1.0)
    # cap_frac2 with no active depth cap must raise, not be silently ignored
    with pytest.raises(ValueError, match="requires an active depth-capped"):
        _run(True, fuse_warmup_block=8, drop_warmup=True,
             warmup_cap_frac2=0.75)


def test_transient_depth_caps_schedule():
    # caps cover the init ramp and post-reset transients, full depth
    # elsewhere; window resets from the Stan schedule
    from advancedhmc_tpu.adaptation import transient_depth_caps
    from advancedhmc_tpu.adaptation.stan import stan_schedule

    caps = transient_depth_caps(256, 6, 3, init_len=40, post_len=16)
    assert caps.shape == (256,)
    assert (caps[:40] == 3).all()
    _, w_end = stan_schedule(256)
    resets = np.nonzero(w_end)[0]
    assert len(resets) >= 1
    for r in resets:
        assert (caps[r + 1: r + 1 + 16] == 3).all()
    # equilibrium region between transients stays at full depth
    mid = resets[0] - 5
    assert caps[mid] == 6


def test_warmup_transient_cap_noop_when_at_max_depth():
    # an all-max_depth caps array must reproduce the uncapped run exactly
    # (the traced cap only feeds the done predicate)
    from advancedhmc_tpu.adaptation import adapt_flags
    from advancedhmc_tpu.sampler import (
        SampleSpec, fused_warmup_phase_crosschain, init_state,
    )

    target = std_gaussian(DIM)
    kernel = HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.3, jnp.float64)),
            GeneralisedNoUTurn(max_depth=5),
            "multinomial",
        )
    )
    theta0 = 0.2 * jax.random.normal(
        jax.random.PRNGKey(1), (16, DIM), jnp.float64
    )
    spec = SampleSpec(target=target, kernel=kernel,
                      adaptor=AdaptorConfig(kind="stan"), cross_chain=True)
    st0 = init_state(jax.random.PRNGKey(5), spec,
                     make_metric("diagonal", DIM, dtype=jnp.float64),
                     theta0, init_eps=0.3)
    sA, thA, stA = fused_warmup_phase_crosschain(spec, st0, 64, 8)
    caps = np.full(64, 5, np.int32)
    sB, thB, stB = fused_warmup_phase_crosschain(spec, st0, 64, 8,
                                                 depth_caps=caps)
    np.testing.assert_array_equal(np.asarray(thA), np.asarray(thB))
    for k in stA:
        np.testing.assert_array_equal(np.asarray(stA[k]),
                                      np.asarray(stB[k]), err_msg=k)
    # caps LARGER than the criterion's static max_depth must be clamped to
    # it (the checkpoint stacks are sized for max_depth-1 rows; an
    # unclamped cap would overrun them and corrupt the U-turn check set)
    caps_big = np.full(64, 9, np.int32)
    sC, thC, stC = fused_warmup_phase_crosschain(spec, st0, 64, 8,
                                                 depth_caps=caps_big)
    np.testing.assert_array_equal(np.asarray(thA), np.asarray(thC))
    for k in stA:
        np.testing.assert_array_equal(np.asarray(stA[k]),
                                      np.asarray(stC[k]), err_msg=k)


def test_warmup_transient_cap_binds_only_where_scheduled():
    from advancedhmc_tpu.sampler import (
        SampleSpec, fused_warmup_phase_crosschain, init_state,
    )

    target = std_gaussian(DIM)
    kernel = HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.05, jnp.float64)),
            GeneralisedNoUTurn(max_depth=6),
            "multinomial",
        )
    )
    theta0 = 0.2 * jax.random.normal(
        jax.random.PRNGKey(1), (32, DIM), jnp.float64
    )
    spec = SampleSpec(target=target, kernel=kernel,
                      adaptor=AdaptorConfig(kind="stan"), cross_chain=True)
    st0 = init_state(jax.random.PRNGKey(5), spec,
                     make_metric("diagonal", DIM, dtype=jnp.float64),
                     theta0, init_eps=0.05)  # tiny eps → deep trees
    caps = np.full(96, 6, np.int32)
    caps[:32] = 2
    _, _, stats = fused_warmup_phase_crosschain(spec, st0, 96, 8,
                                                depth_caps=caps)
    depth = np.asarray(stats["tree_depth"])      # (96, C)
    assert depth[:32].max() <= 2, depth[:32].max()
    # with eps this small the uncapped region must exceed the cap
    assert depth[32:].max() > 2


def test_warmup_depth_cap_scan():
    out = _run(False, drop_warmup=True, warmup_depth_cap=2,
               warmup_cap_frac=0.5)
    wd = np.asarray(out.warmup_stats["tree_depth"])
    assert wd[:96].max() <= 2
    post = np.asarray(out.thetas).reshape(-1, DIM)
    np.testing.assert_allclose(post.mean(0), np.zeros(DIM), atol=0.15)
    np.testing.assert_allclose(post.std(0), np.ones(DIM), rtol=0.15)


def test_warmup_eps_research_needs_full_depth_tail():
    import pytest

    with pytest.raises(ValueError, match="re-anchor"):
        _run(False, drop_warmup=True, warmup_depth_cap=2,
             warmup_cap_frac=1.0, warmup_eps_research=True)


def test_warmup_depth_cap_unsupported_falls_back():
    # per-chain adaptation (cross_chain=False) → cap unsupported, still runs
    target = std_gaussian(DIM)
    kernel = HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.3, jnp.float64)),
            GeneralisedNoUTurn(max_depth=5),
            "multinomial",
        )
    )
    theta0 = 0.2 * jax.random.normal(
        jax.random.PRNGKey(1), (8, DIM), jnp.float64
    )
    out = sample(
        jax.random.PRNGKey(0), target, kernel,
        make_metric("diagonal", DIM, dtype=jnp.float64), theta0,
        n_samples=96, n_adapts=48, adaptor=AdaptorConfig(kind="stan"),
        cross_chain=False, init_eps=0.3, warmup_depth_cap=2, verbose=False,
    )
    assert out.thetas.shape[0] == 96


def test_fused_cc_pair_matches_scan_adaptation():
    """Leaf-pair warmup (fuse_pair=True) lands the adaptor where the scan
    lands — same gates as the single-leaf fused warmup."""
    scan = _run(False)
    fused = _run(True, fuse_warmup_block=8, fuse_pair=True, fuse_draws=8)
    eps_s = float(np.asarray(scan.stats["step_size"])[-1, 0])
    eps_f = float(np.asarray(fused.stats["step_size"])[-1, 0])
    assert abs(np.log(eps_f / eps_s)) < 0.35, (eps_s, eps_f)
    mi_s = np.asarray(scan.final_state.metric.m_inv)
    mi_f = np.asarray(fused.final_state.metric.m_inv)
    np.testing.assert_allclose(mi_f, mi_s, rtol=0.25)
    acc = float(np.mean(np.asarray(fused.stats["acceptance_rate"][192:])))
    assert 0.65 < acc <= 1.0, acc
    draws = np.asarray(fused.thetas[192:]).reshape(-1, DIM)
    assert np.abs(draws.mean(0)).max() < 0.25
    assert np.abs(draws.std(0) - 1.0).max() < 0.25


def test_fused_cc_rank_update_lowrank():
    """The RankUpdate metric with the rank-preserving lowrank estimator
    rides the FUSED cross-chain warmup (VERDICT r3 partial #1: the metric
    was excluded from every fused fast path; the batch-explicit loop closes
    over any shared metric, and block-boundary renew keeps rank static)."""
    from advancedhmc_tpu.models import correlated_gaussian

    dim, k = 8, 3
    target = correlated_gaussian(dim, rho=0.7)
    kernel = HMCKernel(Trajectory(
        Leapfrog(step_size=jnp.asarray(0.25, jnp.float64)),
        GeneralisedNoUTurn(max_depth=5), "multinomial",
    ))
    theta0 = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (64, dim),
                                     jnp.float64)
    res = sample(
        jax.random.PRNGKey(0), target, kernel,
        make_metric("rank_update", dim, dtype=jnp.float64), theta0,
        n_samples=448, n_adapts=320,
        adaptor=AdaptorConfig(kind="stan", mm_kind="lowrank", mm_rank=k),
        cross_chain=True, init_eps=0.25, fuse_warmup=True,
        fuse_warmup_block=8, fuse_draws=8, drop_warmup=True,
    )
    metric = res.final_state.metric
    assert metric.rank == k
    # the low-rank part was actually adapted (non-zero D) and the posterior
    # is correct
    assert float(np.abs(np.asarray(metric.d)).max()) > 0.1
    draws = np.asarray(res.thetas).reshape(-1, dim)
    assert np.abs(draws.mean(0)).max() < 0.35
    cov_emp = np.cov(draws.T)
    np.testing.assert_allclose(np.diag(cov_emp),
                               np.diag(np.asarray(target.cov)), rtol=0.35)


def test_fused_cc_warmup_chain_chunks_identical():
    """Warmup chain chunking (the ≥8192-chain VMEM mitigation): sub-batches
    run sequentially inside each block dispatch; the block replay sees the
    full theta record, so adaptation — and here the whole run — is
    identical to unchunked."""
    a = _run(True, fuse_warmup_block=8, fuse_pair=True, fuse_draws=8)
    b = _run(True, fuse_warmup_block=8, fuse_pair=True, fuse_draws=8,
             fuse_chain_chunks=4)
    np.testing.assert_array_equal(np.asarray(a.thetas), np.asarray(b.thetas))
    np.testing.assert_array_equal(
        np.asarray(a.final_state.metric.m_inv),
        np.asarray(b.final_state.metric.m_inv),
    )
    np.testing.assert_array_equal(
        np.asarray(a.final_state.adapt.da.eps),
        np.asarray(b.final_state.adapt.da.eps),
    )
