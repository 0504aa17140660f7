"""Model-zoo posterior tests ≅ /root/reference/test/models.jl and
abstractmcmc.jl posterior-mean checks."""

import numpy as np

import jax
import jax.numpy as jnp

from advancedhmc_tpu import NUTS, find_good_stepsize, Hamiltonian, make_metric
from advancedhmc_tpu.models import (
    GDEMO_MEAN,
    banana,
    correlated_gaussian,
    gdemo,
    german_credit_logistic,
    neal_funnel,
)
from advancedhmc_tpu.models.gdemo import constrain

RNDATOL = 0.5


def test_gdemo_posterior_mean():
    """gdemo posterior mean ≈ [49/24, 7/6]
    (≅ /root/reference/test/models.jl:26-27)."""
    target = gdemo()
    res = NUTS(0.8).sample(
        jax.random.PRNGKey(0), target, jnp.zeros(2, jnp.float64),
        3000, n_adapts=1000, n_chains=4, dtype=jnp.float64,
    )
    draws = np.asarray(res.thetas[1000:]).reshape(-1, 2)
    cons = np.stack([np.exp(draws[:, 0]), draws[:, 1]], axis=-1)
    s_mean, m_mean = cons.mean(axis=0)
    assert abs(s_mean - GDEMO_MEAN[0]) < RNDATOL
    assert abs(m_mean - GDEMO_MEAN[1]) < RNDATOL


def test_funnel_v_moments():
    """Neal's funnel: marginal v ~ N(0, 9)."""
    target = neal_funnel(10)
    res = NUTS(0.9, max_depth=10).sample(
        jax.random.PRNGKey(1), target, jnp.zeros(10, jnp.float64),
        4000, n_adapts=1500, n_chains=8, dtype=jnp.float64,
    )
    v = np.asarray(res.thetas[1500:, :, 0]).ravel()
    # The funnel mixes slowly in v; tolerance reflects finite-run MC error.
    assert abs(v.mean()) < 0.8
    assert abs(v.std() - 3.0) < 0.9


def test_correlated_gaussian_dense_metric():
    """Correlated Gaussian with dense metric adaptation (BASELINE config 2)."""
    target = correlated_gaussian(6, rho=0.8)
    res = NUTS(0.8, metric="dense").sample(
        jax.random.PRNGKey(2), target, jnp.zeros(6, jnp.float64),
        2500, n_adapts=1000, n_chains=4, dtype=jnp.float64,
    )
    draws = np.asarray(res.thetas[1000:]).reshape(-1, 6)
    assert np.linalg.norm(draws.mean(axis=0)) < RNDATOL
    emp_cov = np.cov(draws.T)
    np.testing.assert_allclose(emp_cov, np.asarray(target.cov), atol=0.4)
    # adapted dense M⁻¹ ≈ covariance (rtol 0.25 analog of reference)
    m_inv = np.asarray(res.final_state.metric.m_inv).mean(axis=0)
    np.testing.assert_allclose(np.diag(m_inv), np.diag(np.asarray(target.cov)),
                               rtol=0.4)


def test_banana_runs():
    target = banana()
    res = NUTS(0.8).sample(
        jax.random.PRNGKey(3), target, jnp.zeros(2, jnp.float64),
        2000, n_adapts=500, n_chains=4, dtype=jnp.float64,
    )
    draws = np.asarray(res.thetas[500:]).reshape(-1, 2)
    # θ1 marginal ~ N(0, 100)
    assert abs(draws[:, 0].mean()) < 3.0
    assert np.isfinite(draws).all()


def test_logistic_sampling_finite():
    target = german_credit_logistic(dtype=jnp.float64)
    res = NUTS(0.8, max_depth=8).sample(
        jax.random.PRNGKey(4), target, jnp.zeros(target.dim, jnp.float64),
        400, n_adapts=200, n_chains=4, dtype=jnp.float64,
    )
    draws = np.asarray(res.thetas[200:])
    assert np.isfinite(draws).all()
    assert float(np.asarray(res.stats["acceptance_rate"][200:]).mean()) > 0.5


def test_find_good_stepsize_reasonable():
    """Search lands in a region with one-step accept ratio in (0.25, 1)
    (≅ reference find_good_stepsize semantics, trajectory.jl:768-837)."""
    from advancedhmc_tpu.models import std_gaussian

    target = std_gaussian(10)
    h = Hamiltonian(metric=make_metric("diagonal", 10, dtype=jnp.float64),
                    target=target)
    eps = float(find_good_stepsize(jax.random.PRNGKey(5), h,
                                   jnp.zeros(10, jnp.float64)))
    assert 0.1 < eps < 3.0


def test_correlated_gaussian_static_hmc_dense():
    """BASELINE config 2 exactly: static HMC with jittered and tempered
    leapfrog on a correlated Gaussian, dense Euclidean metric."""
    from advancedhmc_tpu import (
        AdaptorConfig, FixedNSteps, HMCKernel, JitteredLeapfrog,
        TemperedLeapfrog, Trajectory, sample,
    )

    target = correlated_gaussian(4, rho=0.7)
    for integ in (
        JitteredLeapfrog.create(jnp.asarray(0.2, jnp.float64), 0.3),
        TemperedLeapfrog(step_size=jnp.asarray(0.2, jnp.float64), alpha=1.05),
    ):
        kernel = HMCKernel(Trajectory(integ, FixedNSteps(12), "endpoint"))
        res = sample(
            jax.random.PRNGKey(6), target, kernel,
            make_metric("dense", 4, dtype=jnp.float64),
            jnp.zeros(4, jnp.float64), 2500, n_adapts=1000,
            adaptor=AdaptorConfig(kind="stan", mm_kind="welford_cov"),
            init_eps=0.2, n_chains=4,
        )
        draws = np.asarray(res.thetas[1000:]).reshape(-1, 4)
        assert np.linalg.norm(draws.mean(axis=0)) < RNDATOL
        emp_cov = np.cov(draws.T)
        np.testing.assert_allclose(emp_cov, np.asarray(target.cov), atol=0.45)


def test_eight_schools():
    from advancedhmc_tpu.models import eight_schools

    target = eight_schools()
    res = NUTS(0.9).sample(
        jax.random.PRNGKey(8), target, jnp.zeros(10, jnp.float64),
        2000, n_adapts=1000, n_chains=4, dtype=jnp.float64, fuse_draws=25,
    )
    draws = np.asarray(res.thetas[1000:]).reshape(-1, 10)
    mu = draws[:, 0]
    # posterior mean of mu ≈ 4.4 (well-known); generous MC tolerance
    assert abs(mu.mean() - 4.4) < 1.5
    d = res.to_inference_dict()
    assert d["posterior"]["theta"].shape == (4, 2000, 10)
    assert "diverging" in d["sample_stats"]


def test_gaussian_mixture_moments():
    """Two-mode mixture: symmetric, E[x]=0, Var(x₀)=sep²/4+σ² (research zoo
    parity: TwoDimGaussianMixtures, riemannian_hmc_utility.jl:68)."""
    from advancedhmc_tpu.models import two_gaussian_mixtures_2d

    target = two_gaussian_mixtures_2d(sep=3.0, sigma=0.5)
    res = NUTS(0.8).sample(
        jax.random.PRNGKey(9), target, jnp.zeros(2, jnp.float64),
        3000, n_adapts=1000, n_chains=16, dtype=jnp.float64,
    )
    draws = np.asarray(res.thetas[1000:]).reshape(-1, 2)
    assert np.isfinite(draws).all()
    # with 16 chains initialised at the origin both modes are visited
    assert abs(draws[:, 0].mean()) < 0.5
    assert abs(draws[:, 0].var() - (1.5**2 + 0.25)) < 0.6
    assert abs(draws[:, 1].var() - 0.25) < 0.15


def test_spiral_runs():
    """Spiral target (research zoo parity, riemannian_hmc_utility.jl:66):
    draws stay on the arm — the radius tracks a·φ within a few σ."""
    from advancedhmc_tpu.models import spiral

    target = spiral(a=0.5, sigma=0.1)
    theta0 = jnp.tile(jnp.asarray([0.5, 0.0], jnp.float64), (8, 1))
    res = NUTS(0.9).sample(
        jax.random.PRNGKey(10), target, theta0,
        1500, n_adapts=500, n_chains=8, dtype=jnp.float64,
    )
    draws = np.asarray(res.thetas[500:]).reshape(-1, 2)
    assert np.isfinite(draws).all()
    r = np.hypot(draws[:, 0], draws[:, 1])
    phi = np.arctan2(draws[:, 1], draws[:, 0]) % (2 * np.pi)
    arm_dist = np.abs(r[:, None] - 0.5 * (phi[:, None] + 2 * np.pi * np.arange(8)))
    assert np.quantile(arm_dist.min(axis=1), 0.9) < 0.35


def test_hierarchical_logistic_analytic_grad():
    """Analytic logdensity_and_grad matches AD (and the bf16-residual
    variant is a small bounded perturbation of the exact gradient)."""
    import jax

    from advancedhmc_tpu.models import hierarchical_logistic

    t = hierarchical_logistic(n=200, p=9, dtype=jnp.float64)
    th = jax.random.normal(jax.random.PRNGKey(0), (10,), jnp.float64) * 0.5
    lp_a, g_a = t.logdensity_and_grad(th)
    lp_b, g_b = jax.value_and_grad(t.logdensity)(th)
    np.testing.assert_allclose(float(lp_a), float(lp_b), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), rtol=1e-10)

    tb = hierarchical_logistic(n=200, p=9, dtype=jnp.float64,
                               resid_dtype="bfloat16")
    lp_c, g_c = tb.logdensity_and_grad(th)
    np.testing.assert_allclose(float(lp_c), float(lp_a), rtol=1e-12)
    rel = np.max(np.abs(np.asarray(g_c) - np.asarray(g_a))
                 / (1.0 + np.abs(np.asarray(g_a))))
    assert rel < 0.05, rel


def test_hierarchical_logistic_nc_matches_centered():
    # analytic grad == autodiff, and the non-centered density equals the
    # centered one under the change of variables beta = sigma * beta_t
    # (Jacobian sigma^p): lp_nc(ls, beta/s) - p*ls == lp_c(ls, beta).
    import numpy as np

    from advancedhmc_tpu.models import (
        hierarchical_logistic,
        hierarchical_logistic_nc,
    )

    p = 9
    tc = hierarchical_logistic(n=60, p=p, dtype=jnp.float64)
    tn = hierarchical_logistic_nc(n=60, p=p, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    th = jnp.asarray(rng.normal(size=p + 1) * 0.4)
    lp_a, g_a = tn.logdensity_and_grad(th)
    np.testing.assert_allclose(float(lp_a), float(tn.logdensity(th)),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_a),
                               np.asarray(jax.grad(tn.logdensity)(th)),
                               rtol=1e-8)
    for _ in range(3):
        ls = float(rng.normal() * 0.5)
        beta = rng.normal(size=p) * 0.4
        th_c = jnp.asarray(np.concatenate([[ls], beta]))
        th_n = jnp.asarray(np.concatenate([[ls], beta / np.exp(ls)]))
        d = float(tn.logdensity(th_n)) - p * ls - float(tc.logdensity(th_c))
        assert abs(d) < 1e-9, d


# --- declarative distribution library (models/dists.py) -------------------
# ≅ the reference's generic Distributions→target fixture and conjugate model
# (/root/reference/test/common.jl:18-31,91-110)

def test_dists_logpdfs_match_scipy():
    """Each distribution primitive matches scipy.stats at scattered points."""
    import scipy.stats as st

    from advancedhmc_tpu.models import dists as d

    y = jnp.asarray([0.3, 1.2, 2.7], jnp.float64)
    k = jnp.asarray([0.0, 1.0, 1.0], jnp.float64)
    cases = [
        (d.Normal(0.5, 2.0), y, st.norm(0.5, 2.0).logpdf),
        (d.LogNormal(0.1, 0.7), y, st.lognorm(0.7, scale=np.exp(0.1)).logpdf),
        (d.StudentT(4.0, 0.2, 1.5), y, st.t(4.0, 0.2, 1.5).logpdf),
        (d.Cauchy(0.1, 0.9), y, st.cauchy(0.1, 0.9).logpdf),
        (d.Laplace(0.4, 1.1), y, st.laplace(0.4, 1.1).logpdf),
        (d.Exponential(1.7), y, st.expon(scale=1 / 1.7).logpdf),
        (d.Gamma(2.5, 1.3), y, st.gamma(2.5, scale=1 / 1.3).logpdf),
        (d.InverseGamma(2.0, 3.0), y, st.invgamma(2.0, scale=3.0).logpdf),
        (d.Beta(2.0, 3.5), y / 3.0, st.beta(2.0, 3.5).logpdf),
        (d.Uniform(-1.0, 4.0), y, st.uniform(-1.0, 5.0).logpdf),
        (d.Poisson(2.2), k, st.poisson(2.2).logpmf),
    ]
    for dist, pts, ref in cases:
        got = float(dist.logpdf(pts))
        want = float(np.sum(ref(np.asarray(pts))))
        np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=repr(dist))
    # BernoulliLogit: k·lg − log(1+e^lg) against scipy bernoulli
    lg = np.asarray([-0.7, 0.0, 1.3])
    got = float(d.BernoulliLogit(jnp.asarray(lg)).logpdf(k))
    p = 1 / (1 + np.exp(-lg))
    want = float(np.sum(st.bernoulli(p).logpmf(np.asarray(k, int))))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # Dirichlet over a simplex point
    simplex_y = jnp.asarray([0.2, 0.3, 0.5], jnp.float64)
    got = float(d.Dirichlet((1.5, 2.0, 3.0)).logpdf(simplex_y))
    want = float(st.dirichlet([1.5, 2.0, 3.0]).logpdf(np.asarray(simplex_y)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_dists_support_guard():
    """Bounded logpdfs return −inf off-support (ADVICE r4): with an
    overridden transform (e.g. Identity on Uniform) the target is then a
    proper truncated density rejected by the −Inf clamp, not a silent
    improper constant. In-support values are unchanged (pinned against
    scipy above)."""
    from advancedhmc_tpu.models import dists as d

    off = [
        (d.Uniform(0.0, 1.0), 1.5),
        (d.Uniform(0.0, 1.0), -0.2),
        (d.Gamma(2.5, 1.3), -1.0),
        (d.InverseGamma(2.0, 3.0), 0.0),
        (d.Beta(2.0, 3.5), 1.2),
        (d.Exponential(1.7), -0.5),
        (d.LogNormal(0.1, 0.7), -1.0),
        (d.Dirichlet((1.5, 2.0, 3.0)), jnp.asarray([0.5, 0.7, -0.2])),
    ]
    for dist, pt in off:
        lp = float(dist.logpdf(jnp.asarray(pt, jnp.float64)))
        assert lp == -np.inf, (repr(dist), pt, lp)
    # a block with one off-support element is −inf overall
    lp = float(d.Uniform(0.0, 1.0).logpdf(
        jnp.asarray([0.5, 2.0], jnp.float64)))
    assert lp == -np.inf
    # boundary semantics: Exponential includes 0, Uniform includes ends
    assert np.isfinite(float(d.Exponential(1.0).logpdf(jnp.asarray(0.0))))
    assert np.isfinite(float(d.Uniform(0.0, 1.0).logpdf(
        jnp.asarray([0.0, 1.0], jnp.float64))))


def test_target_of_gamma_moments():
    """target_of(Gamma) samples the right distribution through the default
    Positive transform (≅ LogDensityDistribution, common.jl:18-31)."""
    from advancedhmc_tpu.models.dists import Gamma, target_of

    target = target_of(Gamma(3.0, 2.0), size=4)
    res = NUTS(0.8).sample(
        jax.random.PRNGKey(11), target, jnp.zeros(4, jnp.float64),
        3000, n_adapts=1000, n_chains=4, dtype=jnp.float64,
    )
    cons = np.exp(np.asarray(res.thetas[1000:])).reshape(-1, 4)
    # Gamma(3, rate 2): mean 1.5, var 0.75
    assert abs(cons.mean() - 1.5) < 0.15
    assert abs(cons.var() - 0.75) < 0.25


def test_gdemo_declarative_posterior_mean():
    """The declaratively-composed gdemo reproduces the analytic posterior
    mean (49/24, 7/6) — the conjugate-model fixture rebuilt from
    distribution primitives (≅ common.jl:91-110)."""
    from advancedhmc_tpu.models import gdemo_declarative

    target = gdemo_declarative()
    res = NUTS(0.8).sample(
        jax.random.PRNGKey(12), target, jnp.zeros(2, jnp.float64),
        3000, n_adapts=1000, n_chains=4, dtype=jnp.float64,
    )
    # constrained export path: names + invlink through the carried transforms
    post = res.to_inference_dict(constrained=True)["posterior"]
    s_draws = post["s"][:, 1000:]
    m_draws = post["m"][:, 1000:]
    assert abs(float(np.mean(s_draws)) - GDEMO_MEAN[0]) < RNDATOL
    assert abs(float(np.mean(m_draws)) - GDEMO_MEAN[1]) < RNDATOL
