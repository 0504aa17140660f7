"""Riemannian/experimental tier tests ≅ /root/reference/test/riemannian.jl:31-63
and research/tests/relativistic_hmc.jl."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advancedhmc_tpu import LogDensityTarget, UnitEuclideanMetric, DiagEuclideanMetric
from advancedhmc_tpu.kinetic import RelativisticKinetic
from advancedhmc_tpu.models import banana
from advancedhmc_tpu.riemannian import (
    DenseRiemannianMetric,
    GeneralizedLeapfrog,
    IdentityMap,
    RiemannianHamiltonian,
    SoftAbsMap,
    generalized_leapfrog_step,
    rand_momentum_relativistic,
    softabs,
    transition_rmhmc,
)

D = 3


def _target():
    a = jnp.asarray([[2.0, 0.5, 0.0], [0.5, 1.5, 0.3], [0.0, 0.3, 1.0]])

    def logp(x):
        return -0.5 * x @ a @ x - 0.1 * jnp.sum(x**4)

    return LogDensityTarget(logp, D)


def test_softabs_properties():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (D, D), jnp.float64)
    x = 0.5 * (x + x.T)
    g, q, lam, soft = softabs(x, 20.0)
    # reconstruction, PSD, |λ| lower bound
    np.testing.assert_allclose(np.asarray(g), np.asarray((q * soft) @ q.T),
                               rtol=1e-10)
    evals = np.linalg.eigvalsh(np.asarray(g))
    assert (evals > 0).all()
    np.testing.assert_allclose(np.sort(np.asarray(soft)), evals, rtol=1e-8)
    assert (np.asarray(soft) >= np.abs(np.asarray(lam)) - 1e-10).all()
    # PD input, large α → identity map
    pd = x @ x.T + jnp.eye(D)
    g2, *_ = softabs(pd, 1e6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(pd), rtol=1e-6)


def _hamiltonian(map_cfg):
    target = _target()
    metric = DenseRiemannianMetric.from_hessian(target, map_cfg)
    return RiemannianHamiltonian(metric=metric, target=target)


def test_kinetic_matches_mvnormal_logpdf():
    """-K(θ, r) == log N(r; 0, G(θ)) (≅ reference test: kinetic energy ≈
    logpdf(MvNormal(0, G(x))), test/riemannian.jl:44-50)."""
    from scipy.stats import multivariate_normal

    h = _hamiltonian(SoftAbsMap(20.0))
    key = jax.random.PRNGKey(1)
    theta = jax.random.normal(key, (D,), jnp.float64)
    r = jax.random.normal(jax.random.PRNGKey(2), (D,), jnp.float64)
    from advancedhmc_tpu.riemannian.metric import apply_map

    g = np.asarray(apply_map(h.metric.map, h.metric.g_fn(theta)))
    expected = multivariate_normal(np.zeros(D), g).logpdf(np.asarray(r))
    np.testing.assert_allclose(float(h.neg_kinetic_energy(theta, r)), expected,
                               rtol=1e-8)


@pytest.mark.parametrize("map_cfg", [IdentityMap(), SoftAbsMap(20.0)])
def test_dH_finite_differences(map_cfg):
    """∂H∂θ and ∂H∂r vs finite differences (≅ test/riemannian.jl:52-63)."""
    if isinstance(map_cfg, IdentityMap):
        # Identity map needs a PD Hessian — use a convex target region
        target = LogDensityTarget(
            lambda x: -0.5 * jnp.sum(x**2) - 0.05 * jnp.sum(x**4), D
        )
        metric = DenseRiemannianMetric.from_hessian(target, map_cfg)
        h = RiemannianHamiltonian(metric=metric, target=target)
    else:
        h = _hamiltonian(map_cfg)

    theta = jnp.asarray([0.3, -0.5, 0.8], jnp.float64)
    r = jnp.asarray([0.7, 0.2, -0.4], jnp.float64)

    def ham(th, rr):
        lp = h.target.logdensity(th)
        return -(lp + h.neg_kinetic_energy(th, rr))

    fd_theta = np.zeros(D)
    fd_r = np.zeros(D)
    eps = 1e-6
    for i in range(D):
        e = jnp.zeros(D, jnp.float64).at[i].set(eps)
        fd_theta[i] = (float(ham(theta + e, r)) - float(ham(theta - e, r))) / (2 * eps)
        fd_r[i] = (float(ham(theta, r + e)) - float(ham(theta, r - e))) / (2 * eps)

    _, grad_h = h.dH_dtheta(theta, r)
    np.testing.assert_allclose(np.asarray(grad_h), fd_theta, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h.velocity(theta, r)), fd_r,
                               rtol=2e-4, atol=1e-6)


def test_generalized_leapfrog_reversibility_and_energy():
    h = _hamiltonian(SoftAbsMap(20.0))
    integ = GeneralizedLeapfrog(step_size=jnp.asarray(0.05, jnp.float64), n_fp=10)
    z = h.init_phasepoint(jax.random.PRNGKey(3),
                          jnp.asarray([0.2, -0.1, 0.4], jnp.float64))
    e0 = float(z.energy())
    zf = z
    for _ in range(10):
        zf = generalized_leapfrog_step(integ, h, zf, float(integ.step_size))
    assert abs(float(zf.energy()) - e0) < 0.05
    zb = zf
    for _ in range(10):
        zb = generalized_leapfrog_step(integ, h, zb, -float(integ.step_size))
    np.testing.assert_allclose(np.asarray(zb.theta), np.asarray(z.theta), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zb.r), np.asarray(z.r), atol=1e-5)


def test_rmhmc_banana_smoke():
    """Riemannian-SoftAbs + generalized leapfrog on the banana posterior
    (BASELINE.md config 5)."""
    target = banana()
    metric = DenseRiemannianMetric.from_hessian(target, SoftAbsMap(1.0))
    h = RiemannianHamiltonian(metric=metric, target=target)
    integ = GeneralizedLeapfrog(step_size=jnp.asarray(0.1, jnp.float64), n_fp=6)

    key = jax.random.PRNGKey(4)
    z = h.init_phasepoint(key, jnp.zeros(2, jnp.float64))
    n_accept = 0
    draws = []
    for i in range(60):
        key, k_mom, k_tr = jax.random.split(key, 3)
        z = z.replace(r=h.rand_momentum(k_mom, z.theta))
        z = h.phasepoint(z.theta, z.r)
        z, stats = transition_rmhmc(k_tr, h, integ, 8, z)
        n_accept += int(stats["is_accept"])
        draws.append(np.asarray(z.theta))
    draws = np.stack(draws)
    assert np.isfinite(draws).all()
    assert n_accept > 20  # healthy acceptance


def test_relativistic_momentum_distribution():
    """Magnitude density ∝ u^{D-1} exp(-mc²√(u²/(m²c²)+1)): check sample
    moments against numeric quadrature of the pdf."""
    kin = RelativisticKinetic(m=1.0, c=2.0)
    metric = UnitEuclideanMetric(size=4, _dtype=jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(5), 20000)
    rs = jax.vmap(lambda k: rand_momentum_relativistic(kin, metric, k))(keys)
    u = np.linalg.norm(np.asarray(rs), axis=1)

    grid = np.linspace(1e-6, 60, 20000)
    logp = 3 * np.log(grid) - 1.0 * 4.0 * np.sqrt(grid**2 / 4.0 + 1)
    p = np.exp(logp - logp.max())
    p /= np.trapezoid(p, grid)
    mean_expected = np.trapezoid(grid * p, grid)
    var_expected = np.trapezoid(grid**2 * p, grid) - mean_expected**2
    assert abs(u.mean() - mean_expected) < 0.05 * mean_expected
    assert abs(u.var() - var_expected) < 0.15 * var_expected

    # diag metric scaling: rᵀM⁻¹r == |w|²
    dmetric = DiagEuclideanMetric.create(jnp.asarray([0.5, 2.0, 1.0, 4.0]))
    r2 = jax.vmap(lambda k: rand_momentum_relativistic(kin, dmetric, k))(keys[:2000])
    q = np.einsum("nd,d,nd->n", np.asarray(r2), np.asarray(dmetric.m_inv),
                  np.asarray(r2))
    u2 = np.sqrt(q)
    assert abs(u2.mean() - mean_expected) < 0.1 * mean_expected


def test_sample_rmhmc_banana():
    """One-call RMHMC loop on the banana posterior with step-size DA."""
    from advancedhmc_tpu.riemannian import sample_rmhmc

    target = banana()
    thetas, stats, _ = sample_rmhmc(
        jax.random.PRNGKey(10), target, jnp.zeros(2, jnp.float64),
        n_samples=150, n_leapfrog=6, step_size=0.2, n_fp=5,
        map_cfg=SoftAbsMap(1.0), n_adapts=50, n_chains=4,
    )
    assert thetas.shape == (150, 4, 2)
    draws = np.asarray(thetas[50:]).reshape(-1, 2)
    assert np.isfinite(draws).all()
    acc = float(np.asarray(stats["acceptance_rate"][50:]).mean())
    assert acc > 0.5


# ---------------------------------------------------------------------------
# Riemannian NUTS (beyond the reference: its RMHMC is static-only)
# ---------------------------------------------------------------------------

def test_riemannian_nuts_equals_euclidean_on_constant_identity_metric():
    """With G(θ) ≡ I the generalized leapfrog reduces to plain leapfrog and
    the Riemannian NUTS transition must reproduce the Euclidean one leaf for
    leaf (energies differ by the constant ½D·log2π, which cancels in every
    decision the tree makes)."""
    from advancedhmc_tpu import (
        GeneralisedNoUTurn,
        Hamiltonian,
        Leapfrog,
        Trajectory,
        nuts_transition,
    )

    target = _target()
    key = jax.random.PRNGKey(3)
    k_th, k_r, k_tr = jax.random.split(key, 3)
    theta = jax.random.normal(k_th, (D,), jnp.float64)
    r = jax.random.normal(k_r, (D,), jnp.float64)
    eps = jnp.asarray(0.25, jnp.float64)
    crit = GeneralisedNoUTurn(max_depth=5)

    h_e = Hamiltonian(metric=UnitEuclideanMetric(size=D, _dtype=jnp.float64),
                      target=target)
    z_e = h_e.phasepoint(theta, r)

    metric_r = DenseRiemannianMetric(
        size=D,
        g_fn=lambda th: jnp.eye(D, dtype=jnp.float64),
        dg_fn=lambda th: jnp.zeros((D, D, D), jnp.float64),
        map=IdentityMap(),
    )
    h_r = RiemannianHamiltonian(metric=metric_r, target=target)
    z_r = h_r.phasepoint(theta, r)

    for dirs in ([1, 1, -1, 1, -1], [-1, -1, 1, -1, 1], [1, -1, -1, 1, 1]):
        for ts in ("multinomial", "slice"):
            fd = jnp.asarray(dirs, jnp.int32)
            ze, se = nuts_transition(
                k_tr, h_e, Trajectory(Leapfrog(step_size=eps), crit, ts),
                z_e, force_directions=fd,
            )
            zr, sr = nuts_transition(
                k_tr, h_r,
                Trajectory(GeneralizedLeapfrog(step_size=eps, n_fp=4), crit, ts),
                z_r, force_directions=fd,
            )
            np.testing.assert_allclose(np.asarray(zr.theta),
                                       np.asarray(ze.theta), rtol=1e-9)
            assert int(sr["n_steps"]) == int(se["n_steps"])
            assert int(sr["tree_depth"]) == int(se["tree_depth"])
            np.testing.assert_allclose(
                float(sr["acceptance_rate"]), float(se["acceptance_rate"]),
                rtol=1e-9,
            )


@pytest.mark.parametrize("map_cfg", [IdentityMap(), SoftAbsMap(20.0)])
def test_riemannian_nuts_posterior_mean(map_cfg):
    """Riemannian NUTS recovers the posterior mean of a 2-D correlated
    Gaussian (statistical-correctness gate in the test/sampler.jl style)."""
    from advancedhmc_tpu import GeneralisedNoUTurn
    from advancedhmc_tpu.riemannian import sample_rmhmc

    a = jnp.asarray([[1.5, 0.4], [0.4, 0.8]])
    mean = jnp.asarray([0.6, -0.3])

    def logp(x):
        d = x - mean
        return -0.5 * d @ a @ d

    target = LogDensityTarget(logp, 2)
    if isinstance(map_cfg, IdentityMap):
        # Hessian is PD constant → identity map is valid as-is
        metric = DenseRiemannianMetric(
            size=2,
            g_fn=lambda th: a,
            dg_fn=lambda th: jnp.zeros((2, 2, 2), a.dtype),
            map=map_cfg,
        )
    else:
        metric = DenseRiemannianMetric.from_hessian(target, map_cfg)

    thetas, stats, _ = sample_rmhmc(
        jax.random.PRNGKey(0), target,
        jnp.zeros((8, 2), jnp.float64),
        n_samples=250, n_adapts=100, step_size=0.3,
        metric=metric, criterion=GeneralisedNoUTurn(max_depth=5),
    )
    post = np.asarray(thetas[100:]).reshape(-1, 2)
    np.testing.assert_allclose(post.mean(0), np.asarray(mean), atol=0.12)
    assert float(np.mean(np.asarray(stats["acceptance_rate"][100:]))) > 0.6
    assert int(np.max(np.asarray(stats["tree_depth"]))) >= 1
