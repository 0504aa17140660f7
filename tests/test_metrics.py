"""Metric layer tests ≅ /root/reference/test/metric.jl and hamiltonian.jl:55-80."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advancedhmc_tpu import (
    DenseEuclideanMetric,
    DiagEuclideanMetric,
    RankUpdateEuclideanMetric,
    UnitEuclideanMetric,
)

D = 5


def _sample_momenta(metric, n, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return jax.vmap(metric.rand_momentum)(keys)


def _mass_matrix(metric):
    return np.linalg.inv(np.asarray(metric.m_inv_matrix()))


@pytest.mark.parametrize(
    "make",
    [
        lambda: UnitEuclideanMetric(size=D, _dtype=jnp.float64),
        lambda: DiagEuclideanMetric.create(jnp.linspace(0.5, 2.0, D)),
        lambda: DenseEuclideanMetric.create(
            jnp.eye(D) * 1.5 + 0.3 * jnp.ones((D, D))
        ),
    ],
)
def test_momentum_covariance_matches_mass_matrix(make):
    """r ~ N(0, M): empirical cov over 200k draws ≈ M
    (≅ /root/reference/test/metric.jl:40-75)."""
    metric = make()
    rs = np.asarray(_sample_momenta(metric, 200_000))
    emp = np.cov(rs.T)
    np.testing.assert_allclose(emp, _mass_matrix(metric), atol=0.05, rtol=0.1)


def test_rank_update_equivalent_dense():
    """RankUpdate(A,B,D) ≡ dense metric with M⁻¹ = A + BDBᵀ
    (≅ /root/reference/test/metric.jl rank-update block)."""
    key = jax.random.PRNGKey(1)
    ka, kb, kd, kr = jax.random.split(key, 4)
    a = jnp.exp(jax.random.normal(ka, (D,)))
    b = jax.random.normal(kb, (D, 2))
    dm = jnp.eye(2) * 2.0
    ru = RankUpdateEuclideanMetric.create(a, b, dm)
    dense = DenseEuclideanMetric.create(ru.m_inv_matrix())

    r = jax.random.normal(kr, (D,))
    np.testing.assert_allclose(
        float(ru.neg_kinetic_energy(r)), float(dense.neg_kinetic_energy(r)), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(ru.velocity(r)), np.asarray(dense.velocity(r)), rtol=1e-10
    )

    rs = np.asarray(_sample_momenta(ru, 200_000, seed=3))
    emp = np.cov(rs.T)
    np.testing.assert_allclose(emp, _mass_matrix(ru), atol=0.08, rtol=0.15)


def test_kinetic_energy_hand_formulas():
    """Energies vs hand formulas (≅ /root/reference/test/hamiltonian.jl:55-80)."""
    r = jnp.asarray([1.0, -2.0, 0.5, 3.0, -1.0])
    unit = UnitEuclideanMetric(size=D, _dtype=jnp.float64)
    np.testing.assert_allclose(
        float(unit.neg_kinetic_energy(r)), -0.5 * float(jnp.sum(r**2))
    )
    minv = jnp.linspace(0.5, 2.0, D)
    diag = DiagEuclideanMetric.create(minv)
    np.testing.assert_allclose(
        float(diag.neg_kinetic_energy(r)), -0.5 * float(jnp.sum(r**2 * minv))
    )
    np.testing.assert_allclose(np.asarray(diag.velocity(r)), np.asarray(minv * r))
    m = jnp.eye(D) + 0.25
    dense = DenseEuclideanMetric.create(m)
    np.testing.assert_allclose(
        float(dense.neg_kinetic_energy(r)), -0.5 * float(r @ m @ r), rtol=1e-10
    )


def test_renew_preserves_type():
    """Metric type preserved during adaptation (ref constructors.jl:58)."""
    diag = DiagEuclideanMetric.identity(D)
    assert isinstance(diag.renew(jnp.full((D,), 2.0)), DiagEuclideanMetric)
    dense = DenseEuclideanMetric.identity(D)
    assert isinstance(dense.renew(jnp.eye(D) * 3), DenseEuclideanMetric)
    unit = UnitEuclideanMetric(size=D)
    assert unit.renew(None) is unit
