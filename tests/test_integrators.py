"""Integrator tests ≅ /root/reference/test/integrator.jl."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advancedhmc_tpu import (
    DiagEuclideanMetric,
    Hamiltonian,
    JitteredLeapfrog,
    Leapfrog,
    LogDensityTarget,
    TemperedLeapfrog,
    UnitEuclideanMetric,
    leapfrog_step,
    leapfrog_steps,
    leapfrog_trajectory,
)


def _h1d():
    target = LogDensityTarget(lambda x: -0.5 * jnp.sum(x**2), 1)
    return Hamiltonian(metric=UnitEuclideanMetric(size=1, _dtype=jnp.float64),
                       target=target)


def test_leapfrog_phase_circle():
    """1-D Gaussian: leapfrog tracks the analytic rotation with stable H
    (Neal Eq 2.11; ≅ /root/reference/test/integrator.jl:115-155)."""
    h = _h1d()
    eps = 0.1
    z = h.phasepoint(jnp.asarray([1.0]), jnp.asarray([0.0]))
    integ = Leapfrog(step_size=jnp.asarray(eps, jnp.float64))
    e0 = float(z.energy())
    for i in range(200):
        z = leapfrog_step(integ, h, z, eps)
        t = (i + 1) * eps
        # Analytic solution of the exact dynamics: θ(t)=cos t, r(t)=-sin t.
        assert abs(float(z.theta[0]) - np.cos(t)) < 0.05
        assert abs(float(z.r[0]) + np.sin(t)) < 0.05
        assert abs(float(z.energy()) - e0) < 3e-3  # O(ϵ²) energy oscillation


def test_leapfrog_reversibility():
    h = _h1d()
    integ = Leapfrog(step_size=jnp.asarray(0.2, jnp.float64))
    z = h.phasepoint(jnp.asarray([0.7]), jnp.asarray([0.3]))
    z_fwd = leapfrog_steps(integ, h, z, 25, fwd=True)
    z_back = leapfrog_steps(integ, h, z_fwd, 25, fwd=False)
    np.testing.assert_allclose(np.asarray(z_back.theta), np.asarray(z.theta), atol=1e-10)
    np.testing.assert_allclose(np.asarray(z_back.r), np.asarray(z.r), atol=1e-10)


def test_tempering_schedule_exact():
    """Tempering multiplier schedule (≅ /root/reference/test/integrator.jl:86-103):
    half-temper counter i_temper = 2(i-1)+1+!is_half (1-indexed); scale up
    sqrt(α) while i_temper ≤ n_steps else down 1/sqrt(α)
    (ref integrator.jl:198-209)."""
    alpha = 1.21
    integ = TemperedLeapfrog(step_size=jnp.asarray(0.1), alpha=alpha)
    sq = np.sqrt(alpha)
    n_steps = 3
    expect = []
    for i in range(n_steps):  # 0-indexed
        for is_half in (True, False):
            i_temper = 2 * i + 1 + (0 if is_half else 1)
            expect.append(sq if i_temper <= n_steps else 1 / sq)
    got = []
    for i in range(n_steps):
        got.append(float(integ.temper_scale(i, True, n_steps)))
        got.append(float(integ.temper_scale(i, False, n_steps)))
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_jitter_bounds():
    """ϵ ∈ [ϵ0(1-j), ϵ0(1+j)] (ref integrator.jl:140-156)."""
    integ = JitteredLeapfrog.create(jnp.asarray(0.5, jnp.float64), 0.2)
    eps = []
    for s in range(200):
        j = integ.jitter(jax.random.PRNGKey(s))
        eps.append(float(j.current_step_size))
        assert float(j.nom_step_size) == 0.5
    eps = np.asarray(eps)
    assert eps.min() >= 0.5 * 0.8 - 1e-9 and eps.max() <= 0.5 * 1.2 + 1e-9
    assert eps.std() > 0.01


def test_nonfinite_abort():
    """Trajectory stops after first non-finite point, which is kept with -Inf
    log density (ref integrator.jl:249-258, hamiltonian.jl:93-106)."""
    target = LogDensityTarget(
        lambda x: jnp.where(jnp.abs(x[0]) > 2.0, jnp.nan, -0.5 * x[0] ** 2), 1
    )
    h = Hamiltonian(metric=UnitEuclideanMetric(size=1, _dtype=jnp.float64),
                    target=target)
    integ = Leapfrog(step_size=jnp.asarray(1.0, jnp.float64))
    z = h.phasepoint(jnp.asarray([1.5]), jnp.asarray([2.0]))
    zs, taken = leapfrog_trajectory(integ, h, z, 10)
    taken = np.asarray(taken)
    # At least one step beyond the wall is untaken
    assert not taken.all()
    first_bad = int(np.argmin(taken)) - 1  # last taken index
    z_final = leapfrog_steps(integ, h, z, 10)
    assert float(z_final.logdensity) == -np.inf


def test_yoshida4_higher_order():
    """ComposedLeapfrog.yoshida4: energy error scales ~ O(ϵ⁴) vs leapfrog's
    O(ϵ²) (the OrdinaryDiffEq symplectic-extension analog)."""
    from advancedhmc_tpu import ComposedLeapfrog

    h = _h1d()
    z0 = h.phasepoint(jnp.asarray([1.0]), jnp.asarray([0.0]))
    e0 = float(z0.energy())

    def max_energy_err(integ, eps, n):
        z = z0
        err = 0.0
        for _ in range(n):
            z = integ.step(h, z, eps)
            err = max(err, abs(float(z.energy()) - e0))
        return err

    eps = 0.25
    err_lf = max_energy_err(Leapfrog(step_size=jnp.asarray(eps, jnp.float64)),
                            eps, 40)
    err_y4 = max_energy_err(ComposedLeapfrog.yoshida4(jnp.asarray(eps, jnp.float64)),
                            eps, 40)
    assert err_y4 < err_lf / 20  # 4th order ≫ 2nd order at this ϵ

    # reversibility of the palindromic composition
    integ = ComposedLeapfrog.yoshida4(jnp.asarray(0.3, jnp.float64))
    z = z0
    for _ in range(10):
        z = integ.step(h, z, 0.3)
    for _ in range(10):
        z = integ.step(h, z, -0.3)
    np.testing.assert_allclose(np.asarray(z.theta), np.asarray(z0.theta), atol=1e-10)


def test_pytree_target():
    """Structured parameters via ravel_pytree (ComponentArrays-ext analog)."""
    from advancedhmc_tpu import target_from_pytree

    example = {"mu": jnp.zeros(2), "scale": jnp.zeros(())}

    def logp(p):
        return -0.5 * jnp.sum(p["mu"] ** 2) - 0.5 * p["scale"] ** 2

    t = target_from_pytree(logp, example)
    assert t.dim == 3
    v, g = t.logdensity_and_grad(jnp.asarray([1.0, 2.0, 3.0]))
    assert np.isclose(float(v), -0.5 * (1 + 4 + 9))
    tree = t.unravel(jnp.asarray([1.0, 2.0, 3.0]))
    assert set(tree) == {"mu", "scale"}


def test_solver_integrator_external_stepper():
    """SolverIntegrator: a third-party symplectic stepper plugs into the
    kernel (the true solver-delegation analogue of the OrdinaryDiffEq
    extension, ref ext/AdvancedHMCOrdinaryDiffEqSymplecticRKExt.jl:6-47).

    (a) an externally-written leapfrog reproduces the native Leapfrog's
    trajectory; (b) Ruth's 3rd-order composition beats leapfrog's energy
    error; (c) it samples end-to-end through the public NUTS kernel."""
    from advancedhmc_tpu import SolverIntegrator, make_integrator

    h = _h1d()
    z0 = h.phasepoint(jnp.asarray([1.0]), jnp.asarray([0.0]))
    e0 = float(z0.energy())

    def ext_leapfrog(q, p, eps, grad_fn, vel_fn):
        p = p + 0.5 * eps * grad_fn(q)
        q = q + eps * vel_fn(p)
        p = p + 0.5 * eps * grad_fn(q)
        return q, p

    native = Leapfrog(step_size=jnp.asarray(0.2, jnp.float64))
    plugged = SolverIntegrator(step_size=jnp.asarray(0.2, jnp.float64),
                               stepper=ext_leapfrog)
    z_n, z_p = z0, z0
    for _ in range(25):
        z_n = native.step(h, z_n, 0.2)
        z_p = plugged.step(h, z_p, 0.2)
    np.testing.assert_allclose(np.asarray(z_p.theta), np.asarray(z_n.theta),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(z_p.r), np.asarray(z_n.r),
                               rtol=1e-12)

    # Ruth 1983 third-order symplectic coefficients
    RUTH_C = (1.0, -2.0 / 3.0, 2.0 / 3.0)
    RUTH_D = (-1.0 / 24.0, 3.0 / 4.0, 7.0 / 24.0)

    def ruth3(q, p, eps, grad_fn, vel_fn):
        for c, d in zip(RUTH_C, RUTH_D):
            q = q + c * eps * vel_fn(p)
            p = p + d * eps * grad_fn(q)
        return q, p

    def max_energy_err(integ, eps, n):
        z = z0
        err = 0.0
        for _ in range(n):
            z = integ.step(h, z, eps)
            err = max(err, abs(float(z.energy()) - e0))
        return err

    eps = 0.25
    err_lf = max_energy_err(Leapfrog(step_size=jnp.asarray(eps, jnp.float64)),
                            eps, 40)
    err_r3 = max_energy_err(
        make_integrator("solver", jnp.asarray(eps, jnp.float64),
                        stepper=ruth3), eps, 40)
    assert err_r3 < err_lf / 3, (err_r3, err_lf)

    # end-to-end: the plugged solver drives the public NUTS kernel
    from advancedhmc_tpu import (
        AdaptorConfig, GeneralisedNoUTurn, HMCKernel, Trajectory, as_target,
        make_metric, sample,
    )

    target = as_target(lambda th: -0.5 * jnp.sum(th**2), dim=3)
    kernel = HMCKernel(Trajectory(
        make_integrator("solver", jnp.asarray(0.5, jnp.float64),
                        stepper=ruth3),
        GeneralisedNoUTurn(), "multinomial"))
    res = sample(jax.random.PRNGKey(0), target, kernel,
                 make_metric("diagonal", 3, dtype=jnp.float64),
                 jnp.zeros((8, 3), jnp.float64), 400, n_adapts=200,
                 adaptor=AdaptorConfig(kind="stan"), drop_warmup=True)
    draws = np.asarray(res.thetas).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(draws.std(0), 1.0, rtol=0.15)
