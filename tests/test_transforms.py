"""Constrained-parameter transforms (Bijectors analog; the reference wraps
Distributions via Bijectors in its fixtures, /root/reference/test/common.jl:
18-31). Gates: Jacobian log-dets vs autodiff, inverse round-trips, and an
end-to-end posterior on a constrained model."""

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
from advancedhmc_tpu.transforms import (
    Identity,
    Interval,
    Ordered,
    Positive,
    Simplex,
    constrain,
    transformed_target,
    unconstrain,
)


@pytest.mark.parametrize("t,x", [
    (Identity(3), np.array([0.3, -1.2, 2.0])),
    (Positive(3), np.array([0.3, -1.2, 2.0])),
    (Interval(3, -2.0, 5.0), np.array([0.3, -1.2, 2.0])),
    (Ordered(4), np.array([0.5, -0.3, 1.1, -2.0])),
    (Simplex(3), np.array([0.2, -0.8, 1.4])),
])
def test_logdet_matches_autodiff_and_roundtrip(t, x):
    x = jnp.asarray(x, jnp.float64)
    y, logdet = t.forward(x)
    jac = jax.jacfwd(lambda xx: t.forward(xx)[0])(x)
    if jac.shape[0] == jac.shape[1]:
        _, ad_logdet = jnp.linalg.slogdet(jac)
    else:
        # simplex: square Jacobian of the first K components
        _, ad_logdet = jnp.linalg.slogdet(jac[: x.shape[0]])
    np.testing.assert_allclose(float(logdet), float(ad_logdet), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(t.inverse(y)), np.asarray(x), rtol=1e-8, atol=1e-10
    )


def test_simplex_forward_is_simplex():
    y, _ = Simplex(4).forward(jnp.asarray([0.3, -0.5, 1.0, -2.0], jnp.float64))
    assert y.shape == (5,)
    np.testing.assert_allclose(float(jnp.sum(y)), 1.0, rtol=1e-12)
    assert (np.asarray(y) > 0).all()


def test_transformed_posterior_gamma():
    """Gamma(3, 2) posterior sampled on the log scale: the transformed
    target must recover E[y]=1.5, Var[y]=0.75 in the constrained space."""
    a, b = 3.0, 2.0

    def logp(y):
        return jnp.sum((a - 1.0) * jnp.log(y) - b * y)

    tr = [Positive(1)]
    target = transformed_target(logp, tr)
    assert target.dim == 1
    kernel = HMCKernel(Trajectory(
        Leapfrog(step_size=jnp.asarray(0.5, jnp.float64)),
        GeneralisedNoUTurn(max_depth=6), "multinomial"))
    x0 = jnp.zeros((32, 1), jnp.float64)
    out = sample(jax.random.PRNGKey(0), target, kernel,
                 make_metric("diagonal", 1, dtype=jnp.float64), x0,
                 n_samples=600, n_adapts=200,
                 adaptor=AdaptorConfig(kind="stan"), drop_warmup=True)
    ys = np.asarray(constrain(tr, out.thetas)[0]).reshape(-1)
    np.testing.assert_allclose(ys.mean(), a / b, rtol=0.05)
    np.testing.assert_allclose(ys.var(), a / b**2, rtol=0.15)


def test_unconstrain_blocks_concatenate():
    tr = [Positive(2), Interval(1, 0.0, 1.0)]
    x = unconstrain(tr, jnp.asarray([1.0, 2.0]), jnp.asarray([0.25]))
    assert x.shape == (3,)
    blocks = constrain(tr, x)
    np.testing.assert_allclose(np.asarray(blocks[0]), [1.0, 2.0], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(blocks[1]), [0.25], rtol=1e-10)
