"""Downstream-integration demo: Bayesian neural network posterior with NUTS.

The analogue of the reference's Turing.jl downstream usage: any JAX-native
model (here a flax MLP) becomes a target via `target_from_pytree` — the
pytree of weights flows through the sampler as a flat vector.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import advancedhmc_tpu as ahmc


class MLP(nn.Module):
    hidden: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.tanh(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)[..., 0]


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(-3, 3, size=(64, 1))
    y = np.sin(x[:, 0]) + rng.normal(scale=0.1, size=64)
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)

    model = MLP()
    params0 = model.init(jax.random.PRNGKey(0), x)

    def logdensity(params):
        pred = model.apply(params, x)
        log_lik = -0.5 * jnp.sum((pred - y) ** 2) / 0.1**2
        log_prior = sum(
            -0.5 * jnp.sum(p**2)
            for p in jax.tree_util.tree_leaves(params)
        )
        return log_lik + log_prior

    target = ahmc.target_from_pytree(logdensity, params0)
    print(f"sampling {target.dim}-parameter BNN posterior")

    res = ahmc.NUTS(0.8, max_depth=8).sample(
        jax.random.PRNGKey(1), target, jnp.zeros(target.dim),
        n_samples=600, n_adapts=300, n_chains=8,
    )
    draws = res.thetas[300:]
    # posterior predictive at a few points
    xs = jnp.linspace(-3, 3, 5)[:, None]
    preds = jax.vmap(
        lambda flat: model.apply(target.unravel(flat), xs)
    )(draws.reshape(-1, target.dim)[::20])
    print("posterior predictive mean:", np.asarray(preds.mean(axis=0)))
    print("truth:                    ", np.asarray(jnp.sin(xs[:, 0])))


if __name__ == "__main__":
    main()
