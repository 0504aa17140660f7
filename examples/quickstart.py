"""Quickstart: NUTS on a 10-D Gaussian (≅ reference docs get_started.md)."""

import jax
import jax.numpy as jnp

import advancedhmc_tpu as ahmc

D = 10
target = ahmc.as_target(lambda th: -0.5 * jnp.sum(th**2), dim=D)

res = ahmc.NUTS(0.8).sample(
    jax.random.PRNGKey(0), target, jnp.zeros(D),
    n_samples=2000, n_adapts=1000, n_chains=64, verbose=True,
)
print("posterior mean:", res.thetas[1000:].mean(axis=(0, 1)))
print("posterior var :", res.thetas[1000:].var(axis=(0, 1)))
