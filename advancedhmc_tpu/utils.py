"""Small numeric / PRNG utilities shared across the framework.

TPU-native analogue of the reference's scalar-or-vector + RNG utilities
(/root/reference/src/utilities.jl). The reference's dual "one chain vs
matrix-of-chains" code paths collapse here: every kernel is written for a single
chain and batched with `jax.vmap`; per-chain randomness comes from splittable
threefry keys instead of a vector of RNG objects
(/root/reference/src/utilities.jl:5-23).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logaddexp(a, b):
    """Numerically stable log(exp(a) + exp(b)) that tolerates -inf inputs."""
    return jnp.logaddexp(a, b)


def rand_exponential(key, shape=(), dtype=jnp.float32):
    """Sample Exp(1) variates (used by MH-in-log-space accepts).

    Mirrors `Random.randexp` usage in the reference (e.g.
    /root/reference/src/trajectory.jl:858).
    """
    return jax.random.exponential(key, shape=shape, dtype=dtype)


def rand_sign(key):
    """Draw +1/-1 with equal probability (NUTS doubling direction).

    Mirrors `rand(rng, Bool)` at /root/reference/src/trajectory.jl:693.
    """
    return jnp.where(jax.random.bernoulli(key), jnp.int32(1), jnp.int32(-1))


def maxabs(a, b):
    """Return the argument with the largest absolute value.

    Mirrors /root/reference/src/trajectory.jl:526.
    """
    return jnp.where(jnp.abs(a) > jnp.abs(b), a, b)


def trailing_ones(i):
    """Number of trailing one-bits of a (traced) non-negative int32."""
    i = i.astype(jnp.uint32) if hasattr(i, "astype") else jnp.uint32(i)
    # trailing ones of i == trailing zeros of i+1-complement trick:
    # lowest zero bit of i is the lowest set bit of ~i.
    inv = ~i
    low = inv & (jnp.uint32(0) - inv)  # lowest set bit of ~i
    return jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32)


def trailing_zeros(i):
    """Number of trailing zero-bits of a (traced) positive int32.

    For i == 0 this returns 32; callers clamp as needed.
    """
    i = i.astype(jnp.uint32) if hasattr(i, "astype") else jnp.uint32(i)
    low = i & (jnp.uint32(0) - i)
    n = jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32)
    return jnp.where(i == 0, jnp.int32(32), n)


def tree_dot(a, b):
    """Dot product over two pytrees with matching structure."""
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def clamp_nonfinite(x, replacement=-jnp.inf):
    """Replace non-finite entries with `replacement`.

    Mirrors the PhasePoint -Inf clamping semantics at
    /root/reference/src/hamiltonian.jl:93-106: non-finite log densities become
    -Inf so downstream Metropolis-Hastings steps auto-reject.
    """
    return jnp.where(jnp.isfinite(x), x, jnp.asarray(replacement, dtype=x.dtype))
