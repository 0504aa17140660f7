"""Constrained-parameter transforms: sample on R^D, report in the
constrained space.

The reference leans on Bijectors.jl for this (its test fixture
`LogDensityDistribution` wraps any Distributions.jl distribution into an
unconstrained target, /root/reference/test/common.jl:18-31); here the
equivalent is native. A `Transform` maps an unconstrained vector block to a
constrained one with a log-|Jacobian| correction; `transformed_target`
composes per-block transforms with a constrained-space log density into a
`LogDensityTarget` ready for any sampler in the package, and
`constrain`/`unconstrain` convert draws.

All transforms are elementwise (diagonal Jacobians) except `Ordered` and
`Simplex`, whose Jacobians are triangular — log-dets stay O(D).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from .target import LogDensityTarget


class Transform:
    """y = forward(x) with log|det ∂y/∂x|; inverse for initialisation."""

    size: int

    def forward(self, x):  # -> (y, logdet)
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Transform):
    size: int

    def forward(self, x):
        return x, jnp.zeros((), x.dtype)

    def inverse(self, y):
        return y


@dataclasses.dataclass(frozen=True)
class Positive(Transform):
    """y = exp(x): the log transform for scale-type parameters."""

    size: int

    def forward(self, x):
        return jnp.exp(x), jnp.sum(x)

    def inverse(self, y):
        return jnp.log(y)


@dataclasses.dataclass(frozen=True)
class Interval(Transform):
    """y = lo + (hi−lo)·sigmoid(x): bounded parameters."""

    size: int
    lo: float = 0.0
    hi: float = 1.0

    def forward(self, x):
        s = jax.nn.sigmoid(x)
        y = self.lo + (self.hi - self.lo) * s
        # log|dy/dx| = log(hi-lo) + log σ(x) + log σ(-x)
        logdet = jnp.sum(
            jnp.log(self.hi - self.lo)
            + jax.nn.log_sigmoid(x)
            + jax.nn.log_sigmoid(-x)
        )
        return y, logdet

    def inverse(self, y):
        p = (y - self.lo) / (self.hi - self.lo)
        return jnp.log(p) - jnp.log1p(-p)


@dataclasses.dataclass(frozen=True)
class Ordered(Transform):
    """y₁ = x₁, y_k = y_{k−1} + exp(x_k): strictly increasing vectors."""

    size: int

    def forward(self, x):
        incs = jnp.concatenate([x[:1], jnp.exp(x[1:])])
        return jnp.cumsum(incs), jnp.sum(x[1:])

    def inverse(self, y):
        d = jnp.diff(y)
        return jnp.concatenate([y[:1], jnp.log(d)])


@dataclasses.dataclass(frozen=True)
class Simplex(Transform):
    """Stan's stick-breaking: x ∈ R^{K−1} → y on the K-simplex.

    `size` is the UNCONSTRAINED size K−1; forward returns K components.
    """

    size: int

    def forward(self, x):
        k = self.size
        ks = jnp.arange(k, dtype=x.dtype)
        z = jax.nn.sigmoid(x - jnp.log(k - ks))
        one_minus = jnp.concatenate(
            [jnp.ones((1,), x.dtype), jnp.cumprod(1.0 - z)]
        )
        y = jnp.concatenate([z, jnp.ones((1,), x.dtype)]) * one_minus
        logdet = jnp.sum(
            jnp.log(z) + jnp.log1p(-z) + jnp.log(one_minus[:-1])
        )
        return y, logdet

    def inverse(self, y):
        k = self.size
        ks = jnp.arange(k, dtype=y.dtype)
        rest = 1.0 - jnp.concatenate(
            [jnp.zeros((1,), y.dtype), jnp.cumsum(y[:-1])]
        )[:k]
        z = y[:k] / rest
        return jnp.log(z) - jnp.log1p(-z) + jnp.log(k - ks)


def _apply(transforms: Sequence[Transform], x) -> Tuple[list, jnp.ndarray]:
    ys, off, logdet = [], 0, jnp.zeros((), x.dtype)
    for t in transforms:
        blk = x[off:off + t.size]
        y, ld = t.forward(blk)
        ys.append(y)
        logdet = logdet + ld
        off += t.size
    return ys, logdet


def transformed_target(
    logdensity_constrained: Callable,
    transforms: Sequence[Transform],
    names: Sequence[str] = None,
) -> LogDensityTarget:
    """Wrap a constrained-space log density into an unconstrained target.

    `logdensity_constrained(*blocks)` receives one constrained array per
    transform. The returned target's dimension is the total unconstrained
    size; its log density is ℓπ(T(x)) + log|det ∂T/∂x|.

    `names` (one per transform) label the constrained blocks in
    `SampleResult.to_inference_dict(constrained=True)` — the parameter-
    naming + invlink role of the reference's MCMCChains extension
    (/root/reference/ext/AdvancedHMCMCMCChainsExt.jl:19-40). The target
    carries `transforms`/`names` so results can back-transform draws.
    """
    dim = sum(t.size for t in transforms)
    if names is not None and len(names) != len(transforms):
        raise ValueError("need exactly one name per transform")

    def logdensity(x):
        ys, logdet = _apply(transforms, x)
        return logdensity_constrained(*ys) + logdet

    t = LogDensityTarget(logdensity, dim)
    object.__setattr__(t, "transforms", tuple(transforms))
    if names is not None:
        object.__setattr__(t, "names", tuple(names))
    return t


def constrain(transforms: Sequence[Transform], x):
    """Unconstrained draws (…, dim) → list of constrained blocks (…, size')."""
    f = lambda xx: _apply(transforms, xx)[0]
    for _ in range(jnp.ndim(x) - 1):
        f = jax.vmap(f)
    return f(jnp.asarray(x))


def unconstrain(transforms: Sequence[Transform], *blocks):
    """Constrained blocks → one unconstrained vector (single point)."""
    parts = [t.inverse(jnp.asarray(b)) for t, b in zip(transforms, blocks)]
    return jnp.concatenate(parts)
