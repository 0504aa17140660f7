"""Standard distribution library: declarative log densities composable with
`transforms.transformed_target`.

The reference turns ANY Distributions.jl distribution into an unconstrained
target via Bijectors (`LogDensityDistribution`,
/root/reference/test/common.jl:18-31) and builds its conjugate test model
from distribution primitives (/root/reference/test/common.jl:91-110). This
module is the native equivalent: each distribution is a frozen dataclass
with a `logpdf(y)` (summed over the block — parameters broadcast) and a
`default_transform(size)` mapping its support to R^n, so

    target_of(Gamma(2.0, 3.0), size=5)

is a ready-to-sample unconstrained target for 5 iid Gamma variates, and
hierarchical models compose declaratively:

    def logdensity(s, m):
        return (InverseGamma(2.0, 3.0).logpdf(s)
                + Normal(0.0, jnp.sqrt(s)).logpdf(m)
                + Normal(m, jnp.sqrt(s)).logpdf(obs))
    target = transformed_target(logdensity, [Positive(1), Identity(1)],
                                names=["s", "m"])

(see `gdemo_declarative` below — the reference's gdemo rebuilt this way and
pinned by tests/test_models.py to the analytic posterior mean).

All log-pdfs are numerically direct jnp expressions (no scipy.stats host
fallbacks) so they trace cleanly under jit/vmap on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
from jax.scipy.special import betaln, gammaln

from ..target import LogDensityTarget
from ..transforms import (
    Identity,
    Interval,
    Positive,
    Simplex,
    Transform,
    transformed_target,
)


def _sum_on_support(ok, lp_elem):
    """Sum elementwise log densities with a support guard: off-support
    elements contribute −inf (so the block total is −inf) instead of a NaN
    or an improper constant. The default transforms never leave the
    support, so under `target_of(...)` the guard is a no-op; it exists so a
    user-overridden transform (e.g. Identity on a bounded distribution)
    yields a proper truncated density the −Inf-clamp machinery rejects
    cleanly rather than a silent improper target (ADVICE r4)."""
    lp_elem = jnp.asarray(lp_elem)
    neg_inf = jnp.asarray(-jnp.inf, lp_elem.dtype)
    return jnp.sum(jnp.where(ok, lp_elem, neg_inf))


class Distribution:
    """Base: `logpdf(y)` returns the SUM of elementwise log densities over
    the block (parameters broadcast against y); `default_transform(size)`
    maps the support onto R^size for unconstrained sampling. Bounded
    distributions guard their support (−inf off-support, see
    `_sum_on_support`)."""

    def logpdf(self, y):
        raise NotImplementedError

    def default_transform(self, size: int) -> Transform:
        return Identity(size)


@dataclasses.dataclass(frozen=True)
class Normal(Distribution):
    loc: object = 0.0
    scale: object = 1.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        z = (y - self.loc) / self.scale
        return jnp.sum(
            -0.5 * jnp.square(z) - jnp.log(self.scale)
            - 0.5 * jnp.log(2.0 * jnp.pi) + jnp.zeros_like(y)
        )


@dataclasses.dataclass(frozen=True)
class LogNormal(Distribution):
    loc: object = 0.0
    scale: object = 1.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        ly = jnp.log(jnp.maximum(y, jnp.finfo(y.dtype).tiny))
        z = (ly - self.loc) / self.scale
        return _sum_on_support(
            y > 0,
            -0.5 * jnp.square(z) - ly - jnp.log(self.scale)
            - 0.5 * jnp.log(2.0 * jnp.pi),
        )

    def default_transform(self, size):
        return Positive(size)


@dataclasses.dataclass(frozen=True)
class StudentT(Distribution):
    df: object = 3.0
    loc: object = 0.0
    scale: object = 1.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        v = jnp.asarray(self.df, y.dtype)
        z = (y - self.loc) / self.scale
        return jnp.sum(
            gammaln((v + 1.0) / 2.0) - gammaln(v / 2.0)
            - 0.5 * jnp.log(v * jnp.pi) - jnp.log(self.scale)
            - (v + 1.0) / 2.0 * jnp.log1p(jnp.square(z) / v)
            + jnp.zeros_like(y)
        )


@dataclasses.dataclass(frozen=True)
class Cauchy(Distribution):
    loc: object = 0.0
    scale: object = 1.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        z = (y - self.loc) / self.scale
        return jnp.sum(
            -jnp.log(jnp.pi) - jnp.log(self.scale) - jnp.log1p(jnp.square(z))
            + jnp.zeros_like(y)
        )


@dataclasses.dataclass(frozen=True)
class Laplace(Distribution):
    loc: object = 0.0
    scale: object = 1.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        return jnp.sum(
            -jnp.abs(y - self.loc) / self.scale
            - jnp.log(2.0 * jnp.asarray(self.scale, y.dtype))
            + jnp.zeros_like(y)
        )


@dataclasses.dataclass(frozen=True)
class Exponential(Distribution):
    rate: object = 1.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        r = jnp.asarray(self.rate, y.dtype)
        return _sum_on_support(y >= 0, jnp.log(r) - r * y + jnp.zeros_like(y))

    def default_transform(self, size):
        return Positive(size)


@dataclasses.dataclass(frozen=True)
class Gamma(Distribution):
    """Shape/rate parameterisation (matches Distributions.jl's
    Gamma(α, θ=1/rate) up to the rate convention — stated explicitly here
    to avoid the classic α,θ vs α,β confusion)."""

    concentration: object = 1.0
    rate: object = 1.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        a = jnp.asarray(self.concentration, y.dtype)
        b = jnp.asarray(self.rate, y.dtype)
        return _sum_on_support(
            y > 0,
            a * jnp.log(b) - gammaln(a) + (a - 1.0) * jnp.log(y) - b * y,
        )

    def default_transform(self, size):
        return Positive(size)


@dataclasses.dataclass(frozen=True)
class InverseGamma(Distribution):
    concentration: object = 2.0
    scale: object = 3.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        a = jnp.asarray(self.concentration, y.dtype)
        b = jnp.asarray(self.scale, y.dtype)
        return _sum_on_support(
            y > 0,
            a * jnp.log(b) - gammaln(a) - (a + 1.0) * jnp.log(y) - b / y,
        )

    def default_transform(self, size):
        return Positive(size)


@dataclasses.dataclass(frozen=True)
class Beta(Distribution):
    a: object = 1.0
    b: object = 1.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        a = jnp.asarray(self.a, y.dtype)
        b = jnp.asarray(self.b, y.dtype)
        return _sum_on_support(
            (y > 0) & (y < 1),
            (a - 1.0) * jnp.log(y) + (b - 1.0) * jnp.log1p(-y)
            - betaln(a, b),
        )

    def default_transform(self, size):
        return Interval(size, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class Uniform(Distribution):
    lo: object = 0.0
    hi: object = 1.0

    def logpdf(self, y):
        y = jnp.asarray(y)
        lo = jnp.asarray(self.lo, y.dtype)
        hi = jnp.asarray(self.hi, y.dtype)
        return _sum_on_support(
            (y >= lo) & (y <= hi),
            -jnp.log(hi - lo) + jnp.zeros_like(y),
        )

    def default_transform(self, size):
        return Interval(size, float(self.lo), float(self.hi))


@dataclasses.dataclass(frozen=True)
class Dirichlet(Distribution):
    """`alpha` is the (K,) concentration; logpdf takes the K-simplex block
    produced by the `Simplex` transform (unconstrained size K−1)."""

    alpha: tuple

    def logpdf(self, y):
        y = jnp.asarray(y)
        a = jnp.asarray(self.alpha, y.dtype)
        return (
            _sum_on_support(y > 0, (a - 1.0) * jnp.log(y))
            + gammaln(jnp.sum(a)) - jnp.sum(gammaln(a))
        )

    def default_transform(self, size):
        # size = unconstrained size = K−1
        return Simplex(size)


@dataclasses.dataclass(frozen=True)
class BernoulliLogit(Distribution):
    """Observation-model helper: logpdf(k) of binary data k∈{0,1} given
    `logits` (the natural-parameter form used by the logistic models,
    numerically stable via log1p(exp)). Typically used inside a
    `logdensity(...)` closure, not as a sampled block."""

    logits: object = 0.0

    def logpdf(self, k):
        k = jnp.asarray(k)
        lg = jnp.asarray(self.logits, jnp.result_type(float, k.dtype))
        # k·lg − log(1+e^lg), stable form
        return jnp.sum(k * lg - jnp.logaddexp(0.0, lg) + jnp.zeros_like(lg))


@dataclasses.dataclass(frozen=True)
class Poisson(Distribution):
    rate: object = 1.0

    def logpdf(self, k):
        k = jnp.asarray(k)
        r = jnp.asarray(self.rate, jnp.result_type(float, k.dtype))
        kf = k.astype(r.dtype)
        return jnp.sum(kf * jnp.log(r) - r - gammaln(kf + 1.0))


def target_of(
    dist: Distribution,
    size: int = 1,
    transform: Optional[Transform] = None,
    name: str = "x",
) -> LogDensityTarget:
    """ANY distribution → unconstrained target (the reference's
    `LogDensityDistribution` fixture, /root/reference/test/common.jl:18-31):
    the target's log density is logpdf(T(x)) + log|det ∂T/∂x| with T the
    distribution's default support transform (overridable)."""
    t = transform if transform is not None else dist.default_transform(size)
    return transformed_target(dist.logpdf, [t], names=[name])


def joint_target(
    blocks: Sequence[tuple],
    loglik=None,
) -> LogDensityTarget:
    """Declarative model: `blocks` is a sequence of
    (name, distribution, size[, transform]) prior blocks; `loglik(*values)`
    (optional) adds an observation log likelihood over the constrained
    block values. Returns a transformed_target whose log density is
    Σ prior logpdfs + loglik, sampled on R^D.

    Conditional priors: a block's `distribution` may instead be a CALLABLE
    `dist_fn(*previous_values) -> Distribution`, evaluated on the
    constrained values of all preceding blocks — enough to express the
    reference's conjugate hierarchy (see `gdemo_declarative`)."""
    names, transforms, dist_specs = [], [], []
    for blk in blocks:
        if len(blk) == 3:
            name, dist, size = blk
            tr = None
        else:
            name, dist, size, tr = blk
        if tr is None:
            if isinstance(dist, Distribution):
                tr = dist.default_transform(size)
            else:
                raise ValueError(
                    f"block {name!r}: conditional (callable) priors need an "
                    "explicit transform"
                )
        names.append(name)
        transforms.append(tr)
        dist_specs.append(dist)

    def logdensity(*values):
        lp = 0.0
        for i, (d, v) in enumerate(zip(dist_specs, values)):
            if callable(d) and not isinstance(d, Distribution):
                d = d(*values[:i])
            lp = lp + d.logpdf(v)
        if loglik is not None:
            lp = lp + loglik(*values)
        return lp

    return transformed_target(logdensity, transforms, names=names)


def gdemo_declarative() -> LogDensityTarget:
    """The reference's conjugate gdemo model
    (/root/reference/test/common.jl:91-110) rebuilt from distribution
    primitives: s ~ InverseGamma(2,3); m|s ~ N(0,√s); obs 1.5, 2.0 ~ N(m,√s).
    Posterior mean of (s, m) is (49/24, 7/6) — pinned by tests/test_models.py
    against the hand-written `gdemo` and the analytic value."""
    obs = jnp.asarray([1.5, 2.0])
    return joint_target(
        [
            ("s", InverseGamma(2.0, 3.0), 1),
            ("m", lambda s: Normal(0.0, jnp.sqrt(s)), 1, Identity(1)),
        ],
        loglik=lambda s, m: Normal(m, jnp.sqrt(s)).logpdf(obs),
    )
