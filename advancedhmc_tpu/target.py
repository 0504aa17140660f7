"""Target density interface (LogDensityProblems-equivalent protocol).

The reference consumes targets through the LogDensityProblems.jl contract —
`logdensity`, `logdensity_and_gradient`, `dimension` — and attaches AD backends
when only values are available (/root/reference/src/AdvancedHMC.jl:160-209).

TPU-native design: a target is a plain Python callable `logdensity(theta)`
mapping a `(dim,)` array to a scalar. Gradients come from `jax.value_and_grad`
(the analogue of the ADTypes extension, /root/reference/ext/AdvancedHMCADTypesExt.jl:7-23);
a user may instead provide an analytic `logdensity_and_grad`. Everything is
traced/compiled by XLA, and batching across chains is done by `jax.vmap` at the
sampler layer, so targets are always written for a single chain.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax


@dataclasses.dataclass(frozen=True)
class LogDensityTarget:
    """A differentiable unnormalized log density on R^dim.

    Fields
    ------
    logdensity:
        `theta -> scalar` log density (single chain, shape `(dim,)`).
    dim:
        Number of parameters.
    logdensity_and_grad:
        Optional `theta -> (scalar, (dim,))`; defaults to
        `jax.value_and_grad(logdensity)` — the AD-attachment path of
        /root/reference/src/AdvancedHMC.jl:176,207.
    """

    logdensity: Callable
    dim: int
    logdensity_and_grad: Optional[Callable] = None

    def __post_init__(self):
        if self.logdensity_and_grad is None:
            object.__setattr__(
                self,
                "logdensity_and_grad",
                jax.value_and_grad(self.logdensity),
            )

    def __hash__(self):
        return hash((id(self.logdensity), self.dim))

    def __eq__(self, other):
        return (
            isinstance(other, LogDensityTarget)
            and self.logdensity is other.logdensity
            and self.dim == other.dim
            and self.logdensity_and_grad is other.logdensity_and_grad
        )


def target_from_pytree(logdensity_fn, example) -> LogDensityTarget:
    """Wrap a log density over pytree-structured parameters.

    The analogue of the ComponentArrays extension
    (/root/reference/ext/AdvancedHMCComponentArraysExt.jl): structured/named
    parameters flow through the sampler as a flat vector via
    `ravel_pytree`; the returned target carries `unravel` to map draws back.
    """
    from jax.flatten_util import ravel_pytree

    flat_example, unravel = ravel_pytree(example)

    def flat_logdensity(x):
        return logdensity_fn(unravel(x))

    t = LogDensityTarget(flat_logdensity, int(flat_example.size))
    object.__setattr__(t, "unravel", unravel)
    return t


def as_target(obj, dim: Optional[int] = None) -> LogDensityTarget:
    """Coerce a callable or target-like object into a LogDensityTarget."""
    if isinstance(obj, LogDensityTarget):
        return obj
    if callable(obj):
        if dim is None:
            raise ValueError("dim is required when wrapping a bare callable")
        return LogDensityTarget(logdensity=obj, dim=dim)
    raise TypeError(f"cannot interpret {type(obj)} as a log-density target")
