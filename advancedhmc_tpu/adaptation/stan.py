"""Adaptor composition: Stan's 3-phase windowed schedule, the naive composite
adaptor, and the single-step adaptation transition used inside the sampling
scan.

Mirrors /root/reference/src/adaptation/stan_adaptor.jl and the glue at
/root/reference/src/sampler.jl:60-90. The window schedule is precomputed on
the host as boolean arrays indexed by iteration (static shapes), and the
per-step update is branch-free masked arithmetic — the reference's mutation
(`adapt!`, `reset!`) becomes functional state threading through `lax.scan`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from .massmatrix import (
    LowRankCovState,
    NutpieVarState,
    UnitMassMatrixState,
    WelfordCovState,
    WelfordVarState,
)
from .stepsize import DualAveragingConfig, DualAveragingState, da_update

# mass-matrix estimator kinds
MM_UNIT = "unit"
MM_WELFORD_VAR = "welford_var"
MM_WELFORD_COV = "welford_cov"
MM_NUTPIE = "nutpie"
MM_LOWRANK = "lowrank"         # rank-preserving, for RankUpdate metrics

# adaptor kinds
NONE = "none"                  # NoAdaptation (ref Adaptation.jl:28)
STEPSIZE = "stepsize"          # dual averaging only (HMCDA-style)
MASSMATRIX = "massmatrix"      # mass matrix only, updated every step
NAIVE = "naive"                # NaiveHMCAdaptor (ref Adaptation.jl:41-64)
STAN = "stan"                  # StanHMCAdaptor (ref stan_adaptor.jl:61-159)


@dataclasses.dataclass(frozen=True)
class AdaptorConfig:
    kind: str = STAN
    mm_kind: str = MM_WELFORD_VAR
    da: DualAveragingConfig = DualAveragingConfig()
    init_buffer: int = 75
    term_buffer: int = 50
    window_size: int = 25
    # rank of the low-rank estimator (mm_kind == "lowrank" only); must match
    # the RankUpdateEuclideanMetric's rank so scan carries stay static-shaped
    mm_rank: int = 8

    @property
    def uses_da(self):
        return self.kind in (STEPSIZE, NAIVE, STAN)

    @property
    def uses_mm(self):
        return self.kind in (MASSMATRIX, NAIVE, STAN) and self.mm_kind != MM_UNIT


_MM_INITS = {
    MM_UNIT: UnitMassMatrixState.init,
    MM_WELFORD_VAR: WelfordVarState.init,
    MM_WELFORD_COV: WelfordCovState.init,
    MM_NUTPIE: NutpieVarState.init,
}


class AdaptState(struct.PyTreeNode):
    """Composite adaptor state (dual averaging + mass matrix)."""

    da: DualAveragingState
    mm: struct.PyTreeNode

    @classmethod
    def init(cls, cfg: AdaptorConfig, dim: int, eps0, dtype=jnp.float32):
        if cfg.mm_kind == MM_LOWRANK:
            mm = LowRankCovState.init(dim, dtype, rank=cfg.mm_rank)
        else:
            mm = _MM_INITS[cfg.mm_kind](dim, dtype)
        return cls(
            da=DualAveragingState.init(jnp.asarray(eps0, dtype)),
            mm=mm,
        )


def stan_schedule(
    n_adapts: int,
    init_buffer: int = 75,
    term_buffer: int = 50,
    window_size: int = 25,
) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute (in_window, window_end) boolean arrays of length n_adapts.

    Host-side mirror of `initialize!` (ref stan_adaptor.jl:13-50); entry t
    corresponds to adaptation iteration i = t+1 (the reference is 1-indexed).
    For n_adapts=1000 the splits are exactly [100, 150, 250, 450, 950]
    (asserted by test parity with /root/reference/test/adaptation.jl:147-153).
    """
    window_start = init_buffer + 1
    window_end = n_adapts - term_buffer

    splits = []
    next_window = init_buffer + window_size
    w = window_size
    while next_window <= window_end:
        boundary = next_window + 2 * w
        if boundary > window_end:
            next_window = window_end
        splits.append(next_window)
        w *= 2
        next_window += w
    if splits and splits[-1] == n_adapts:
        splits.pop()

    i = np.arange(1, n_adapts + 1)
    in_window = (i >= window_start) & (i <= window_end)
    is_split = np.isin(i, np.asarray(splits, dtype=np.int64))
    return in_window, is_split


def transient_depth_caps(
    n_adapts: int,
    max_depth: int,
    cap: int,
    init_len: int = 40,
    post_len: int = 16,
    init_buffer: int = 75,
    term_buffer: int = 50,
    window_size: int = 25,
) -> np.ndarray:
    """Transient-gated warmup depth-cap schedule ((n_adapts,) int32).

    Warmup wall is dominated by dual-averaging transients: ε overshoots
    right after initialisation and after every Stan window reset, spawning
    deep-tree episodes whose max-over-chains sets the fused block's
    iteration count (PERF.md "Warmup anatomy"). This returns `cap` for the
    first `init_len` iterations and for `post_len` iterations after each
    window reset, and `max_depth` elsewhere — so the DA equilibrium phases
    (which set the final ε and the adapted metric) run at FULL depth,
    unlike a whole-warmup cap (which biases the equilibrium: measured
    accept 0.575 vs 0.591 target at bench shape). Feed to
    `fused_warmup_phase_crosschain(..., depth_caps=...)`; the cap is a
    traced value inside one fused program (no per-segment compiles).
    """
    _, w_end = stan_schedule(n_adapts, init_buffer, term_buffer, window_size)
    caps = np.full(n_adapts, max_depth, np.int32)
    caps[: min(init_len, n_adapts)] = cap
    for r in np.nonzero(w_end)[0]:
        caps[r + 1: r + 1 + post_len] = cap
    return caps


def adapt_flags(cfg: AdaptorConfig, n_adapts: int, n_total: int):
    """Per-iteration flag arrays (length n_total) fed to the sampling scan."""
    is_adapt = np.arange(n_total) < n_adapts
    is_last = np.arange(n_total) == (n_adapts - 1)
    if cfg.kind == STAN and n_adapts > 0:
        in_w, w_end = stan_schedule(
            n_adapts, cfg.init_buffer, cfg.term_buffer, cfg.window_size
        )
        in_window = np.zeros(n_total, bool)
        window_end = np.zeros(n_total, bool)
        in_window[:n_adapts] = in_w
        window_end[:n_adapts] = w_end
    elif cfg.kind in (NAIVE, MASSMATRIX):
        in_window = is_adapt.copy()
        window_end = np.zeros(n_total, bool)
    else:
        in_window = np.zeros(n_total, bool)
        window_end = np.zeros(n_total, bool)
    return {
        "is_adapt": jnp.asarray(is_adapt),
        "in_window": jnp.asarray(in_window),
        "window_end": jnp.asarray(window_end),
        "is_last": jnp.asarray(is_last),
    }


def _mask_tree(pred, new, old):
    return jax.tree_util.tree_map(lambda a, b: jnp.where(pred, a, b), new, old)


def _mm_push(cfg: AdaptorConfig, mm, theta, grad):
    if cfg.mm_kind == MM_NUTPIE:
        return mm.push(theta, grad)
    if cfg.mm_kind == MM_UNIT:
        return mm
    return mm.push(theta)


def _mm_push_batch(cfg: AdaptorConfig, mm, thetas, grads):
    if cfg.mm_kind == MM_NUTPIE:
        return mm.push_batch(thetas, grads)
    if cfg.mm_kind == MM_UNIT:
        return mm
    return mm.push_batch(thetas)


def _adapt_core(cfg, st, push_fn, alpha, flags):
    """Shared single/batch adaptation step.

    Order mirrors StanHMCAdaptor.adapt! (ref stan_adaptor.jl:137-159) wrapped
    by Adaptation.adapt! (ref sampler.jl:72-90):
      ssa update → mm push (in window) → mm estimate (window end) →
      reset ssa+mm (window end) → finalize ssa (last adapt step).
    """
    is_adapt = flags["is_adapt"]
    in_window = flags["in_window"]
    window_end = flags["window_end"]
    is_last = flags["is_last"]

    da = st.da
    if cfg.uses_da:
        da = _mask_tree(is_adapt, da_update(cfg.da, st.da, alpha), st.da)

    mm = st.mm
    if cfg.uses_mm:
        mm = _mask_tree(is_adapt & in_window, push_fn(mm), mm)
        if cfg.kind in (NAIVE, MASSMATRIX):
            update_pred = is_adapt & in_window
        else:
            update_pred = is_adapt & window_end
        mm = _mask_tree(update_pred, mm.update_estimate(), mm)
        mm = _mask_tree(is_adapt & window_end, mm.reset(), mm)

    if cfg.uses_da and cfg.kind == STAN:
        da = _mask_tree(is_adapt & window_end, da.reset(), da)
    if cfg.uses_da:
        da = _mask_tree(is_adapt & is_last, da.finalize(), da)

    return AdaptState(da=da, mm=mm)


def adapt_step(cfg: AdaptorConfig, st: AdaptState, theta, grad, alpha, flags):
    """Single-chain adaptation step (vmap for per-chain adaptation)."""
    return _adapt_core(
        cfg, st, lambda mm: _mm_push(cfg, mm, theta, grad), alpha, flags
    )


def adapt_step_batch(cfg: AdaptorConfig, st: AdaptState, thetas, grads, alphas, flags):
    """Cross-chain adaptation: fold the whole (chains, dim) batch into shared
    Welford moments and drive dual averaging with the batch-mean acceptance.

    This is the new first-class capability vs the reference (per-chain only,
    SURVEY.md §2.3): under jit with chains sharded over a mesh the batch
    reductions lower to psums across ICI/DCN.
    """
    alpha = jnp.mean(jnp.minimum(alphas, 1.0))
    return _adapt_core(
        cfg, st, lambda mm: _mm_push_batch(cfg, mm, thetas, grads), alpha, flags
    )
