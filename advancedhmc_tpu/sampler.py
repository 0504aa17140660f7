"""Sampling loop: vmapped chains under `lax.scan`, functional adaptation.

TPU-native redesign of /root/reference/src/sampler.jl and the AbstractMCMC
state machine (/root/reference/src/abstractmcmc.jl):

* `HMCState` is the complete resumable snapshot — iteration, phase points,
  metric, adaptor state, PRNG key (≅ `HMCState`,
  /root/reference/src/abstractmcmc.jl:11-27). One pytree, trivially
  checkpointable.
* `sample_step` is the per-iteration transition + adaptation
  (≅ /root/reference/src/sampler.jl:48-58,182-193): jitter → refresh →
  trajectory transition → adapt. The chain batch is a leading axis; the
  single-chain kernel is vmapped, so the reference's whole vector/matrix-mode
  dual code path disappears.
* Warmup/draw phases run as two `lax.scan`s (warmup optionally discards
  outputs — the reference's `drop_warmup`, sampler.jl:174,224-227).
* Per-chain adaptation (reference semantics) vmaps the adaptor update;
  cross-chain adaptation (new capability) folds the whole chain batch into
  shared Welford/dual-averaging state — under jit with the chain axis sharded
  over a device mesh, XLA lowers the reductions to psums over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .adaptation import (
    AdaptState,
    AdaptorConfig,
    NONE,
    adapt_flags,
    adapt_step,
    adapt_step_batch,
)
from .hamiltonian import Hamiltonian, PhasePoint
from .kinetic import GaussianKinetic
from .metrics import Metric
from .nuts import nuts_transition, nuts_transitions_fused
from .stepsize_search import find_good_stepsize
from .target import LogDensityTarget
from .termination import DynamicTerminationCriterion
from .trajectory import HMCKernel, transition_static


class HMCState(struct.PyTreeNode):
    """Complete resumable sampler state (≅ abstractmcmc.jl:11-27)."""

    iteration: jnp.ndarray
    z: PhasePoint          # leaves have leading chain axis (C, ...)
    metric: Metric         # shared, or per-chain leaves (C, ...)
    adapt: AdaptState      # shared, or per-chain leaves
    key: jnp.ndarray

    @property
    def position(self):
        """getparams (≅ abstractmcmc.jl:33-38)."""
        return self.z.theta

    def with_step_size(self, eps):
        """Manually override the current step size (≅ `ManualSSAdaptor`
        writing `state.ϵ` mid-run, ref stepsize.jl:64-95). Scalar, or
        per-chain `(C,)` when the adaptor state is per-chain."""
        da = self.adapt.da
        new_eps = jnp.broadcast_to(
            jnp.asarray(eps, da.eps.dtype), da.eps.shape
        )
        return self.replace(adapt=self.adapt.replace(
            da=da.replace(eps=new_eps)
        ))

    def with_position(self, spec: "SampleSpec", theta):
        """setparams!! — replace positions, recompute ℓπ/∇ℓπ, keep momenta
        and cached ℓκ (≅ abstractmcmc.jl:40-45)."""
        lp, grad = jax.vmap(spec.target.logdensity_and_grad)(theta)
        z = self.z.replace(
            theta=theta,
            logdensity=jnp.where(jnp.isfinite(lp), lp, -jnp.inf),
            grad=grad,
        )
        return self.replace(z=z)


def _path_name(path):
    """Join a jax key path into a variable name: dict keys and attribute
    names verbatim, sequence positions as indices ("coefs.0")."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p).strip(".[]'\""))
    return ".".join(parts)


def _pytree_fingerprint(tree):
    """Structural fingerprint of a config pytree: treedef (static fields
    ride in its aux data) + each concrete array leaf's (shape, dtype,
    bytes). Hashable, and equal fingerprints imply identical compilation
    when the tree is used as a static jit argument. Non-array leaves pass
    through (they must be hashable themselves); tracer leaves fall back to
    object identity (a spec built from traced values is not a valid static
    argument anyway)."""
    import numpy as _np

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    fp = []
    for leaf in leaves:
        if isinstance(leaf, jax.core.Tracer):
            fp.append(("tracer", id(leaf)))
        elif isinstance(leaf, (jax.Array, _np.ndarray, _np.generic)):
            a = _np.asarray(leaf)
            fp.append((a.shape, str(a.dtype), a.tobytes()))
        else:
            fp.append(leaf)
    return treedef, tuple(fp)


@dataclasses.dataclass(frozen=True)
class SampleSpec:
    """Static configuration closed over by the compiled step."""

    target: LogDensityTarget
    kernel: HMCKernel          # template; step size overridden per step
    adaptor: AdaptorConfig
    cross_chain: bool = False
    kinetic: Any = GaussianKinetic()
    # Share trajectory-shape random decisions (multinomial split / NUTS
    # doubling direction) across chains — the reference's coupled vector-of-
    # RNGs mode (`rand_coupled`, /root/reference/src/utilities.jl:39-47).
    coupled: bool = False

    # Hash/eq are STRUCTURAL over the kernel/kinetic config (treedef +
    # static fields + concrete leaf values), not object identity: equal
    # specs used as static jit arguments share one compile-cache entry, and
    # id() reuse after GC can never alias distinct configs.
    def _fingerprint(self):
        return (self.target, _pytree_fingerprint(self.kernel), self.adaptor,
                self.cross_chain, _pytree_fingerprint(self.kinetic),
                self.coupled)

    def __hash__(self):
        return hash(self._fingerprint())

    def __eq__(self, other):
        if not isinstance(other, SampleSpec):
            return NotImplemented
        return self._fingerprint() == other._fingerprint()


def _progress_payload(stats_last, metric):
    """Full live-display payload for a progress callback: the core stats
    plus tree depth / log density / energy when present and a mass-matrix
    summary — the fused-path analogue of the reference's per-iteration
    ProgressMeter fields (/root/reference/src/abstractmcmc.jl:221-291)."""
    payload = {k: stats_last[k]
               for k in ("acceptance_rate", "step_size", "numerical_error",
                         "tree_depth", "log_density", "hamiltonian_energy")
               if k in stats_last}
    mi = getattr(metric, "m_inv", None)
    if mi is not None:
        from .metrics import DenseEuclideanMetric as _DenseM

        if isinstance(metric, _DenseM):
            mi = jnp.diagonal(mi, axis1=-2, axis2=-1)
        payload["mm_diag"] = mi
    return payload


def _one_chain_transition(spec: SampleSpec, key, metric, eps, z,
                          coupled_key=None):
    """jitter → refresh → trajectory transition (ref sampler.jl:48-58)."""
    h = Hamiltonian(metric=metric, target=spec.target, kinetic=spec.kinetic)
    k_jit, k_ref, k_tr = jax.random.split(key, 3)
    integ = spec.kernel.trajectory.integrator.with_nom_step_size(eps)
    integ = integ.jitter(k_jit)
    traj = spec.kernel.trajectory.replace(integrator=integ)
    z = spec.kernel.refreshment.refresh(k_ref, h, z)
    if isinstance(traj.criterion, DynamicTerminationCriterion):
        return nuts_transition(k_tr, h, traj, z, coupled_key=coupled_key)
    return transition_static(k_tr, h, traj, z, coupled_key=coupled_key)


def fanout_warmup_state(spec: SampleSpec, state: HMCState,
                        n_chains: int) -> HMCState:
    """Fan a warmed CROSS-CHAIN state out to a larger chain pool (warmup
    pool sizing, r5).

    Cross-chain adaptation pools its Welford/dual-averaging statistics over
    the whole chain batch, so the (ε, M⁻¹) estimates saturate far below
    production pool sizes (a 25-iteration Stan window over 4096 chains is
    ~100k observations) — while the warmup WALL scales with the pool
    (chain-chunked dispatch is sequential in the sub-batches, PERF.md).
    Warming up a representative sub-pool and fanning out therefore divides
    the warmup wall by the chunk count at identical adaptation quality.

    The warmed positions are approximate posterior draws; they are tiled
    cyclically onto `n_chains` (their cached ℓπ/∇ℓπ/ℓκ tile with them, so
    no recomputation), the shared metric/adaptation state is reused as-is,
    and the key is re-derived so the fanned pool's streams are fresh.
    Cloned chains start at IDENTICAL positions: run a short discarded
    decorrelation phase (e.g. `fused_draw_phase` for ~2·(pool/warmed)
    transitions) before collecting draws — near-iid NUTS transitions
    (~0.9 ESS/draw at a tuned δ) make clones statistically independent
    within a handful of transitions; bench.py hard-gates the result with
    its subsample-ESS extrapolation check every run.

    No reference counterpart (AdvancedHMC.jl warms every chain,
    /root/reference/src/sampler.jl:159-248) — this is a cross-chain-
    adaptation capability the reference does not have.
    """
    c0 = state.z.theta.shape[0]
    if not spec.cross_chain:
        raise ValueError(
            "fanout_warmup_state requires cross_chain=True (shared "
            "adaptation state); per-chain adapt leaves would need "
            "per-chain tiling semantics the estimator does not define"
        )
    if n_chains < c0:
        raise ValueError(f"n_chains {n_chains} < warmed pool {c0}")
    reps = -(-n_chains // c0)

    def tile(x):
        return jnp.concatenate([x] * reps, axis=0)[:n_chains]

    z = jax.tree_util.tree_map(tile, state.z)
    return state.replace(z=z, key=jax.random.fold_in(state.key, n_chains))


def fused_draw_phase(spec: SampleSpec, state: HMCState, n_draws: int,
                     fuse: int, thin: int = 1, online_om=None,
                     unroll: int = 1, progress_cb=None, experimental=None,
                     chain_chunks: int = 1, pair: bool = False):
    """Post-warmup draws with `fuse` transitions per while-loop invocation.

    Chains run their own transition sequences asynchronously inside each
    fused block (see nuts_transitions_fused), cutting the vmapped loop's
    max-over-chains synchronisation waste. Adaptation is frozen (identical to
    the scan path where is_adapt=False makes adapt a no-op).

    `thin` keeps every thin-th draw (must divide `fuse`). `online_om` (an
    OnlineMoments pytree) switches to storage-free collection: draws are
    folded into the running summary and the return becomes
    (state, None, stats, online_moments).

    `experimental` (an `experimental.Experimental`) opts into the measured-
    but-not-adopted loop layouts (packed carry, segmented collection, bf16
    out buffers) — see that module's doc for the evidence per knob.

    `chain_chunks=S` splits the chain batch into S sequential sub-batches
    INSIDE each fused dispatch (a lax.scan over chunks of the batch-explicit
    while-loop), dividing the resident loop carry by S — the mitigation for
    the 8192-chain VMEM-spill cliff (PERF.md chain-count rows). Draw-phase
    chains are independent with adaptation frozen, so the chunked result is
    BIT-IDENTICAL to the unchunked one (pinned by tests/test_collect.py);
    only the carry residency and the per-chunk max-over-chains loop count
    change. Requires the batch-explicit layout (batched metrics) and
    chain_chunks | n_chains.
    """
    if experimental is None:
        from .experimental import Experimental as _Exp

        experimental = _Exp()
    out_dtype = experimental.out_dtype
    stage_slots = experimental.stage_slots
    pack_carry = experimental.pack_carry
    per_chain = not spec.cross_chain
    n_chains = state.z.theta.shape[0]
    assert n_draws % fuse == 0, "fuse_draws must divide the draw count"
    assert fuse % thin == 0, "thin must divide fuse_draws"
    batch_axis = 0 if per_chain else None
    online = online_om is not None
    if online:
        from .diagnostics import online_update

    def one_chain(key, metric, eps, z, batched=False, metric_batch=None,
                  eps_batch=None):
        h = Hamiltonian(metric=metric, target=spec.target, kinetic=spec.kinetic)
        integ = spec.kernel.trajectory.integrator.with_nom_step_size(eps)
        traj = spec.kernel.trajectory.replace(integrator=integ)
        return nuts_transitions_fused(
            key, h, traj, z, fuse, spec.kernel.refreshment, unroll=unroll,
            out_dtype=out_dtype, batched=batched, metric_batch=metric_batch,
            eps_batch=eps_batch, stage_slots=stage_slots,
            pack_carry=pack_carry, pair=pair,
        )

    # Batch-explicit fused loop: one while_loop over the batched state
    # instead of vmapping the loop, which removes the per-carry done-guard
    # selects (PERF.md). Shared metric/eps (cross-chain) closes over the
    # metric; per-chain diag/unit/dense metrics thread M⁻¹ (+ the dense
    # Cholesky factor) / ϵ through the state.
    from .metrics import DenseEuclideanMetric as _Dense
    from .metrics import DiagEuclideanMetric as _Diag
    from .metrics import UnitEuclideanMetric as _Unit

    use_batched = unroll == 1 and (
        not per_chain or isinstance(state.metric, (_Diag, _Unit, _Dense))
    )
    if chain_chunks > 1:
        assert use_batched, (
            "chain_chunks requires the batch-explicit fused layout "
            "(unroll=1 and a unit/diag/dense or shared metric)"
        )
        assert n_chains % chain_chunks == 0, (
            "chain_chunks must divide the chain count"
        )

    def _chunked(tree, s):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((s, x.shape[0] // s) + x.shape[1:]), tree
        )

    def _unchunked(tree):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]),
            tree,
        )

    def outer(carry, _):
        st, om = carry
        key, k_step = jax.random.split(st.key)
        keys = jax.random.split(k_step, n_chains)
        if use_batched and not per_chain:
            if chain_chunks > 1:
                def chunk_body(_, xs):
                    k_c, z_c = xs
                    return None, one_chain(
                        k_c, st.metric, st.adapt.da.eps, z_c, batched=True
                    )

                _, (zl, ths, stats) = jax.lax.scan(
                    chunk_body, None,
                    (_chunked(keys, chain_chunks),
                     _chunked(st.z, chain_chunks)),
                )
                z_last = _unchunked(zl)
                ths = _unchunked(ths)
                stats = _unchunked(stats)
            else:
                z_last, ths, stats = one_chain(
                    keys, st.metric, st.adapt.da.eps, st.z, batched=True
                )
        elif use_batched:
            eps_c = st.adapt.da.eps          # (C,)
            if isinstance(st.metric, (_Diag, _Dense)):
                metric_t = jax.tree_util.tree_map(lambda x: x[0], st.metric)
                metric_b = st.metric
            else:                            # unit: no array leaves
                metric_t, metric_b = st.metric, None
            if chain_chunks > 1:
                xs = (_chunked(keys, chain_chunks),
                      _chunked(st.z, chain_chunks),
                      _chunked(eps_c, chain_chunks))
                metric_ch = (None if metric_b is None
                             else _chunked(metric_b, chain_chunks))

                def chunk_body(_, xs_i):
                    if metric_ch is not None:
                        k_c, z_c, e_c, m_c = xs_i
                    else:
                        k_c, z_c, e_c = xs_i
                        m_c = None
                    return None, one_chain(
                        k_c, metric_t, e_c[0], z_c, batched=True,
                        metric_batch=m_c, eps_batch=e_c,
                    )

                _, (zl, ths, stats) = jax.lax.scan(
                    chunk_body, None,
                    xs + (metric_ch,) if metric_ch is not None else xs,
                )
                z_last = _unchunked(zl)
                ths = _unchunked(ths)
                stats = _unchunked(stats)
            else:
                z_last, ths, stats = one_chain(
                    keys, metric_t, eps_c[0], st.z, batched=True,
                    metric_batch=metric_b, eps_batch=eps_c,
                )
        else:
            z_last, ths, stats = jax.vmap(
                one_chain, in_axes=(0, batch_axis, batch_axis, 0)
            )(keys, st.metric, st.adapt.da.eps, st.z)
        new_st = st.replace(
            iteration=st.iteration + fuse, z=z_last, key=key
        )
        # (C, fuse, …) → (fuse, C, …)
        ths = jnp.swapaxes(ths, 0, 1)
        stats = {k: jnp.swapaxes(v, 0, 1) for k, v in stats.items()}
        stats["is_adapt"] = jnp.zeros_like(stats["numerical_error"])
        if progress_cb is not None:
            from jax.experimental import io_callback as _io_callback

            _io_callback(
                progress_cb, None, new_st.iteration,
                _progress_payload({k: v[-1] for k, v in stats.items()},
                                  new_st.metric),
                ordered=True,
            )
        if online:
            om = jax.lax.scan(
                lambda o, x: (online_update(o, x), None), om, ths
            )[0]
            return (new_st, om), stats
        if thin > 1:
            ths, stats = _thin_block(ths, stats, thin)
        return (new_st, om), (ths, stats)

    carry0 = (state, online_om if online else jnp.zeros((), jnp.int32))
    if online:
        (state, om), stats = jax.lax.scan(
            outer, carry0, None, length=n_draws // fuse
        )
        stats = {k: v.reshape((n_draws,) + v.shape[2:])
                 for k, v in stats.items()}
        return state, None, stats, om

    (state, _), (thetas, stats) = jax.lax.scan(
        outer, carry0, None, length=n_draws // fuse
    )
    n_kept = n_draws // thin
    # (outer, fuse/thin, C, …) → (n_kept, C, …)
    thetas = thetas.reshape((n_kept,) + thetas.shape[2:])
    stats = {k: v.reshape((n_kept,) + v.shape[2:]) for k, v in stats.items()}
    return state, thetas, stats


def _thin_block(ths, stats, thin: int):
    """Keep every `thin`-th draw of a (block, C, …) batch. Kept rows carry
    the kept transition's stats, except `n_steps` (summed over the thinned
    block — leapfrog totals stay exact) and `numerical_error` (OR over the
    block — divergences are never silently dropped)."""
    block = ths.shape[0]
    n_keep = block // thin
    ths = ths[thin - 1 :: thin]
    shaped = {
        k: v.reshape((n_keep, thin) + v.shape[1:]) for k, v in stats.items()
    }
    out = {k: v[:, -1] for k, v in shaped.items()}
    out["n_steps"] = jnp.sum(shaped["n_steps"], axis=1)
    out["numerical_error"] = jnp.any(shaped["numerical_error"], axis=1)
    return ths, out


def fused_warmup_phase(spec: SampleSpec, state: HMCState, n_adapts: int,
                       pair: bool = False):
    """Warmup with per-chain adaptation INSIDE the fused while-loop.

    Reference-exact per-chain semantics (each chain adapts on its own window
    schedule by its own transition count, ref sampler.jl:60-90 +
    stan_adaptor.jl), with the async-lane utilisation of the fused loop.
    Requires per-chain adaptation and a unit/diag/dense metric (diag with
    Welford-var/Nutpie, or dense with Welford-cov — per-chain dense
    adaptation runs the Cholesky refresh inside the loop at window ends,
    beyond the reference's single-chain-only dense metric, metric.jl:103).
    """
    from .adaptation import adapt_flags as _adapt_flags

    cfg = spec.adaptor
    n_chains = state.z.theta.shape[0]
    flag_arrays = _adapt_flags(cfg, n_adapts, n_adapts)

    def one_chain(key, metric, ad, z, batched=False, metric_batch=None,
                  eps_batch=None):
        h = Hamiltonian(metric=metric, target=spec.target, kinetic=spec.kinetic)
        eps0 = ad.da.eps if not batched else eps_batch[0]
        integ = spec.kernel.trajectory.integrator.with_nom_step_size(eps0)
        traj = spec.kernel.trajectory.replace(integrator=integ)
        return nuts_transitions_fused(
            key, h, traj, z, n_adapts, spec.kernel.refreshment,
            adapt_cfg=cfg, adapt_state=ad, adapt_flags=flag_arrays,
            batched=batched, metric_batch=metric_batch, eps_batch=eps_batch,
            pair=pair,
        )

    key, k_step = jax.random.split(state.key)
    keys = jax.random.split(k_step, n_chains)
    from .metrics import DenseEuclideanMetric as _Dense
    from .metrics import DiagEuclideanMetric as _Diag
    from .metrics import UnitEuclideanMetric as _Unit

    # batch-explicit loop for unit/diag/dense metrics (see fused_draw_phase);
    # dense rides the m_inv+chol_u-in-state machinery with per-chain
    # Welford-cov adaptation and in-loop Cholesky refresh at window ends
    # (beyond the reference: its dense metric is single-chain only,
    # /root/reference/src/metric.jl:103)
    if isinstance(state.metric, (_Diag, _Unit, _Dense)):
        if isinstance(state.metric, (_Diag, _Dense)):
            metric_t = jax.tree_util.tree_map(lambda x: x[0], state.metric)
            metric_b = state.metric
        else:
            metric_t, metric_b = state.metric, None
        z_last, ths, stats, ad_last = one_chain(
            keys, metric_t, state.adapt, state.z, batched=True,
            metric_batch=metric_b, eps_batch=state.adapt.da.eps,
        )
    else:
        z_last, ths, stats, ad_last = jax.vmap(one_chain)(
            keys, state.metric, state.adapt, state.z
        )

    metric = state.metric
    if cfg.uses_mm:
        metric = jax.vmap(lambda m, mi: m.renew(mi))(
            state.metric, ad_last.mm.m_inv
        )

    new_state = HMCState(
        iteration=state.iteration + n_adapts,
        z=z_last, metric=metric, adapt=ad_last, key=key,
    )
    ths = jnp.swapaxes(ths, 0, 1)
    stats = {k: jnp.swapaxes(v, 0, 1) for k, v in stats.items()}
    stats["is_adapt"] = jnp.ones_like(stats["numerical_error"], dtype=bool)
    return new_state, ths, stats


def fused_warmup_phase_crosschain(spec: SampleSpec, state: HMCState,
                                  n_adapts: int, block: int, flags=None,
                                  depth_caps=None, pair: bool = False,
                                  progress_cb=None, chain_chunks: int = 1):
    """Cross-chain warmup with `block` transitions fused per while-loop.

    Transitions inside a block run with the step size / metric FROZEN at the
    block start (async lanes, same utilisation win as fused draws); at each
    block boundary the per-iteration Welford pushes and Stan window logic
    are REPLAYED exactly from the recorded per-transition θ. Dual averaging
    updates ONCE per block with the block-mean acceptance: a block of
    observations all taken at the same stale ϵ is one effective observation
    of that ϵ, and replaying k per-iteration DA updates on it makes the
    controller unstable (measured: ϵ collapse at block=16). Opt-in deviation
    from the reference's per-transition cadence (ref sampler.jl:60-90); the
    window schedule and finalize are unchanged.

    Requires a non-nutpie mass-matrix estimator (grads are not recorded).
    Returns (state, warm_thetas (n_adapts, C, D), warm_stats).

    `depth_caps` ((n_adapts,) int array, optional) sets a per-transition
    tree-depth cap (transient-gated warmup: cap only the iterations right
    after each Stan window reset, where the dual-averaging transient spawns
    the deep-tree episodes that dominate warmup wall — PERF.md "Warmup
    anatomy"). Runs inside the SAME fused program (traced cap), so there is
    no per-segment compile/dispatch overhead.
    """
    cfg = spec.adaptor
    n_chains = state.z.theta.shape[0]
    assert n_adapts % block == 0
    assert cfg.mm_kind != "nutpie", (
        "cross-chain fused warmup records positions only"
    )
    if flags is None:
        flags = adapt_flags(cfg, n_adapts, n_adapts)
    n_blocks = n_adapts // block
    block_flags = jax.tree_util.tree_map(
        lambda a: a.reshape((n_blocks, block) + a.shape[1:]), flags
    )
    if depth_caps is not None:
        depth_caps = jnp.asarray(depth_caps, jnp.int32)
        assert depth_caps.shape == (n_adapts,)
        block_flags = dict(block_flags,
                           depth_caps=depth_caps.reshape(n_blocks, block))

    if chain_chunks > 1:
        assert n_chains % chain_chunks == 0, (
            "chain_chunks must divide the chain count"
        )

    def one_chain(keys, metric, eps, z, caps_blk=None):
        h = Hamiltonian(metric=metric, target=spec.target, kinetic=spec.kinetic)
        integ = spec.kernel.trajectory.integrator.with_nom_step_size(eps)
        traj = spec.kernel.trajectory.replace(integrator=integ)
        # metric/eps are shared within a block → batch-explicit fused loop
        # (no per-carry done-guard selects; see nuts_transitions_fused)
        if chain_chunks > 1:
            # VMEM-spill mitigation at ≥8192 chains (same mechanism as the
            # draw phase's chain_chunks): transitions within a block are
            # independent given the frozen eps/metric, so sub-batches run
            # sequentially inside the dispatch; the block replay below
            # still sees the FULL (block, C, D) theta record, so the
            # cross-chain adaptation is unchanged.
            s = chain_chunks

            def _split(t):
                return jax.tree_util.tree_map(
                    lambda x: x.reshape((s, x.shape[0] // s) + x.shape[1:]),
                    t,
                )

            def _join(t):
                return jax.tree_util.tree_map(
                    lambda x: x.reshape(
                        (x.shape[0] * x.shape[1],) + x.shape[2:]), t,
                )

            def chunk_body(_, xs):
                k_c, z_c = xs
                return None, nuts_transitions_fused(
                    k_c, h, traj, z_c, block, spec.kernel.refreshment,
                    batched=True, depth_caps=caps_blk, pair=pair,
                )

            _, (zl, ths, stats) = jax.lax.scan(
                chunk_body, None, (_split(keys), _split(z))
            )
            return _join(zl), _join(ths), _join(stats)
        return nuts_transitions_fused(
            keys, h, traj, z, block, spec.kernel.refreshment, batched=True,
            depth_caps=caps_blk, pair=pair,
        )

    def outer(st, f_block):
        caps_blk = f_block.pop("depth_caps", None) \
            if isinstance(f_block, dict) else None
        key, k_step = jax.random.split(st.key)
        keys = jax.random.split(k_step, n_chains)
        z_last, ths, stats = one_chain(keys, st.metric, st.adapt.da.eps,
                                       st.z, caps_blk)
        # (C, block, …) → (block, C, …)
        ths = jnp.swapaxes(ths, 0, 1)
        stats = {k: jnp.swapaxes(v, 0, 1) for k, v in stats.items()}

        from .adaptation.stan import STAN, _mask_tree
        from .adaptation.stepsize import da_update

        alpha_blk = jnp.mean(jnp.minimum(stats["acceptance_rate"], 1.0))
        t_idx = jnp.arange(block)

        def replay(ad, xs):
            th_t, f_t, t = xs
            is_adapt = f_t["is_adapt"]
            in_w, w_end = f_t["in_window"], f_t["window_end"]
            is_last = f_t["is_last"]
            da = ad.da
            if cfg.uses_da:
                # once per block (or at a window end / the final step)
                da_now = is_adapt & ((t == block - 1) | w_end | is_last)
                da = _mask_tree(da_now, da_update(cfg.da, da, alpha_blk), da)
            mm = ad.mm
            if cfg.uses_mm:
                mm = _mask_tree(is_adapt & in_w, mm.push_batch(th_t), mm)
                upd = is_adapt & (w_end if cfg.kind == STAN else in_w)
                mm = _mask_tree(upd, mm.update_estimate(), mm)
                mm = _mask_tree(is_adapt & w_end, mm.reset(), mm)
            if cfg.uses_da and cfg.kind == STAN:
                da = _mask_tree(is_adapt & w_end, da.reset(), da)
            if cfg.uses_da:
                da = _mask_tree(is_adapt & is_last, da.finalize(), da)
            return AdaptState(da=da, mm=mm), None

        adapt_new, _ = jax.lax.scan(
            replay, st.adapt, (ths, f_block, t_idx)
        )
        metric = st.metric
        if cfg.uses_mm:
            metric = st.metric.renew(adapt_new.mm.m_inv)
        new_st = HMCState(
            iteration=st.iteration + block,
            z=z_last, metric=metric, adapt=adapt_new, key=key,
        )
        stats["is_adapt"] = jnp.ones_like(stats["numerical_error"], dtype=bool)
        if progress_cb is not None:
            # live warmup display, once per fused block (the fused-warmup
            # analogue of the reference's per-iteration ProgressMeter,
            # /root/reference/src/sampler.jl:95-103)
            from jax.experimental import io_callback as _io_callback

            _io_callback(
                progress_cb, None, new_st.iteration,
                _progress_payload({k: v[-1] for k, v in stats.items()},
                                  new_st.metric),
                ordered=True,
            )
        return new_st, (ths, stats)

    state, (thetas, stats) = jax.lax.scan(outer, state, block_flags)
    thetas = thetas.reshape((n_adapts,) + thetas.shape[2:])
    stats = {k: v.reshape((n_adapts,) + v.shape[2:]) for k, v in stats.items()}
    return state, thetas, stats


def sample_step(spec: SampleSpec, state: HMCState, flags) -> tuple:
    """One full (transition + adaptation) step over the chain batch."""
    cfg = spec.adaptor
    per_chain = not spec.cross_chain
    n_chains = state.z.theta.shape[0]

    key, k_step, k_coupled = jax.random.split(state.key, 3)
    keys = jax.random.split(k_step, n_chains)
    coupled_key = k_coupled if spec.coupled else None

    batch_axis = 0 if per_chain else None
    z_new, stats = jax.vmap(
        lambda k, m, e, z: _one_chain_transition(spec, k, m, e, z,
                                                 coupled_key=coupled_key),
        in_axes=(0, batch_axis, batch_axis, 0),
    )(keys, state.metric, state.adapt.da.eps, state.z)

    alpha = stats["acceptance_rate"]
    if spec.cross_chain:
        adapt_new = adapt_step_batch(
            cfg, state.adapt, z_new.theta, z_new.grad, alpha, flags
        )
    else:
        adapt_new = jax.vmap(
            lambda st, th, g, a: adapt_step(cfg, st, th, g, a, flags)
        )(state.adapt, z_new.theta, z_new.grad, alpha)

    metric = state.metric
    if cfg.uses_mm:
        m_inv = adapt_new.mm.m_inv
        if per_chain:
            renewed = jax.vmap(lambda m, mi: m.renew(mi), in_axes=(0, 0))(
                state.metric, m_inv
            )
        else:
            renewed = state.metric.renew(m_inv)
        metric = jax.tree_util.tree_map(
            lambda a, b: jnp.where(flags["is_adapt"], a, b), renewed, state.metric
        )

    stats = dict(stats)
    stats["is_adapt"] = jnp.broadcast_to(flags["is_adapt"], alpha.shape)

    new_state = HMCState(
        iteration=state.iteration + 1,
        z=z_new,
        metric=metric,
        adapt=adapt_new,
        key=key,
    )
    return new_state, stats


def init_state(
    key,
    spec: SampleSpec,
    metric: Metric,
    init_theta,
    init_eps=None,
    n_chains: Optional[int] = None,
    init_mass_matrix: str = "identity",
) -> HMCState:
    """Build the initial batched HMCState (≅ sample_init, sampler.jl:36-46,
    plus the first-step factory path of abstractmcmc.jl:131-166).

    `init_mass_matrix="gradient"` seeds a diagonal metric nutpie-style from
    the gradient at the initial positions — M⁻¹_j = 1/mean|∇_j ℓπ| — instead
    of the identity. For poorly scaled targets this shortens the deep-tree
    phase of early warmup (the dominant warmup cost; dual averaging and the
    Welford windows refine it as usual). New capability vs the reference
    (whose metric always starts at I, src/abstractmcmc.jl:374-391)."""
    theta = jnp.asarray(init_theta)
    if theta.ndim == 1:
        if n_chains is None:
            n_chains = 1
        theta = jnp.broadcast_to(theta[None, :], (n_chains, theta.shape[-1]))
    n_chains = theta.shape[0]
    dtype = theta.dtype

    if init_mass_matrix == "gradient":
        from .metrics import DiagEuclideanMetric as _DEM

        assert isinstance(metric, _DEM), (
            "init_mass_matrix='gradient' requires a diagonal metric"
        )
        _, grads = jax.vmap(spec.target.logdensity_and_grad)(theta)
        g = jnp.mean(jnp.abs(grads), axis=0)
        m_inv0 = 1.0 / jnp.clip(g, 1e-3, 1e6)
        metric = _DEM(m_inv=m_inv0.astype(dtype),
                      sqrt_m_inv=jnp.sqrt(m_inv0).astype(dtype))
    elif init_mass_matrix != "identity":
        raise ValueError(f"unknown init_mass_matrix {init_mass_matrix!r}")

    if spec.adaptor.uses_mm and spec.adaptor.mm_kind == "lowrank":
        # The low-rank estimator renews (a_diag, b, d) at rank mm_rank; the
        # metric must carry matching static-shaped slots for scan carries.
        from .metrics import RankUpdateEuclideanMetric as _RUM

        if not isinstance(metric, _RUM):
            raise ValueError(
                "mm_kind='lowrank' adapts a RankUpdateEuclideanMetric; got "
                f"{type(metric).__name__}"
            )
        k = min(spec.adaptor.mm_rank, metric.dim)
        if metric.rank != k:
            if metric.rank != 0:
                raise ValueError(
                    f"metric rank {metric.rank} != adaptor mm_rank {k}; "
                    "pass make_metric('rank_update', dim, rank=mm_rank) or "
                    "a rank-0 identity (auto-upgraded)"
                )
            metric = _RUM.identity(metric.dim, dtype=metric.dtype, rank=k)

    key, k_eps, k_mom = jax.random.split(key, 3)
    h = Hamiltonian(metric=metric, target=spec.target, kinetic=spec.kinetic)

    per_chain_adapt = not spec.cross_chain
    if init_eps is None:
        # ≅ make_step_size → find_good_stepsize (abstractmcmc.jl:310-354);
        # jitted: the search is a bounded while_loop, and eager dispatch
        # would round-trip per op on remote (tunnelled) devices. With
        # per-chain adaptation the search runs vmapped from EACH chain's own
        # initial position, seeding per-chain dual averaging — the
        # reference's vector-ϵ semantics (AbstractScalarOrVec step size
        # end-to-end, src/utilities.jl:1, src/adaptation/stepsize.jl:32-36).
        if per_chain_adapt:
            eps_keys = jax.random.split(k_eps, n_chains)
            eps0 = jax.jit(
                jax.vmap(lambda k, t: find_good_stepsize(k, h, t))
            )(eps_keys, theta)
        else:
            eps0 = jax.jit(find_good_stepsize)(k_eps, h, theta[0])
    else:
        eps0 = jnp.asarray(init_eps, dtype)

    mom_keys = jax.random.split(k_mom, n_chains)
    z = jax.vmap(h.init_phasepoint, in_axes=(0, 0))(mom_keys, theta)

    if per_chain_adapt:
        # per-chain adaptor state + metric along the chain axis; a (C,) eps
        # (from the vmapped search, or a user-passed per-chain init_eps)
        # seeds each chain's own dual-averaging anchor
        eps_c = jnp.broadcast_to(jnp.asarray(eps0, dtype), (n_chains,))
        adapt = jax.vmap(
            lambda e: AdaptState.init(spec.adaptor, spec.target.dim, e, dtype)
        )(eps_c)
        metric = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_chains,) + jnp.shape(x)), metric
        )
    else:
        if jnp.ndim(eps0) != 0:
            raise ValueError(
                "cross-chain adaptation shares one dual-averaging state; "
                "init_eps must be a scalar"
            )
        adapt = AdaptState.init(spec.adaptor, spec.target.dim, eps0, dtype)

    return HMCState(
        iteration=jnp.zeros((), jnp.int32),
        z=z,
        metric=metric,
        adapt=adapt,
        key=key,
    )


@dataclasses.dataclass
class SampleResult:
    """Draws + per-transition statistics + final resumable state.

    With `collect="online"` the draws are not stored: `thetas` is None and
    `online` carries the storage-free summary (n, per-chain mean/var, pooled
    bulk ESS) from diagnostics.online_summary.
    """

    thetas: Optional[jnp.ndarray]  # (n_kept, n_chains, dim) or None
    stats: Dict[str, jnp.ndarray]  # each (n_kept, n_chains)
    warmup_stats: Optional[Dict[str, jnp.ndarray]]
    final_state: HMCState
    online: Optional[Dict[str, jnp.ndarray]] = None
    # The sampled target (set by `sample`): carries `unravel` (pytree
    # targets) / `transforms` (constrained-space targets) so exports can
    # name parameters and back-transform draws.
    target: Optional[Any] = None

    @property
    def n_chains(self):
        if self.thetas is not None:
            return self.thetas.shape[1]
        return self.final_state.z.theta.shape[0]

    def _named_posterior(self, flat, constrained: bool):
        """Split (chain, draw, dim) flat draws into named variables.

        Pytree targets (target_from_pytree) export one variable per leaf
        with its original shape; transformed targets with constrained=True
        back-transform to the constrained space — the per-parameter naming
        + invlink behavior of the reference's MCMCChains extension
        (/root/reference/ext/AdvancedHMCMCMCChainsExt.jl:19-40)."""
        import numpy as np

        tgt = self.target
        if constrained:
            transforms = getattr(tgt, "transforms", None)
            if transforms is None:
                raise ValueError(
                    "constrained=True requires a target built by "
                    "transforms.transformed_target"
                )
            from .transforms import constrain as _constrain

            names = getattr(tgt, "names", None) or [
                f"x{i}" for i in range(len(transforms))
            ]
            blocks = _constrain(transforms, jnp.asarray(flat))
            return {n: np.asarray(b) for n, b in zip(names, blocks)}
        unravel = getattr(tgt, "unravel", None)
        if unravel is None:
            return {"theta": flat}
        example = unravel(jnp.zeros((tgt.dim,), jnp.asarray(flat).dtype))
        leaves, _ = jax.tree_util.tree_flatten_with_path(example)
        post, off = {}, 0
        for path, leaf in leaves:
            name = _path_name(path) or "theta"
            size = int(np.size(leaf))
            post[name] = flat[..., off:off + size].reshape(
                flat.shape[:2] + np.shape(leaf)
            )
            off += size
        return post

    def to_inference_dict(self, constrained: bool = False):
        """ArviZ-convention export: posterior (chain, draw, *shape) +
        sample_stats — the analogue of the MCMCChains `bundle_samples`
        extension (/root/reference/ext/AdvancedHMCMCMCChainsExt.jl:7-43).

        Posterior variables carry parameter NAMES when the target knows
        them: targets from `target_from_pytree` export one variable per
        pytree leaf (dict keys / attribute names / sequence indices joined
        with '.'), each reshaped to its original leaf shape;
        `constrained=True` additionally back-transforms draws from targets
        built by `transforms.transformed_target` into the constrained
        space. Plain flat targets export a single "theta" variable."""
        import numpy as np

        if self.thetas is None:
            raise ValueError("draws were not stored (collect='online')")

        flat = np.moveaxis(np.asarray(self.thetas), 0, 1)
        posterior = self._named_posterior(flat, constrained)
        rename = {
            "log_density": "lp",
            "numerical_error": "diverging",
            "acceptance_rate": "acceptance_rate",
            "hamiltonian_energy": "energy",
            "tree_depth": "tree_depth",
            "n_steps": "n_steps",
            "step_size": "step_size",
        }
        sample_stats = {
            new: np.moveaxis(np.asarray(self.stats[old]), 0, 1)
            for old, new in rename.items()
            if old in self.stats
        }
        return {"posterior": posterior, "sample_stats": sample_stats}

    def summary(self, constrained: bool = False, verbose: bool = True):
        """Per-parameter posterior table: mean, sd, 5%/95% quantiles, bulk
        and tail ESS, and rank-normalized split-R̂ — the `describe(chains)`
        experience of the reference's MCMCChains export
        (/root/reference/ext/AdvancedHMCMCMCChainsExt.jl), computed natively.
        Parameter names come from the target (pytree leaves / transform
        names); returns {name: {stat: value-or-array}} and pretty-prints a
        table when `verbose`."""
        import numpy as np

        from .diagnostics import ess_bulk, ess_tail, rhat

        d = self.to_inference_dict(constrained=constrained)
        out = {}
        rows = []
        for name, arr in d["posterior"].items():
            c, n = arr.shape[:2]
            flat = np.asarray(arr).reshape(c, n, -1)     # (chain, draw, k)
            x = np.moveaxis(flat, 0, 1)                  # (draw, chain, k)
            stats = {
                "mean": flat.mean((0, 1)),
                "sd": flat.std((0, 1)),
                "q5": np.quantile(flat, 0.05, axis=(0, 1)),
                "q95": np.quantile(flat, 0.95, axis=(0, 1)),
                "ess_bulk": np.asarray(ess_bulk(jnp.asarray(x))),
                "ess_tail": np.asarray(ess_tail(jnp.asarray(x))),
                "rhat": np.asarray(rhat(jnp.asarray(x))),
            }
            shape = arr.shape[2:]
            out[name] = {
                k: v.reshape(shape) if shape else v[0] for k, v in stats.items()
            }
            for j in range(flat.shape[-1]):
                label = name if flat.shape[-1] == 1 else f"{name}[{j}]"
                rows.append((label,) + tuple(
                    float(stats[k][j]) for k in
                    ("mean", "sd", "q5", "q95", "ess_bulk", "ess_tail",
                     "rhat")))
        if verbose:
            hdr = ("parameter", "mean", "sd", "5%", "95%", "ess_bulk",
                   "ess_tail", "rhat")
            w = max(9, max(len(r[0]) for r in rows))
            print(f"{hdr[0]:<{w}} " + " ".join(f"{h:>9}" for h in hdr[1:]))
            for r in rows:
                print(f"{r[0]:<{w}} "
                      + " ".join(f"{v:9.3g}" for v in r[1:-3])
                      + f" {r[-3]:9.0f} {r[-2]:9.0f} {r[-1]:9.3f}")
        # Sampler-steering check (VERDICT r4 weak #3): when ONE dimension's
        # bulk ESS collapses relative to the rest, NUTS is paying its whole
        # tree budget for the slowest direction; ChEES-HMC's uniform-cost
        # trajectories typically multiply min-dimension ESS/s on such
        # geometry (docs/get_started.md "Choosing a sampler").
        if len(rows) >= 2:
            import warnings

            ess_vals = np.asarray([r[5] for r in rows], dtype=float)
            med = float(np.median(ess_vals))
            if med > 0 and float(ess_vals.min()) / med < 0.2:
                worst = rows[int(np.argmin(ess_vals))][0]
                warnings.warn(
                    f"min/median bulk-ESS ratio "
                    f"{ess_vals.min() / med:.2f} < 0.2 (slowest: {worst!r}):"
                    " one dimension mixes far slower than the rest. If this"
                    " is intrinsic geometry (not lack of draws), consider"
                    " reparameterising, a dense/rank_update metric, or"
                    " ChEES-HMC (`sample_chees`) — see docs/get_started.md"
                    " 'Choosing a sampler'."
                )
        return out

    def to_arviz(self, constrained: bool = False):
        """Build an arviz.InferenceData when arviz is installed (optional
        dependency — the analogue of the reference's weak-dep MCMCChains
        extension loading, /root/reference/Project.toml:20-32)."""
        try:
            import arviz as az
        except ImportError as e:
            raise ImportError(
                "arviz is not installed; use to_inference_dict() for the "
                "plain-dict export"
            ) from e
        d = self.to_inference_dict(constrained=constrained)
        return az.from_dict(posterior=d["posterior"],
                            sample_stats=d["sample_stats"])

    def save(self, path: str) -> None:
        """Persist draws/stats/summaries/final state to one npz (see
        checkpoint.save_result / load_result)."""
        from .checkpoint import save_result

        save_result(path, self)


def sample(
    key,
    target: LogDensityTarget,
    kernel: HMCKernel,
    metric: Metric,
    init_theta,
    n_samples: int,
    n_adapts: Optional[int] = None,
    adaptor: AdaptorConfig = AdaptorConfig(kind=NONE),
    init_eps=None,
    n_chains: Optional[int] = None,
    init_mass_matrix: str = "identity",
    cross_chain: bool = False,
    coupled: bool = False,
    fuse_draws: int = 0,
    fuse_chain_chunks: int = 1,
    fuse_pair: bool = False,
    fuse_warmup: bool = False,
    fuse_warmup_block: int = 8,
    thin: int = 1,
    collect: str = "draws",
    online_lags: int = 16,
    drop_warmup: bool = False,
    collect_warmup_stats: bool = True,
    mesh=None,
    progress: bool = False,
    progress_every: int = 100,
    verbose: bool = False,
    warmup_depth_cap: Optional[int] = None,
    warmup_cap_frac: float = 0.75,
    warmup_eps_research: bool = False,
    warmup_cap_frac2: Optional[float] = None,
    warmup_chains: int = 0,
    fanout_decorrelate: int = 32,
) -> SampleResult:
    """Sample `n_samples` total iterations (first `n_adapts` adapting).

    Mirrors `sample` (/root/reference/src/sampler.jl:159-248) including the
    default n_adapts = min(n_samples ÷ 10, 1000) (sampler.jl:115,166).

    Warmup pool sizing (beyond the reference; cross-chain adaptation +
    drop_warmup only): `warmup_chains = W < n_chains` runs the whole warmup
    on the first W chains, then fans the warmed state out to the full pool
    (`fanout_warmup_state`: positions tiled with their caches, shared
    metric/ε reused) and runs `fanout_decorrelate` discarded transitions so
    cloned chains separate before collection. Cross-chain estimates
    saturate at a few thousand chains while warmup wall scales with the
    pool, so this divides the warmup wall by ~n_chains/W at identical
    adaptation quality (measured at bench shape: warmup 2.2 s → 1.0 s at
    16384 chains with W=4096, posterior moments identical, subsample-ESS
    extrapolation ratio 0.999 — PERF.md). `warmup_stats` keeps the warmup
    pool's chain axis (W).

    Fast warmup (beyond the reference; cross-chain adaptation only):
    `warmup_depth_cap` runs the first `warmup_cap_frac` of warmup with the
    NUTS tree depth capped at that value. Warmup cost is dominated by
    dual-averaging transients after each Stan window reset (deep-tree
    episodes whose max-over-chains sets the batched loop's iteration
    count); the cap bounds them, halving the warmup wall at bench shape
    (PERF.md "Warmup anatomy"). Because the capped-tree DA equilibrium
    differs from the full-depth one, `warmup_eps_research=True`
    additionally re-runs the Stan init step-size search on the
    window-adapted metric at the capped→full switch and re-anchors dual
    averaging there — restoring on-target acceptance. The post-switch
    phase must be long enough (≳50 iterations) to absorb the
    mu = log(10·ε) re-anchor transient. Draws always run at the
    trajectory's full max_depth.

    3-phase schedule: `warmup_cap_frac2 > warmup_cap_frac` keeps the depth
    cap PAST the eps re-anchor (which still fires at `warmup_cap_frac`), so
    the dual-averaging descent's deep-tree episodes are bounded too; full
    depth runs only for the final `1 - warmup_cap_frac2` of warmup — the
    warmup-wall-optimal schedule measured in PERF.md ("Warmup anatomy").
    """
    if n_adapts is None:
        n_adapts = min(n_samples // 10, 1000)
    if adaptor.kind == NONE:
        n_adapts = 0
        if drop_warmup:
            raise ValueError("cannot drop warmup without adaptation")

    spec = SampleSpec(
        target=target, kernel=kernel, adaptor=adaptor,
        cross_chain=cross_chain, coupled=coupled,
    )

    init_theta = jnp.asarray(init_theta)
    n_chains_total = (init_theta.shape[0] if init_theta.ndim > 1
                      else (n_chains or 1))
    use_fanout = 0 < warmup_chains < n_chains_total and n_adapts > 0
    if use_fanout:
        if not cross_chain:
            raise ValueError(
                "warmup_chains requires cross_chain=True (the fanned-out "
                "pool reuses the SHARED adaptation state)")
        if not drop_warmup:
            raise ValueError(
                "warmup_chains requires drop_warmup=True (warmup draws "
                "have the warmup pool's chain axis and cannot be "
                "concatenated with the fanned-out draw phase)")
        theta_w = (init_theta[:warmup_chains] if init_theta.ndim > 1
                   else init_theta)
        state = init_state(key, spec, metric, theta_w, init_eps,
                           warmup_chains if init_theta.ndim == 1 else None,
                           init_mass_matrix=init_mass_matrix)
    else:
        state = init_state(key, spec, metric, init_theta, init_eps, n_chains,
                           init_mass_matrix=init_mass_matrix)

    if mesh is not None:
        # Shard the chain axis over the device mesh; XLA partitions the whole
        # scan and inserts ICI collectives for cross-chain reductions.
        from .parallel.mesh import shard_hmc_state

        state = shard_hmc_state(state, mesh, per_chain_adapt=not cross_chain)

    def _finish_warmup(state):
        """Fan the warmed sub-pool out + decorrelate (no-op without
        warmup_chains); runs between the warmup and draw phases."""
        if not use_fanout:
            return state
        state = fanout_warmup_state(spec, state, n_chains_total)
        if mesh is not None:
            from .parallel.mesh import shard_hmc_state as _shard

            state = _shard(state, mesh, per_chain_adapt=not cross_chain)
        n_dec = int(fanout_decorrelate)
        if n_dec > 0:
            if (isinstance(kernel.trajectory.criterion,
                           DynamicTerminationCriterion) and not coupled):
                state, _, _ = fused_draw_phase(
                    spec, state, n_dec, n_dec,
                    chain_chunks=fuse_chain_chunks, pair=fuse_pair)
            else:
                f0 = jax.tree_util.tree_map(
                    lambda a: jnp.broadcast_to(
                        a[n_adapts:n_adapts + 1],
                        (n_dec,) + a.shape[1:]), flags)
                state, _ = jax.lax.scan(
                    lambda s, fl: (sample_step(spec, s, fl)[0], None),
                    state, f0)
        return state

    flags = adapt_flags(adaptor, n_adapts, n_samples)

    def _progress_cb(iteration, stats):
        # live stat display ≅ HMCProgressCallback (ref abstractmcmc.jl:221-291):
        # phase, acceptance, step size, divergence fraction, tree depth,
        # log density / energy, and a mass-matrix summary
        i = int(iteration)
        phase = "warmup" if i <= n_adapts else "sample"
        parts = [
            f"[advancedhmc_tpu] {phase} {i}/{n_samples}",
            f"accept {float(jnp.mean(stats['acceptance_rate'])):.3f}",
            f"eps {float(jnp.mean(stats['step_size'])):.2e}",
            f"div {float(jnp.mean(stats['numerical_error'])):.3f}",
        ]
        if "tree_depth" in stats:
            parts.append(f"depth {float(jnp.mean(stats['tree_depth'])):.1f}")
        if "log_density" in stats:
            parts.append(f"logp {float(jnp.mean(stats['log_density'])):.4g}")
        if "hamiltonian_energy" in stats:
            parts.append(
                f"E {float(jnp.mean(stats['hamiltonian_energy'])):.4g}")
        if "mm_diag" in stats:
            d = stats["mm_diag"]
            parts.append(
                "M⁻¹ [{:.2g}..{:.2g}] μ {:.2g}".format(
                    float(jnp.min(d)), float(jnp.max(d)), float(jnp.mean(d)))
            )
        print(" | ".join(parts), flush=True)

    def _maybe_progress(new_state, stats):
        # ≅ the reference's ProgressMeter + divergence display
        # (/root/reference/src/sampler.jl:95-103,195-218)
        if progress:
            import jax.experimental

            payload = _progress_payload(stats, new_state.metric)
            jax.lax.cond(
                new_state.iteration % progress_every == 0,
                lambda: jax.experimental.io_callback(
                    _progress_cb, None,
                    new_state.iteration,
                    payload,
                    ordered=True,
                ),
                lambda: None,
            )

    def step_collect(state, per_iter_flags):
        new_state, stats = sample_step(spec, state, per_iter_flags)
        _maybe_progress(new_state, stats)
        return new_state, (new_state.z.theta, stats)

    def step_stats_only(state, per_iter_flags):
        new_state, stats = sample_step(spec, state, per_iter_flags)
        _maybe_progress(new_state, stats)
        return new_state, stats

    warmup_stats = None
    n_draw_steps = n_samples - n_adapts
    online = collect == "online"
    if collect not in ("draws", "online"):
        raise ValueError("collect must be 'draws' or 'online'")
    if thin > 1:
        if online:
            raise ValueError("thin > 1 is redundant with collect='online'")
        if n_adapts > 0 and not drop_warmup:
            raise ValueError("thin > 1 requires drop_warmup=True "
                             "(warmup draws are never thinned)")
        if n_draw_steps % thin:
            raise ValueError("thin must divide the number of draw steps")
    if online and n_adapts > 0 and not drop_warmup:
        raise ValueError("collect='online' requires drop_warmup=True")
    dynamic = isinstance(kernel.trajectory.criterion, DynamicTerminationCriterion)
    use_fused = (
        fuse_draws > 1
        and dynamic
        and not coupled
        and n_draw_steps > 0
        and n_draw_steps % fuse_draws == 0
        and (thin == 1 or fuse_draws % thin == 0)
    )
    from .metrics import (
        DenseEuclideanMetric,
        DiagEuclideanMetric,
        UnitEuclideanMetric,
    )

    use_fused_warmup = (
        fuse_warmup
        and dynamic
        and not coupled
        and not cross_chain
        and n_adapts > 0
        and (
            (adaptor.uses_mm
             and isinstance(metric, DiagEuclideanMetric)
             and adaptor.mm_kind in ("welford_var", "nutpie"))
            or (adaptor.uses_mm
                and isinstance(metric, DenseEuclideanMetric)
                and adaptor.mm_kind == "welford_cov")
            or (not adaptor.uses_mm
                and isinstance(metric, (DiagEuclideanMetric,
                                        UnitEuclideanMetric,
                                        DenseEuclideanMetric)))
        )
    )
    use_fused_warmup_cc = (
        fuse_warmup
        and dynamic
        and not coupled
        and cross_chain
        and n_adapts > 0
        and adaptor.mm_kind != "nutpie"
        and n_adapts % fuse_warmup_block == 0
    )

    # --- fast warmup: depth-capped early phase (+ optional eps re-anchor) ---
    use_depth_cap = (
        warmup_depth_cap is not None
        and dynamic
        and cross_chain
        and n_adapts > 0
        and warmup_depth_cap < kernel.trajectory.criterion.max_depth
        and (use_fused_warmup_cc or (drop_warmup and not use_fused_warmup))
    )
    if use_depth_cap:
        import dataclasses as _dc

        _crit_c = _dc.replace(kernel.trajectory.criterion,
                              max_depth=int(warmup_depth_cap))
        _spec_capped = dataclasses.replace(
            spec, kernel=kernel.replace(
                trajectory=kernel.trajectory.replace(criterion=_crit_c)
            )
        )
        _round = fuse_warmup_block if use_fused_warmup_cc else 1
        n_cap = int(n_adapts * warmup_cap_frac) // _round * _round
        n_cap = max(_round, min(n_cap, n_adapts))
        if warmup_eps_research and n_cap >= n_adapts:
            raise ValueError(
                "warmup_eps_research needs a full-depth phase after the "
                "switch (warmup_cap_frac < 1); the dual-averaging re-anchor "
                "transient must be absorbed before finalize"
            )
        # 3-phase: keep the cap through [n_cap, n_cap2) after the re-anchor
        if warmup_cap_frac2 is not None:
            if warmup_cap_frac2 <= warmup_cap_frac:
                raise ValueError(
                    "warmup_cap_frac2 must exceed warmup_cap_frac (it is "
                    "the end of the EXTENDED capped phase)"
                )
            n_cap2 = int(n_adapts * warmup_cap_frac2) // _round * _round
            n_cap2 = max(n_cap, min(n_cap2, n_adapts))
            if n_cap2 >= n_adapts:
                raise ValueError(
                    "warmup_cap_frac2 must leave a full-depth tail "
                    "(< 1) so dual averaging finalizes on full trajectories"
                )
        else:
            n_cap2 = n_cap
    else:
        if warmup_cap_frac2 is not None:
            raise ValueError(
                "warmup_cap_frac2 requires an active depth-capped warmup "
                "(warmup_depth_cap < max_depth with cross-chain dynamic "
                "adaptation); without it the 3-phase schedule would be "
                "silently ignored")
        n_cap = n_cap2 = 0
        _spec_capped = spec

    def _eps_reanchor(state):
        """Re-run the init step-size search on the window-adapted metric and
        re-anchor dual averaging there (see `sample` docstring). The search
        result overestimates the full-trajectory equilibrium — exactly what
        Stan's mu = log(10·ε) shrinkage anchor needs (anchoring AT the
        equilibrium makes the first iterates jump toward 10× the anchor;
        PERF.md "Warmup anatomy")."""
        from .adaptation.stepsize import DualAveragingState as _DAS

        h_now = Hamiltonian(metric=state.metric, target=spec.target,
                            kinetic=spec.kinetic)
        k_eps = jax.random.fold_in(state.key, 0x5e4c)
        eps_new = jax.jit(find_good_stepsize)(k_eps, h_now, state.z.theta[0])
        return state.replace(
            adapt=state.adapt.replace(da=_DAS.init(eps_new))
        )

    if online:
        from .diagnostics import online_init, online_summary, online_update

        n_chains_eff = n_chains_total  # full pool (post-fanout) chain count
        om0 = online_init(n_chains_eff, target.dim, online_lags,
                          state.z.theta.dtype)

        def step_online(carry, per_iter_flags):
            st, om = carry
            new_state, stats = sample_step(spec, st, per_iter_flags)
            _maybe_progress(new_state, stats)
            return (new_state, online_update(om, new_state.z.theta)), stats

    def run_draws(state):
        """Draw phase honoring fused/thin/online; returns
        (state, thetas|None, stats, online_moments|None)."""
        draw_flags = jax.tree_util.tree_map(lambda a: a[n_adapts:], flags)
        fused_cb = _progress_cb if progress else None
        if use_fused and online:
            return fused_draw_phase(spec, state, n_draw_steps, fuse_draws,
                                    online_om=om0, progress_cb=fused_cb,
                                    chain_chunks=fuse_chain_chunks,
                                    pair=fuse_pair)
        if use_fused:
            state, thetas, stats = fused_draw_phase(
                spec, state, n_draw_steps, fuse_draws, thin,
                progress_cb=fused_cb, chain_chunks=fuse_chain_chunks,
                pair=fuse_pair,
            )
            return state, thetas, stats, None
        if online:
            (state, om), stats = jax.lax.scan(
                step_online, (state, om0), draw_flags
            )
            return state, None, stats, om
        if thin > 1:
            n_out = n_draw_steps // thin
            blocks = jax.tree_util.tree_map(
                lambda a: a.reshape((n_out, thin) + a.shape[1:]), draw_flags
            )

            def outer(st, fb):
                st, (th, s) = jax.lax.scan(step_collect, st, fb)
                th, s = _thin_block(th, s, thin)
                return st, (th[0], {k: v[0] for k, v in s.items()})

            state, (thetas, stats) = jax.lax.scan(outer, state, blocks)
            return state, thetas, stats, None
        state, (thetas, stats) = jax.lax.scan(step_collect, state, draw_flags)
        return state, thetas, stats, None

    if verbose:
        # surface silent fallbacks (correctness-preserving, but the user
        # asked for the fast path and should know they didn't get it)
        if fuse_warmup and n_adapts > 0 and not (
            use_fused_warmup or use_fused_warmup_cc
        ):
            print("[advancedhmc_tpu] note: fuse_warmup requested but the "
                  "configuration is unsupported (criterion/metric/adaptor "
                  "combination) — using the synchronised scan warmup")
        if fuse_draws > 1 and n_draw_steps > 0 and not use_fused:
            print("[advancedhmc_tpu] note: fuse_draws requested but unused "
                  "(requires a dynamic criterion, uncoupled chains, and "
                  "fuse_draws | draw count) — using the scan draw phase")
        if warmup_depth_cap is not None and not use_depth_cap:
            print("[advancedhmc_tpu] note: warmup_depth_cap requested but "
                  "unsupported here (requires cross-chain adaptation, a "
                  "dynamic criterion, a cap below max_depth, and either "
                  "fused cross-chain warmup or drop_warmup) — running the "
                  "standard warmup")

    om_final = None
    if use_fused_warmup or use_fused_warmup_cc:
        # adaptation inside/around the fused loop (per-chain: reference
        # semantics at chain-local boundaries; cross-chain: block-replayed),
        # async lanes; draws follow fused or scan per fuse_draws.
        if use_fused_warmup_cc and use_depth_cap:
            warm_flags_all = jax.tree_util.tree_map(
                lambda a: a[:n_adapts], flags
            )
            # phase boundaries: [0, n_cap) capped → eps re-anchor →
            # [n_cap, n_cap2) still capped (3-phase) → [n_cap2, n_adapts)
            # full depth
            bounds = sorted({0, n_cap, n_cap2, n_adapts})
            th_segs, st_segs = [], []
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                if warmup_eps_research and lo == n_cap and n_cap < n_adapts:
                    state = _eps_reanchor(state)
                fl_seg = jax.tree_util.tree_map(
                    lambda a: a[lo:hi], warm_flags_all
                )
                state, th_s, st_s = fused_warmup_phase_crosschain(
                    _spec_capped if hi <= n_cap2 else spec, state,
                    hi - lo, fuse_warmup_block, flags=fl_seg,
                    pair=fuse_pair, chain_chunks=fuse_chain_chunks,
                    progress_cb=_progress_cb if progress else None,
                )
                th_segs.append(th_s)
                st_segs.append(st_s)
            if len(th_segs) == 1:
                warm_thetas, warm_stats = th_segs[0], st_segs[0]
            else:
                warm_thetas = jnp.concatenate(th_segs, axis=0)
                st_last = st_segs[-1]
                warm_stats = {
                    k: jnp.concatenate(
                        [s[k].astype(st_last[k].dtype) for s in st_segs],
                        axis=0,
                    )
                    for k in st_last
                }
        elif use_fused_warmup_cc:
            state, warm_thetas, warm_stats = fused_warmup_phase_crosschain(
                spec, state, n_adapts, fuse_warmup_block, pair=fuse_pair,
                chain_chunks=fuse_chain_chunks,
                progress_cb=_progress_cb if progress else None,
            )
        else:
            state, warm_thetas, warm_stats = fused_warmup_phase(
                spec, state, n_adapts, pair=fuse_pair
            )
        if drop_warmup:
            warmup_stats = warm_stats if collect_warmup_stats else None
            warm_thetas = None
        state = _finish_warmup(state)
        state, thetas, stats, om_final = run_draws(state)
        if not drop_warmup:
            thetas = jnp.concatenate([warm_thetas, thetas], axis=0)
            stats = {
                k: jnp.concatenate(
                    [warm_stats[k].astype(stats[k].dtype), stats[k]], axis=0
                )
                for k in stats
            }
    elif n_adapts > 0 and drop_warmup:
        warm_flags = jax.tree_util.tree_map(lambda a: a[:n_adapts], flags)

        def _warm_step(spec_w):
            if collect_warmup_stats:
                def f(s, fl):
                    new_s, st = sample_step(spec_w, s, fl)
                    _maybe_progress(new_s, st)
                    return new_s, st
            else:
                def f(s, fl):
                    return sample_step(spec_w, s, fl)[0], None
            return f

        if use_depth_cap:
            bounds = sorted({0, n_cap, n_cap2, n_adapts})
            ws_segs = []
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                if warmup_eps_research and lo == n_cap and n_cap < n_adapts:
                    state = _eps_reanchor(state)
                fl_seg = jax.tree_util.tree_map(
                    lambda a: a[lo:hi], warm_flags
                )
                state, ws_s = jax.lax.scan(
                    _warm_step(_spec_capped if hi <= n_cap2 else spec),
                    state, fl_seg,
                )
                ws_segs.append(ws_s)
            if not collect_warmup_stats:
                warmup_stats = None
            elif len(ws_segs) == 1:
                warmup_stats = ws_segs[0]
            else:
                ws_last = ws_segs[-1]
                warmup_stats = {
                    k: jnp.concatenate(
                        [s[k].astype(ws_last[k].dtype) for s in ws_segs],
                        axis=0,
                    )
                    for k in ws_last
                }
        else:
            warm_step = _warm_step(spec)
            state, warmup_stats = jax.lax.scan(warm_step, state, warm_flags)
        state = _finish_warmup(state)
        state, thetas, stats, om_final = run_draws(state)
    elif use_fused:
        if n_adapts > 0:
            warm_flags = jax.tree_util.tree_map(lambda a: a[:n_adapts], flags)
            state, (warm_thetas, warm_stats) = jax.lax.scan(
                step_collect, state, warm_flags
            )
        state, thetas, stats, om_final = run_draws(state)
        if n_adapts > 0:
            thetas = jnp.concatenate([warm_thetas, thetas], axis=0)
            stats = {
                k: jnp.concatenate(
                    [warm_stats[k].astype(stats[k].dtype), stats[k]], axis=0
                )
                for k in stats
            }
    elif online or thin > 1:
        # (n_adapts == 0 here — validated above when warmup is kept)
        state, thetas, stats, om_final = run_draws(state)
    else:
        state, (thetas, stats) = jax.lax.scan(step_collect, state, flags)

    result = SampleResult(
        thetas=thetas, stats=stats, warmup_stats=warmup_stats,
        final_state=state,
        online=online_summary(om_final) if om_final is not None else None,
        target=target,
    )
    if verbose:
        # end-of-run EBFMI / acceptance report ≅ sampler.jl:229-246
        from .diagnostics import summarize

        summarize(result, verbose=True)
    return result
