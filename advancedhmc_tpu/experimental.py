"""Measured-but-not-adopted performance experiments, quarantined.

Every knob here was implemented, tested bit-exact, and benchmarked on TPU
hardware — and LOST (or broke even) at the bench operating point, so none
is part of the production call signatures. They remain supported because
the measurements are shape-dependent and other operating points may differ
(PERF.md records the full evidence per experiment):

- ``pack_carry`` — pack the ~29 per-chain while-loop scalar fields into one
  wide array ("fc" field-major / "cf" chain-major). 0.85× at bench shape:
  the unpack/repack ops cost more than the wide-store saving (PERF.md
  "Packed while-loop carry").
- ``stage_slots`` — segmented draw collection: move the (C, fuse, D) output
  buffers out of the per-leaf carry into an outer loop with (C, NS, D)
  staging registers. Slower at bench shape (segment-boundary full-carry
  repacks; PERF.md "Segmented draw collection").
- ``out_dtype`` — bfloat16 draw buffers. The f32↔bf16 conversions cost more
  than the saved VMEM bytes in the issue-limited loop (PERF.md).
- ``fused_draw_phase_ragged`` — variable-draws-per-chain collection. The
  idle-lane headroom shrinks with block length while the buffer-select
  cost grows with it; no crossover wins (PERF.md "Ragged collection").
- ``Trajectory(stack_dtype=..., uturn_precision=...)`` (fields on the
  production Trajectory config, documented here): checkpoint-stack storage
  dtype and U-turn-check precision overrides — both neutral-to-slower
  because XLA's bf16 propagation already stores the stacks in bf16
  (PERF.md "the VMEM discovery").

Use ``Experimental`` to opt in through the public draw API::

    from advancedhmc_tpu.experimental import Experimental
    fused_draw_phase(spec, state, n, fuse,
                     experimental=Experimental(pack_carry="fc"))
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Experimental:
    """Opt-in experimental knobs for `fused_draw_phase` (see module doc).

    Combinations that would silently shadow each other raise in
    `nuts_transitions_fused` (pack_carry × stage_slots).
    """

    out_dtype: object = None
    stage_slots: int = 0
    pack_carry: str = ""


def fused_draw_phase_ragged(spec, state, t_max: int, t_min: int,
                            out_dtype=None):
    """ONE variable-draws-per-chain fused dispatch (draw phase only).

    Every chain completes at least `t_min` transitions; chains that finish
    early KEEP sampling — up to the `t_max` buffer capacity — instead of
    idling until the slowest chain catches up. The dispatch wall is the same
    as a rectangular `t_min`-transition block (set by the slowest chain),
    but the idle-lane time of the rectangular layout becomes extra draws,
    so collected-draws/second rises by the idle factor (the remaining draw-
    phase utilisation headroom measured in PERF.md). Beyond the reference
    (its matrix mode is static-trajectory, synchronous per step).

    Measured SLOWER than the rectangular default at every block length at
    bench shape (PERF.md "Ragged collection") — kept as the scaffold for
    future non-rectangular collection schemes.

    Returns (new_state, thetas (C, t_max, dim), counts (C,), stats) — chain
    c's draws are rows [0, counts[c]); stats leaves are (C, t_max) zero-
    filled past the count. Pooled statistics MUST weight by `counts` (draw
    counts correlate with the chain's local tree size, so equal-weight
    pooling over the raw buffer would bias toward small-tree regions);
    `diagnostics.effective_sample_size_ragged` is the matching ESS
    estimator. `new_state.iteration` advances by `t_min` (the guaranteed
    common count).
    """
    from .hamiltonian import FullMomentumRefreshment, Hamiltonian
    from .metrics import DenseEuclideanMetric as _Dense
    from .metrics import DiagEuclideanMetric as _Diag
    from .metrics import UnitEuclideanMetric as _Unit
    from .nuts import nuts_transitions_fused
    from .termination import DynamicTerminationCriterion

    per_chain = not spec.cross_chain
    if not (1 <= t_min < t_max):
        raise ValueError("need 1 <= t_min < t_max")
    if not isinstance(spec.kernel.refreshment, FullMomentumRefreshment):
        raise ValueError("variable-draws collection requires full momentum "
                         "refreshment")
    if not isinstance(spec.kernel.trajectory.criterion,
                      DynamicTerminationCriterion):
        raise ValueError("variable-draws collection requires a dynamic "
                         "(NUTS) termination criterion")
    if per_chain and not isinstance(state.metric, (_Diag, _Unit, _Dense)):
        raise ValueError("per-chain variable-draws collection supports "
                         "unit/diag/dense metrics (batch-explicit loop)")
    if spec.coupled:
        raise ValueError("variable-draws collection is incompatible with "
                         "coupled chains (chains desync by construction)")

    n_chains = state.z.theta.shape[0]
    key, k_step = jax.random.split(state.key)
    keys = jax.random.split(k_step, n_chains)
    if per_chain:
        eps_c = state.adapt.da.eps                        # (C,)
        if isinstance(state.metric, (_Diag, _Dense)):
            metric_t = jax.tree_util.tree_map(lambda x: x[0], state.metric)
            metric_b = state.metric
        else:
            metric_t, metric_b = state.metric, None
        eps_t, eps_b = eps_c[0], eps_c
    else:
        metric_t, metric_b = state.metric, None
        eps_t, eps_b = state.adapt.da.eps, None
    h = Hamiltonian(metric=metric_t, target=spec.target, kinetic=spec.kinetic)
    integ = spec.kernel.trajectory.integrator.with_nom_step_size(eps_t)
    traj = spec.kernel.trajectory.replace(integrator=integ)
    z_last, ths, stats, counts = nuts_transitions_fused(
        keys, h, traj, state.z, t_max, spec.kernel.refreshment,
        out_dtype=out_dtype, batched=True, metric_batch=metric_b,
        eps_batch=eps_b, t_min=t_min,
    )
    stats["is_adapt"] = jnp.zeros_like(stats["numerical_error"])
    new_st = state.replace(iteration=state.iteration + t_min, z=z_last,
                           key=key)
    return new_st, ths, counts, stats
