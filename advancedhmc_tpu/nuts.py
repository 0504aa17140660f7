"""NUTS: iterative tree doubling under `lax.while_loop` (vmappable).

TPU-native redesign of the recursive `build_tree`/`transition` pair at
/root/reference/src/trajectory.jl:626-742. The recursion is flattened into a
single bounded while-loop that takes ONE leapfrog step per iteration and runs
the doubling bookkeeping in O(max_depth) masked arithmetic, so the whole
sampler is `vmap`-able across thousands of chains — the capability the
reference lacks (its NUTS is scalar-chain only, trajectory.jl:677).

Semantics preserved from the recursion (see SURVEY.md §3.4):

* left-to-right leaf visit order within a doubling (direction decides which
  side extends), with early exit after the first leaf that triggers
  divergence or a completed-subtree U-turn;
* U-turn checks at exactly the aligned power-of-two subtrees the recursion
  checks: when visit-leaf i is added and i has t trailing one-bits, the
  subtrees of sizes 2¹..2^t ending at i are checked;
* all three criteria — Classic (position-based, trajectory.jl:551-557),
  Generalised (ρ-based, :566-570), StrictGeneralised (+left/right half-tree
  checks, :579-613) — with correct tree-order orientation for backward
  builds;
* per-leaf divergence checks (:500-507), slice/multinomial leaf samplers and
  their unbiased in-subtree combines (:144-200), biased progressive sampling
  at the top level (:202-206,708-713), unconditional top-level tree combine
  (:714-722), and the full transition-stat set (:726-739).

The recursion's O(log L) stack of subtree states becomes two fixed-size
checkpoint stacks indexed by trailing-zero counts:

* even-visit leaves store (θ, r, M⁻¹r, within-subtree momentum cumsum) at
  slot tz(i)−1 (the top slot for i=0) — each slot provably survives until
  its last reader. tz ≥ 1 for every even index, so the stacks hold only
  max_depth−1 rows;
* odd-visit leaves store (r, M⁻¹r) at slot tz(i+1)−1 — read back as the
  mid-boundary of strict sub-checks (spans of size ≥ 4).

Velocities (M⁻¹r, the reference's ∂H∂r) are computed once per leaf and cached
in the stacks, so each U-turn check is a handful of dot products.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .hamiltonian import Hamiltonian, PhasePoint
from .integrators import leapfrog_step
from .metrics import DiagEuclideanMetric, UnitEuclideanMetric
from .termination import (
    MULTINOMIAL,
    SLICE,
    ClassicNoUTurn,
    DynamicTerminationCriterion,
    GeneralisedNoUTurn,
    StrictGeneralisedNoUTurn,
)
from .utils import maxabs, rand_exponential, rand_sign, trailing_ones, trailing_zeros


def _where_z(pred, a: PhasePoint, b: PhasePoint) -> PhasePoint:
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _uturn_generalised(rho, vel_a, vel_b):
    """dot(ρ, v⁻) ≤ 0 or dot(ρ, v⁺) ≤ 0 (ref trajectory.jl:615-617)."""
    return (jnp.dot(rho, vel_a) <= 0) | (jnp.dot(rho, vel_b) <= 0)


def _uturn_classic(dtheta_tree, vel_l, vel_r):
    """Classic H&G criterion in tree order (ref trajectory.jl:551-557).

    Terminated when dot(Δθ, v_left) ≤ 0 or dot(Δθ, v_right) ≤ 0 with
    Δθ = θ_right - θ_left (the reference's sign-flipped `>= 0` form).
    """
    return (jnp.dot(dtheta_tree, vel_l) <= 0) | (jnp.dot(dtheta_tree, vel_r) <= 0)


def nuts_transition(key, h: Hamiltonian, traj, z0: PhasePoint,
                    force_directions=None, return_debug=False,
                    coupled_key=None, _return_machinery=False,
                    _adaptive_metric=False, _slim_candidates=False,
                    _traced_cap=False, _pair=False):
    """One NUTS transition; returns (z_next, stats dict).

    `traj` is a Trajectory whose criterion is a DynamicTerminationCriterion and
    whose ts_kind is 'multinomial' or 'slice'.

    Test hooks: `force_directions` (max_depth,) array of ±1 overrides the
    per-doubling direction draw (used by the recursion-oracle tests);
    `return_debug` additionally returns the final loop state.
    """
    criterion = traj.criterion
    assert isinstance(criterion, DynamicTerminationCriterion)
    ts = traj.ts_kind
    integ = traj.integrator
    max_depth = int(criterion.max_depth)
    is_classic = isinstance(criterion, ClassicNoUTurn)
    is_strict = isinstance(criterion, StrictGeneralisedNoUTurn)
    # Unit/diag metrics recompute M⁻¹r from checkpointed r at check time
    # instead of carrying velocity stacks (cuts hot-loop carry traffic ~1/3).
    cheap_vel = isinstance(h.metric, (UnitEuclideanMetric, DiagEuclideanMetric))
    dense_in_state = False
    if _adaptive_metric:
        from .metrics import DenseEuclideanMetric as _DenseEM

        dense_in_state = isinstance(h.metric, _DenseEM)
        assert isinstance(h.metric, DiagEuclideanMetric) or dense_in_state, (
            "metric-in-state supports the diagonal and dense metrics"
        )

    slim = _slim_candidates

    def _cand(z, h_val):
        """Candidate record. Slim mode (fused full-refresh draws) drops the
        momentum and caches the energy instead: the candidate's r is never
        consumed there (refresh resamples it), so carrying it is pure HBM
        carry traffic (~2 D-vectors/chain/leaf)."""
        if slim:
            return dict(theta=z.theta, ld=z.logdensity, grad=z.grad, h=h_val)
        return z

    dim = z0.theta.shape[-1]
    dtype = z0.theta.dtype
    h0 = z0.energy()
    delta_max = jnp.asarray(criterion.delta_max, dtype=jnp.result_type(h0))
    eps = integ.current_step_size

    key, key_slice = jax.random.split(key)
    if ts == SLICE:
        # ℓu = -H0 - Exp(1)  (ref trajectory.jl:144-145)
        lu = -h0 - rand_exponential(key_slice, dtype=jnp.result_type(h0))
        top_w0 = jnp.asarray(1.0, dtype)   # n = 1 acceptable candidate (root)
        sub_w0 = jnp.asarray(0.0, dtype)
    else:
        lu = jnp.zeros_like(h0)
        top_w0 = jnp.asarray(0.0, dtype)   # ℓw = 0 (ref trajectory.jl:155)
        sub_w0 = jnp.asarray(-jnp.inf, dtype)

    zeros_d = jnp.zeros((dim,), dtype)
    sdtype = (jnp.dtype(traj.stack_dtype)
              if getattr(traj, "stack_dtype", None) else dtype)
    # Slot 0 of a max_depth-sized stack is provably never used: even-leaf
    # slots are tz(i) ≥ 1, odd-leaf slots are tz(i+1) ≥ 1, and i=0 maps to
    # the top slot. Stacks therefore hold max_depth-1 rows with every slot
    # index shifted down by one — the stacks are the dominant per-leaf HBM
    # carry traffic, so the dropped row is a direct ~1/max_depth saving.
    n_slots = max(1, max_depth - 1)
    stack = jnp.zeros((n_slots, dim), sdtype)
    edtype = jnp.result_type(h0)

    def fresh_fields(z_init, h0_init, lu_init, m_inv=None):
        """Per-transition tree/subtree fields for a fresh transition starting
        at z_init. Checkpoint stacks are intentionally excluded: every slot is
        written before it is read within a new doubling. `m_inv` overrides the
        velocity metric for the in-loop-adaptation path."""
        if cheap_vel:
            # tree-edge velocities are recomputed from the edges' r at use
            # time (one elementwise multiply) instead of carried — cuts three
            # D-vectors of per-leaf carry traffic.
            v_init = jnp.zeros((), dtype)
        elif m_inv is None:
            v_init = h.velocity_z(z_init)
        elif jnp.ndim(m_inv) == 2:
            v_init = m_inv @ z_init.r
        else:
            v_init = z_init.r * m_inv
        return dict(
            h0=h0_init,
            lu=lu_init,
            t_zleft=z_init,
            t_zright=z_init,
            t_vleft=v_init,
            t_vright=v_init,
            t_rho=z_init.r,
            zcand=_cand(z_init, h0_init),
            t_w=top_w0,
            sum_alpha=jnp.asarray(0.0, dtype),
            n_alpha=jnp.asarray(0, jnp.int32),
            dh_max=jnp.asarray(0.0, edtype),
            depth=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverged=jnp.asarray(False),
            done=jnp.asarray(False),
            v=jnp.asarray(1, jnp.int32),
            leaf=jnp.asarray(0, jnp.int32),
            z_edge=z_init,
            s_zfirst=z_init,
            s_vfirst=v_init,
            s_rho=zeros_d,
            s_w=sub_w0,
            s_zcand=_cand(z_init, h0_init),
            s_sum_alpha=jnp.asarray(0.0, dtype),
            s_n_alpha=jnp.asarray(0, jnp.int32),
            s_dh_max=jnp.asarray(0.0, edtype),
            s_turning=jnp.asarray(False),
            s_diverged=jnp.asarray(False),
        )

    state = dict(
        key=key,
        eps=eps * jnp.ones((), dtype),
        # traced per-transition depth cap (≤ static max_depth): binding it is
        # EXACTLY equivalent to a max_depth=cap criterion — `done` stops new
        # doublings; the statically-sized stacks/span checks are a superset
        # whose extra rows simply stay unused. Used by the transient-gated
        # warmup schedule (fused warmup; PERF.md "Warmup anatomy").
        **({"cap": jnp.asarray(max_depth, jnp.int32)} if _traced_cap else {}),
        m_inv=(h.metric.m_inv if _adaptive_metric else jnp.zeros((), dtype)),
        # dense metric-in-state also carries the (frozen) Cholesky factor —
        # never updated in the loop, read only for boundary momentum draws
        chol_u=(h.metric.chol_u if dense_in_state else jnp.zeros((), dtype)),
        # --- checkpoint stacks (unused ones collapse to scalars) ---
        ck_theta=stack if is_classic else jnp.zeros((), dtype),
        ck_r=stack,
        ck_vel=jnp.zeros((), dtype) if cheap_vel else stack,
        # Generalised stores the DIFFERENCE row r_a − cum_a here (the only
        # combination its span dots need); Strict stores cum_a = Σr itself.
        # Classic never reads it (position-based criterion) → collapsed.
        ck_cum=jnp.zeros((), dtype) if is_classic else stack,
        ck_odd_r=stack if is_strict else jnp.zeros((), dtype),
        ck_odd_vel=stack if (is_strict and not cheap_vel) else jnp.zeros((), dtype),
        # scalar stacks for the expanded span dots (non-strict criteria):
        # generalised stores dot(r_a − cum_a, vel_a) at write time (sck_ad),
        # classic stores dot(θ_a, vel_a) (sck_tv)
        sck_ad=(jnp.zeros((n_slots,), dtype)
                if not (is_strict or is_classic) else jnp.zeros((), dtype)),
        sck_tv=(jnp.zeros((n_slots,), dtype)
                if is_classic else jnp.zeros((), dtype)),
        **fresh_fields(z0, h0, lu),
    )

    if _return_machinery:
        # internal hook for nuts_transitions_fused: expose the loop pieces
        pass

    def cond(st):
        return jnp.logical_not(st["done"])

    def body(st):
        key, k_dir, k_res, k_mh = jax.random.split(st["key"], 4)
        start = st["leaf"] == 0
        eps = st["eps"]
        h0 = st["h0"]
        lu = st["lu"]
        if dense_in_state:
            from .metrics import DenseEuclideanMetric as _DnEM

            h_loc = h.replace(metric=_DnEM(m_inv=st["m_inv"],
                                           chol_u=st["chol_u"]))
        elif _adaptive_metric:
            from .metrics import DiagEuclideanMetric as _DEM

            h_loc = h.replace(metric=_DEM(m_inv=st["m_inv"],
                                          sqrt_m_inv=jnp.sqrt(st["m_inv"])))
        else:
            h_loc = h

        # --- begin a new doubling: draw direction, pick edge, reset subtree ---
        if force_directions is None and coupled_key is not None:
            # shared doubling direction across vmapped chains
            # (`rand_coupled` semantics, ref utilities.jl:39-47)
            v_draw = rand_sign(jax.random.fold_in(coupled_key, st["depth"]))
        elif force_directions is None:
            v_draw = rand_sign(k_dir)
        else:
            v_draw = jnp.asarray(force_directions, jnp.int32)[
                jnp.minimum(st["depth"], max_depth - 1)
            ]
        v = jnp.where(start, v_draw, st["v"])
        fwd = v > 0
        z_start_edge = _where_z(fwd, st["t_zright"], st["t_zleft"])
        z_edge = _where_z(start, z_start_edge, st["z_edge"])
        s_rho = jnp.where(start, zeros_d, st["s_rho"])
        s_w = jnp.where(start, sub_w0, st["s_w"])
        s_sum_alpha = jnp.where(start, 0.0, st["s_sum_alpha"])
        s_n_alpha = jnp.where(start, 0, st["s_n_alpha"])
        s_dh_max = jnp.where(start, 0.0, st["s_dh_max"])
        s_turning = jnp.where(start, False, st["s_turning"])
        s_diverged = jnp.where(start, False, st["s_diverged"])

        # --- one leapfrog step in direction v (ref base case, :638-647) ---
        eps_signed = eps * v.astype(dtype)
        z_new = integ.step(h_loc, z_edge, eps_signed)
        vel_new = h_loc.velocity_z(z_new)
        h_new = z_new.energy()
        dh = h_new - h0
        alpha_leaf = jnp.exp(jnp.minimum(jnp.zeros_like(dh), -dh))
        alpha_leaf = jnp.where(jnp.isnan(alpha_leaf), 0.0, alpha_leaf)

        i = st["leaf"]

        # --- leaf sampler statistics ---
        if ts == SLICE:
            leaf_n = (lu <= -h_new).astype(dtype)  # ref :164-166
            new_sw = s_w + leaf_n
            u = jax.random.uniform(k_res, dtype=dtype)
            take = (new_sw * u >= s_w) & (leaf_n > 0)  # reservoir ≡ combine :178-183
            diverging = jnp.logical_not(lu < delta_max - h_new)  # ref :500-502
        else:
            lw_leaf = h0 - h_new  # ref :174-176
            new_sw = jnp.logaddexp(s_w, lw_leaf)
            u = jax.random.uniform(k_res, dtype=dtype)
            take = jnp.log(u) < lw_leaf - new_sw  # reservoir ≡ combine :191-195
            diverging = jnp.logical_not(-h0 < delta_max - h_new)  # ref :503-507
        s_w = new_sw  # subtree weight now includes the current leaf

        s_zcand = _where_z(take, _cand(z_new, h_new), st["s_zcand"])
        s_rho = s_rho + z_new.r
        s_sum_alpha = s_sum_alpha + alpha_leaf
        s_n_alpha = s_n_alpha + 1
        s_dh_max = maxabs(s_dh_max, dh)
        s_zfirst = _where_z(start, z_new, st["s_zfirst"])
        if cheap_vel:
            # velocities not carried: recompute from the stored momenta
            s_vfirst = jnp.where(start, vel_new,
                                 h_loc.velocity(st["s_zfirst"].r))
            t_vleft_c = h_loc.velocity(st["t_zleft"].r)
            t_vright_c = h_loc.velocity(st["t_zright"].r)
        else:
            s_vfirst = jnp.where(start, vel_new, st["s_vfirst"])
            t_vleft_c = st["t_vleft"]
            t_vright_c = st["t_vright"]

        # --- U-turn checks for completed aligned subtrees ending at leaf i ---
        ck_theta, ck_r, ck_vel, ck_cum = (
            st["ck_theta"], st["ck_r"], st["ck_vel"], st["ck_cum"],
        )
        ck_odd_r, ck_odd_vel = st["ck_odd_r"], st["ck_odd_vel"]
        sck_ad, sck_tv = st["sck_ad"], st["sck_tv"]

        # All K = max_depth-1 candidate spans are checked per leaf (masked by
        # `active`). For Classic/Generalised the span dot-products are
        # expanded algebraically so NO (K, D) span gather is materialised:
        #   dot(ρ_span, v_a) = dot(s_rho, v_a) − dot(cum_a, v_a) + dot(r_a, v_a)
        # where dot(s_rho, v_a) is a (S, D)·(D,) stack matvec and the other
        # two terms are scalars computable AT WRITE TIME (stored in (S,)
        # scalar stacks). This removed a materialised (C, K, D) intermediate
        # worth ~35% of the hot-loop wall on TPU (see PERF.md profile).
        i_even = (i % 2) == 0
        t_ones = trailing_ones(i)
        vsign = v.astype(dtype)
        ks = jnp.arange(1, max_depth, dtype=jnp.int32)           # (K,)
        spans = jnp.left_shift(jnp.int32(1), ks)
        a_s = i - spans + 1                                      # (K,)
        active_s = jnp.logical_not(i_even) & (ks <= t_ones) & (a_s >= 0)
        a_safe = jnp.maximum(a_s, 0)
        tz_a = trailing_zeros(jnp.maximum(a_safe, 1))
        slot_a = jnp.where(a_safe == 0, n_slots - 1,
                           jnp.minimum(tz_a - 1, n_slots - 1))   # (K,)
        # One-hot picks instead of jnp.take: per-chain dynamic gathers lower
        # to serialized scatters/gathers under vmap on TPU; one-hot matmuls
        # are fully parallel.
        sel_b = slot_a[:, None] == jnp.arange(n_slots)[None, :]   # (K, S)
        sel_a = sel_b.astype(dtype)
        if not is_strict:
            # Per-slot scalars via ONE fused stack matmul: all stacks are
            # concatenated into a single (nS, D) LHS against a (D, 2) RHS so
            # each stack is read exactly once per leaf (the dominant
            # HBM traffic of the check; see PERF.md profile).
            sd = ck_r.dtype
            # NOTE output orientation: (2, nS) keeps the minor dim at nS
            # (lane-friendly) — a (nS, 2) output tiles as T(2,128) with the
            # minor dim 2 padded to 128 lanes (64× inflation) and cost a
            # 13 µs/leaf reformat fusion at bench shape (PERF.md profile).
            if is_classic:
                colA = (h_loc.velocity(z_new.theta) if cheap_vel
                        else z_new.theta)
                lhsA = ck_r if cheap_vel else ck_vel
                lhs = jnp.concatenate([lhsA, ck_theta], 0)       # (2S, D)
                rhs = jnp.stack([colA, vel_new], 0).astype(sd)   # (2, D)
                prod = jnp.einsum(
                    "kd,sd->ks", rhs, lhs,
                    precision=getattr(traj, 'uturn_precision', None),
                ).astype(dtype)                 # (2, 2S)
                th_dot_va = prod[0, :n_slots]
                thck_dot_vnew = prod[1, n_slots:]
                dA_slots = vsign * (th_dot_va - sck_tv)
                dB_slots = vsign * (
                    jnp.dot(z_new.theta, vel_new) - thck_dot_vnew
                )
                dA_k = sel_a @ dA_slots                          # (K,)
                dB_k = sel_a @ dB_slots
                turn_k = (dA_k <= 0) | (dB_k <= 0)
            else:
                # Generalised: per-slot decision values from ONE augmented
                # matmul. With ck_d := r_a − cum_a stored in the ck_cum slot
                # and sck_ad := dot(ck_d_row, vel_a) stored at write time,
                #   uA[s] = dot(velocity(s_rho), r_a) + sck_ad[s]
                #         = dot(ρ_span, vel_a)            (ref :566-570)
                #   uB[s] = dot(vel_new, ck_d[s]);  dot(ρ_span, vel_new)
                #         = dot(s_rho, vel_new) + uB[s]
                # The span-k decision is a pure function of slot a(k):
                # compare per slot, then pick with the one-hot mask — the
                # prod slices feed only elementwise consumers (fused, no
                # (1, S) intermediates materialised) and there is no
                # selection matmul.
                colA = h_loc.velocity(s_rho) if cheap_vel else s_rho
                lhsA = ck_r if cheap_vel else ck_vel
                lhs = jnp.concatenate([lhsA, ck_cum], 0)         # (2S, D)
                rhs = jnp.stack([colA, vel_new], 0).astype(sd)   # (2, D)
                prod = jnp.einsum(
                    "kd,sd->ks", rhs, lhs,
                    precision=getattr(traj, 'uturn_precision', None),
                ).astype(dtype)                 # (2, 2S)
                uA = prod[0, :n_slots] + sck_ad
                uB = prod[1, n_slots:]
                srv = jnp.dot(s_rho, vel_new)
                turn_slot = (uA <= 0) | (uB <= -srv)             # (S,)
                turn_k = jnp.any(sel_b & turn_slot[None, :], axis=-1)
        else:
            r_a = sel_a @ ck_r                                    # (K, D)
            vel_a = (jax.vmap(h_loc.velocity)(r_a) if cheap_vel
                     else sel_a @ ck_vel)
            cum_a = sel_a @ ck_cum
            rho_span = s_rho[None, :] - cum_a + r_a              # (K, D)
            turn_k = (jnp.einsum("kd,kd->k", rho_span, vel_a) <= 0) | (
                rho_span @ vel_new <= 0
            )
        if is_strict:
            # mid = a + 2^{k-1} - 1 (odd); mid+1 even — both live at
            # (shifted) slot k-2, so span k = ks[j] (k = j+1) reads row
            # j-1; row 0 is duplicated as the k=1 dummy (masked below by
            # `ks >= 2`). Static indices → slices/concat, not gathers.
            import numpy as _np

            _mid_rows = _np.maximum(_np.arange(max_depth - 1) - 1, 0)
            r_m1 = ck_r[_mid_rows]
            cum_m1 = ck_cum[_mid_rows]
            r_m = ck_odd_r[_mid_rows]
            if cheap_vel:
                vel_m1 = jax.vmap(h_loc.velocity)(r_m1)
                vel_m = jax.vmap(h_loc.velocity)(r_m)
            else:
                vel_m1 = ck_vel[_mid_rows]
                vel_m = ck_odd_vel[_mid_rows]
            rho_h1 = (cum_m1 - r_m1) - cum_a + r_a               # visits a..mid
            rho_h2 = s_rho[None, :] - cum_m1 + r_m1              # visits mid+1..i
            dot = lambda x, y: jnp.einsum("kd,kd->k", x, y)
            # forward: tleft=H1, tright=H2 (ref :596-613)
            x1 = rho_h1 + r_m1
            fl = (dot(x1, vel_a) <= 0) | (dot(x1, vel_m1) <= 0)
            x2 = r_m + rho_h2
            fr = (dot(x2, vel_m) <= 0) | (x2 @ vel_new <= 0)
            # backward: tree order flips the halves
            x3 = rho_h2 + r_m
            bl = (x3 @ vel_new <= 0) | (dot(x3, vel_m) <= 0)
            x4 = r_m1 + rho_h1
            br = (dot(x4, vel_m1) <= 0) | (dot(x4, vel_a) <= 0)
            sub_turn = jnp.where(fwd, fl | fr, bl | br)
            # the k=1 half-checks coincide with the main check (leaves), but
            # x computations above are only valid for k ≥ 2: mask them out.
            sub_turn = sub_turn & (ks >= 2)
            turn_k = turn_k | sub_turn
        s_turning = s_turning | jnp.any(active_s & turn_k)
        s_diverged = s_diverged | diverging

        # --- store checkpoints (slot indices shifted down by one; slot 0 of
        # the unshifted numbering is never used — see n_slots above) ---
        tz_i = trailing_zeros(jnp.maximum(i, 1))
        slot_even = jnp.where(i == 0, n_slots - 1,
                              jnp.minimum(tz_i - 1, n_slots - 1))
        slot_odd = jnp.minimum(trailing_zeros(i + 1) - 1, n_slots - 1)

        # One-hot masked writes (vectorized; avoids per-chain scatters).
        slots = jnp.arange(n_slots)
        mask_even = ((slots == slot_even) & i_even)[:, None]          # (S, 1)
        mask_odd = ((slots == slot_odd) & jnp.logical_not(i_even))[:, None]

        if is_classic:
            ck_theta = jnp.where(
                mask_even, z_new.theta.astype(sdtype)[None, :], ck_theta
            )
        ck_r = jnp.where(mask_even, z_new.r.astype(sdtype)[None, :], ck_r)
        if not cheap_vel:
            ck_vel = jnp.where(
                mask_even, vel_new.astype(sdtype)[None, :], ck_vel
            )
        # write-time scalars for the expanded span dots: the checkpoint
        # being stored IS leaf a of future spans, so dot(r_a − cum_a, v_a)
        # and dot(θ_a, v_a) are known now.
        mask_even_s = mask_even[:, 0]
        if is_strict:
            ck_cum = jnp.where(mask_even, s_rho.astype(sdtype)[None, :],
                               ck_cum)
        elif is_classic:
            sck_tv = jnp.where(mask_even_s,
                               jnp.dot(z_new.theta, vel_new), sck_tv)
        else:
            # generalised: ck_cum slot holds the difference row
            # ck_d = r_a − cum_a (see the span-check einsum above)
            d_row = z_new.r - s_rho
            ck_cum = jnp.where(mask_even, d_row.astype(sdtype)[None, :],
                               ck_cum)
            sck_ad = jnp.where(mask_even_s,
                               jnp.dot(d_row, vel_new), sck_ad)
        if is_strict:
            ck_odd_r = jnp.where(
                mask_odd, z_new.r.astype(sdtype)[None, :], ck_odd_r
            )
            if not cheap_vel:
                ck_odd_vel = jnp.where(
                    mask_odd, vel_new.astype(sdtype)[None, :], ck_odd_vel
                )

        # --- is the current doubling finished? ---
        n_leaves = jnp.left_shift(jnp.asarray(1, jnp.int32), st["depth"])
        sub_done = s_turning | s_diverged
        complete = sub_done | (i >= n_leaves - 1)

        # ---------- top-level merge (masked; ref transition :691-723) ----------
        not_term = jnp.logical_not(sub_done)
        # subtree tree-order edges
        s_zleft = _where_z(fwd, s_zfirst, z_new)
        s_zright = _where_z(fwd, z_new, s_zfirst)
        s_vleft = jnp.where(fwd, s_vfirst, vel_new)
        s_vright = jnp.where(fwd, vel_new, s_vfirst)

        # biased progressive sampling (ref mh_accept :202-206, used at :710-712)
        if ts == SLICE:
            u_mh = jax.random.uniform(k_mh, dtype=dtype)
            mh_take = st["t_w"] * u_mh < s_w
        else:
            e_mh = rand_exponential(k_mh, dtype=dtype)
            mh_take = st["t_w"] < s_w + e_mh
        # `act` (optional, from the batch-explicit fused loop) folds the
        # chain's not-done predicate into this select: zcand is the only
        # inner field read back after a chain finishes its transitions, so
        # gating it here lets the batched loop skip vmap's whole-state
        # done-guard (one extra select per carry per leaf; see PERF.md).
        take_pred = complete & not_term & mh_take
        act = st.get("act")
        if act is not None:
            take_pred = take_pred & act
        zcand = _where_z(take_pred, s_zcand, st["zcand"])

        # combined tree (ref combine :533-542, always performed :714-715)
        c_zleft = _where_z(fwd, st["t_zleft"], s_zleft)
        c_zright = _where_z(fwd, s_zright, st["t_zright"])
        c_vleft = jnp.where(fwd, t_vleft_c, s_vleft)
        c_vright = jnp.where(fwd, s_vright, t_vright_c)
        c_rho = st["t_rho"] + s_rho

        # full-tree U-turn check on the combined tree (ref :719-722)
        if is_classic:
            dtheta_c = c_zright.theta - c_zleft.theta
            full_turn = _uturn_classic(dtheta_c, c_vleft, c_vright)
        else:
            full_turn = _uturn_generalised(c_rho, c_vleft, c_vright)
        if is_strict:
            # tleft/tright in tree order: forward → (old tree, subtree)
            tl_rho = jnp.where(fwd, st["t_rho"], s_rho)
            tr_rho = jnp.where(fwd, s_rho, st["t_rho"])
            tr_zleft_r = jnp.where(fwd, s_zleft.r, st["t_zleft"].r)
            tr_vleft = jnp.where(fwd, s_vleft, t_vleft_c)
            tl_zright_r = jnp.where(fwd, st["t_zright"].r, s_zright.r)
            tl_vright = jnp.where(fwd, t_vright_c, s_vright)
            sl = _uturn_generalised(tl_rho + tr_zleft_r, c_vleft, tr_vleft)
            sr = _uturn_generalised(tl_zright_r + tr_rho, tl_vright, c_vright)
            full_turn = full_turn | sl | sr

        if ts == SLICE:
            c_w = st["t_w"] + s_w
        else:
            c_w = jnp.logaddexp(st["t_w"], s_w)

        depth_new = st["depth"] + jnp.where(complete & not_term, 1, 0)
        turning_new = st["turning"] | (complete & (s_turning | full_turn))
        diverged_new = st["diverged"] | (complete & s_diverged)
        done_new = (
            (complete & (sub_done | full_turn))
            | (depth_new >= (st["cap"] if _traced_cap else max_depth))
        )

        sel = lambda p, a, b: jnp.where(p, a, b)
        out = dict(
            key=key,
            eps=st["eps"],
            **({"cap": st["cap"]} if _traced_cap else {}),
            m_inv=st["m_inv"],
            chol_u=st["chol_u"],
            h0=st["h0"],
            lu=st["lu"],
            t_zleft=_where_z(complete, c_zleft, st["t_zleft"]),
            t_zright=_where_z(complete, c_zright, st["t_zright"]),
            t_vleft=(st["t_vleft"] if cheap_vel
                     else sel(complete, c_vleft, st["t_vleft"])),
            t_vright=(st["t_vright"] if cheap_vel
                      else sel(complete, c_vright, st["t_vright"])),
            t_rho=sel(complete, c_rho, st["t_rho"]),
            zcand=zcand,
            t_w=sel(complete, c_w, st["t_w"]),
            sum_alpha=st["sum_alpha"] + sel(complete, s_sum_alpha, 0.0),
            n_alpha=st["n_alpha"] + sel(complete, s_n_alpha, 0),
            dh_max=sel(complete, maxabs(st["dh_max"], s_dh_max), st["dh_max"]),
            depth=depth_new,
            turning=turning_new,
            diverged=diverged_new,
            done=done_new,
            v=v,
            leaf=sel(complete, 0, i + 1),
            z_edge=z_new,
            s_zfirst=s_zfirst,
            s_vfirst=(st["s_vfirst"] if cheap_vel else s_vfirst),
            s_rho=s_rho,
            s_w=sel(complete, sub_w0, s_w),
            s_zcand=s_zcand,
            s_sum_alpha=sel(complete, 0.0, s_sum_alpha),
            s_n_alpha=sel(complete, 0, s_n_alpha),
            s_dh_max=sel(complete, 0.0, s_dh_max),
            s_turning=sel(complete, False, s_turning),
            s_diverged=sel(complete, False, s_diverged),
            ck_theta=ck_theta,
            ck_r=ck_r,
            ck_vel=ck_vel,
            ck_cum=ck_cum,
            ck_odd_r=ck_odd_r,
            ck_odd_vel=ck_odd_vel,
            sck_ad=sck_ad,
            sck_tv=sck_tv,
        )
        return out

    # ----------------------------------------------------------------------
    # Leaf-PAIR body (the round-4 structural lever, PERF.md "Leaf-pair"):
    # one while-loop iteration advances a chain by TWO leaves — the (even,
    # odd) aligned pair of the current doubling — or by the single lone leaf
    # of a depth-0 doubling. The per-leaf bookkeeping that the single-leaf
    # loop computes-and-masks EVERY iteration (span-check einsum: active
    # only at odd leaves; even checkpoint write: even leaves; top-level
    # merge + out-buffer write in the fused wrapper: completion leaves) runs
    # ONCE per iteration here, because within a pair exactly one leaf is
    # odd, exactly one is even, and at most one completion can occur.
    #
    # Invariant (induction): at iteration entry `leaf` is 0 (doubling
    # start — possibly the lone depth-0 doubling) or even mid-doubling, so
    # leaves (leaf, leaf+1) never straddle a doubling. Doublings of size
    # ≥ 2 consist of whole pairs; a divergence at the even leaf aborts the
    # pair (the odd leaf's work is computed but fully masked, matching the
    # single-leaf path which never runs it).
    #
    # Bit-exactness contract: consumes randomness exactly like TWO
    # single-leaf iterations (key → split(4) for the even leaf, then
    # split(4) of its carry key for the odd leaf; a lone/aborted pair
    # carries the first split's key forward), so fused transitions with
    # pair=True reproduce pair=False BITWISE (pinned by
    # tests/test_pair_loop.py). Cost: one wasted leapfrog per depth-0
    # doubling (~1 per transition; the odd-leaf slot of a lone unit).
    # ----------------------------------------------------------------------
    def body_pair(st):
        # force_directions is an oracle-test hook; the pair loop is covered
        # against the oracle transitively through its bitwise equality with
        # the single-leaf body (tests/test_pair_loop.py), so it only needs
        # the production direction draws (free, or coupled across chains).
        assert force_directions is None, (
            "force_directions is unsupported on the pair loop; use the "
            "single-leaf body (pair=False) for forced-direction runs"
        )
        key1, k_dir1, k_res1, k_mh1 = jax.random.split(st["key"], 4)
        key2, k_dir2, k_res2, k_mh2 = jax.random.split(key1, 4)
        eps = st["eps"]
        h0 = st["h0"]
        lu = st["lu"]
        if dense_in_state:
            from .metrics import DenseEuclideanMetric as _DnEM

            h_loc = h.replace(metric=_DnEM(m_inv=st["m_inv"],
                                           chol_u=st["chol_u"]))
        elif _adaptive_metric:
            from .metrics import DiagEuclideanMetric as _DEM

            h_loc = h.replace(metric=_DEM(m_inv=st["m_inv"],
                                          sqrt_m_inv=jnp.sqrt(st["m_inv"])))
        else:
            h_loc = h

        i_a = st["leaf"]                       # even by the pair invariant
        n_leaves = jnp.left_shift(jnp.asarray(1, jnp.int32), st["depth"])
        start = i_a == 0
        # --- doubling start: direction, edge pick, subtree reset (A only) ---
        if coupled_key is not None:
            # shared doubling direction across vmapped chains, fold-in by
            # depth — IDENTICAL to the single-leaf body's coupled draw
            # (rand_coupled semantics, ref utilities.jl:39-47). k_dir1 is
            # still split (and discarded) so the key stream stays bitwise
            # aligned with two single-leaf iterations.
            v_draw = rand_sign(jax.random.fold_in(coupled_key, st["depth"]))
        else:
            v_draw = rand_sign(k_dir1)
        v = jnp.where(start, v_draw, st["v"])
        fwd = v > 0
        z_start_edge = _where_z(fwd, st["t_zright"], st["t_zleft"])
        z_edge = _where_z(start, z_start_edge, st["z_edge"])
        s_rho = jnp.where(start, zeros_d, st["s_rho"])
        s_w = jnp.where(start, sub_w0, st["s_w"])
        s_sum_alpha = jnp.where(start, 0.0, st["s_sum_alpha"])
        s_n_alpha = jnp.where(start, 0, st["s_n_alpha"])
        s_dh_max = jnp.where(start, 0.0, st["s_dh_max"])
        s_diverged = jnp.where(start, False, st["s_diverged"])
        # s_turning needs no carry here: a doubling whose odd leaf turned
        # completed in THAT iteration, so mid-doubling entry always has
        # s_turning False (the single-leaf loop resets it at completion).

        eps_signed = eps * v.astype(dtype)

        def leaf_stats(k_res, h_new, s_w_in):
            """Reservoir/divergence update for one leaf (≡ the single-leaf
            block at the same position in `body`)."""
            if ts == SLICE:
                leaf_n = (lu <= -h_new).astype(dtype)
                new_sw = s_w_in + leaf_n
                u = jax.random.uniform(k_res, dtype=dtype)
                take = (new_sw * u >= s_w_in) & (leaf_n > 0)
                diverging = jnp.logical_not(lu < delta_max - h_new)
            else:
                lw_leaf = h0 - h_new
                new_sw = jnp.logaddexp(s_w_in, lw_leaf)
                u = jax.random.uniform(k_res, dtype=dtype)
                take = jnp.log(u) < lw_leaf - new_sw
                diverging = jnp.logical_not(-h0 < delta_max - h_new)
            return new_sw, take, diverging

        # ===== leaf A (even) =====
        z_a = integ.step(h_loc, z_edge, eps_signed)
        vel_a = h_loc.velocity_z(z_a)
        h_a = z_a.energy()
        dh_a = h_a - h0
        alpha_a = jnp.exp(jnp.minimum(jnp.zeros_like(dh_a), -dh_a))
        alpha_a = jnp.where(jnp.isnan(alpha_a), 0.0, alpha_a)
        s_w1, take_a, div_a = leaf_stats(k_res1, h_a, s_w)
        s_zcand = _where_z(take_a, _cand(z_a, h_a), st["s_zcand"])
        s_rho1 = s_rho + z_a.r
        s_zfirst = _where_z(start, z_a, st["s_zfirst"])
        if cheap_vel:
            s_vfirst = jnp.where(start, vel_a,
                                 h_loc.velocity(st["s_zfirst"].r))
            t_vleft_c = h_loc.velocity(st["t_zleft"].r)
            t_vright_c = h_loc.velocity(st["t_zright"].r)
        else:
            s_vfirst = jnp.where(start, vel_a, st["s_vfirst"])
            t_vleft_c = st["t_vleft"]
            t_vright_c = st["t_vright"]

        s_diverged1 = s_diverged | div_a
        # even leaf can complete only a lone (depth-0) doubling or by
        # divergence (the pair invariant: i_a even, n_leaves−1 odd unless 1)
        complete_a = s_diverged1 | (i_a >= n_leaves - 1)
        pair_go = jnp.logical_not(complete_a)

        # --- even checkpoint write (source = leaf A, always even) ---
        tz_a = trailing_zeros(jnp.maximum(i_a, 1))
        slot_even = jnp.where(i_a == 0, n_slots - 1,
                              jnp.minimum(tz_a - 1, n_slots - 1))
        slots = jnp.arange(n_slots)
        mask_even = (slots == slot_even)[:, None]
        ck_theta, ck_r, ck_vel, ck_cum = (
            st["ck_theta"], st["ck_r"], st["ck_vel"], st["ck_cum"],
        )
        ck_odd_r, ck_odd_vel = st["ck_odd_r"], st["ck_odd_vel"]
        sck_ad, sck_tv = st["sck_ad"], st["sck_tv"]
        if is_classic:
            ck_theta = jnp.where(
                mask_even, z_a.theta.astype(sdtype)[None, :], ck_theta
            )
        ck_r = jnp.where(mask_even, z_a.r.astype(sdtype)[None, :], ck_r)
        if not cheap_vel:
            ck_vel = jnp.where(
                mask_even, vel_a.astype(sdtype)[None, :], ck_vel
            )
        mask_even_s = mask_even[:, 0]
        if is_strict:
            ck_cum = jnp.where(mask_even, s_rho1.astype(sdtype)[None, :],
                               ck_cum)
        elif is_classic:
            sck_tv = jnp.where(mask_even_s,
                               jnp.dot(z_a.theta, vel_a), sck_tv)
        else:
            d_row = z_a.r - s_rho1
            ck_cum = jnp.where(mask_even, d_row.astype(sdtype)[None, :],
                               ck_cum)
            sck_ad = jnp.where(mask_even_s, jnp.dot(d_row, vel_a), sck_ad)

        # ===== leaf B (odd; fully masked when the pair aborts at A) =====
        i_b = i_a + 1
        z_b = integ.step(h_loc, z_a, eps_signed)
        vel_b = h_loc.velocity_z(z_b)
        h_b = z_b.energy()
        dh_b = h_b - h0
        alpha_b = jnp.exp(jnp.minimum(jnp.zeros_like(dh_b), -dh_b))
        alpha_b = jnp.where(jnp.isnan(alpha_b), 0.0, alpha_b)
        s_w2, take_b, div_b = leaf_stats(k_res2, h_b, s_w1)
        s_w_f = jnp.where(pair_go, s_w2, s_w1)
        s_zcand = _where_z(pair_go & take_b, _cand(z_b, h_b), s_zcand)
        s_rho2 = s_rho1 + z_b.r
        s_rho_f = jnp.where(pair_go, s_rho2, s_rho1)
        s_sum_alpha_f = s_sum_alpha + alpha_a + jnp.where(pair_go, alpha_b,
                                                          0.0)
        s_n_alpha_f = s_n_alpha + 1 + pair_go.astype(jnp.int32)
        s_dh_max_f = maxabs(s_dh_max, dh_a)
        s_dh_max_f = jnp.where(pair_go, maxabs(s_dh_max_f, dh_b), s_dh_max_f)
        s_diverged_f = s_diverged1 | (pair_go & div_b)

        # --- U-turn span checks ONCE, at the odd leaf B (post-A write) ---
        vsign = v.astype(dtype)
        t_ones_b = trailing_ones(i_b)
        ks = jnp.arange(1, max_depth, dtype=jnp.int32)
        spans = jnp.left_shift(jnp.int32(1), ks)
        a_s = i_b - spans + 1
        active_s = (ks <= t_ones_b) & (a_s >= 0)
        a_safe = jnp.maximum(a_s, 0)
        tz_as = trailing_zeros(jnp.maximum(a_safe, 1))
        slot_a = jnp.where(a_safe == 0, n_slots - 1,
                           jnp.minimum(tz_as - 1, n_slots - 1))
        sel_b = slot_a[:, None] == jnp.arange(n_slots)[None, :]
        sel_a = sel_b.astype(dtype)
        if not is_strict:
            sd = ck_r.dtype
            if is_classic:
                colA = (h_loc.velocity(z_b.theta) if cheap_vel
                        else z_b.theta)
                lhsA = ck_r if cheap_vel else ck_vel
                lhs = jnp.concatenate([lhsA, ck_theta], 0)
                rhs = jnp.stack([colA, vel_b], 0).astype(sd)
                prod = jnp.einsum(
                    "kd,sd->ks", rhs, lhs,
                    precision=getattr(traj, 'uturn_precision', None),
                ).astype(dtype)
                th_dot_va = prod[0, :n_slots]
                thck_dot_vnew = prod[1, n_slots:]
                dA_slots = vsign * (th_dot_va - sck_tv)
                dB_slots = vsign * (
                    jnp.dot(z_b.theta, vel_b) - thck_dot_vnew
                )
                dA_k = sel_a @ dA_slots
                dB_k = sel_a @ dB_slots
                turn_k = (dA_k <= 0) | (dB_k <= 0)
            else:
                colA = h_loc.velocity(s_rho2) if cheap_vel else s_rho2
                lhsA = ck_r if cheap_vel else ck_vel
                lhs = jnp.concatenate([lhsA, ck_cum], 0)
                rhs = jnp.stack([colA, vel_b], 0).astype(sd)
                prod = jnp.einsum(
                    "kd,sd->ks", rhs, lhs,
                    precision=getattr(traj, 'uturn_precision', None),
                ).astype(dtype)
                uA = prod[0, :n_slots] + sck_ad
                uB = prod[1, n_slots:]
                srv = jnp.dot(s_rho2, vel_b)
                turn_slot = (uA <= 0) | (uB <= -srv)
                turn_k = jnp.any(sel_b & turn_slot[None, :], axis=-1)
        else:
            r_a_ck = sel_a @ ck_r
            vel_a_ck = (jax.vmap(h_loc.velocity)(r_a_ck) if cheap_vel
                        else sel_a @ ck_vel)
            cum_a = sel_a @ ck_cum
            rho_span = s_rho2[None, :] - cum_a + r_a_ck
            turn_k = (jnp.einsum("kd,kd->k", rho_span, vel_a_ck) <= 0) | (
                rho_span @ vel_b <= 0
            )
        if is_strict:
            import numpy as _np

            _mid_rows = _np.maximum(_np.arange(max_depth - 1) - 1, 0)
            r_m1 = ck_r[_mid_rows]
            cum_m1 = ck_cum[_mid_rows]
            r_m = ck_odd_r[_mid_rows]
            if cheap_vel:
                vel_m1 = jax.vmap(h_loc.velocity)(r_m1)
                vel_m = jax.vmap(h_loc.velocity)(r_m)
            else:
                vel_m1 = ck_vel[_mid_rows]
                vel_m = ck_odd_vel[_mid_rows]
            rho_h1 = (cum_m1 - r_m1) - cum_a + r_a_ck
            rho_h2 = s_rho2[None, :] - cum_m1 + r_m1
            dot = lambda x, y: jnp.einsum("kd,kd->k", x, y)
            x1 = rho_h1 + r_m1
            fl = (dot(x1, vel_a_ck) <= 0) | (dot(x1, vel_m1) <= 0)
            x2 = r_m + rho_h2
            fr = (dot(x2, vel_m) <= 0) | (x2 @ vel_b <= 0)
            x3 = rho_h2 + r_m
            bl = (x3 @ vel_b <= 0) | (dot(x3, vel_m) <= 0)
            x4 = r_m1 + rho_h1
            br = (dot(x4, vel_m1) <= 0) | (dot(x4, vel_a_ck) <= 0)
            sub_turn = jnp.where(fwd, fl | fr, bl | br)
            sub_turn = sub_turn & (ks >= 2)
            turn_k = turn_k | sub_turn
        s_turning_f = pair_go & jnp.any(active_s & turn_k)

        # --- strict odd-checkpoint write (source = leaf B) ---
        if is_strict:
            slot_odd = jnp.minimum(trailing_zeros(i_b + 1) - 1, n_slots - 1)
            mask_odd = ((slots == slot_odd) & pair_go)[:, None]
            ck_odd_r = jnp.where(
                mask_odd, z_b.r.astype(sdtype)[None, :], ck_odd_r
            )
            if not cheap_vel:
                ck_odd_vel = jnp.where(
                    mask_odd, vel_b.astype(sdtype)[None, :], ck_odd_vel
                )

        # ===== completion + merge (at most one per iteration) =====
        sub_done = s_turning_f | s_diverged_f
        complete = complete_a | (pair_go & (sub_done | (i_b >= n_leaves - 1)))
        not_term = jnp.logical_not(sub_done)

        # last processed leaf (merge inputs)
        z_last = _where_z(pair_go, z_b, z_a)
        vel_last = jnp.where(pair_go, vel_b, vel_a)

        s_zleft = _where_z(fwd, s_zfirst, z_last)
        s_zright = _where_z(fwd, z_last, s_zfirst)
        s_vleft = jnp.where(fwd, s_vfirst, vel_last)
        s_vright = jnp.where(fwd, vel_last, s_vfirst)

        if ts == SLICE:
            u_mh = jnp.where(pair_go,
                             jax.random.uniform(k_mh2, dtype=dtype),
                             jax.random.uniform(k_mh1, dtype=dtype))
            mh_take = st["t_w"] * u_mh < s_w_f
        else:
            e_mh = jnp.where(pair_go,
                             rand_exponential(k_mh2, dtype=dtype),
                             rand_exponential(k_mh1, dtype=dtype))
            mh_take = st["t_w"] < s_w_f + e_mh
        take_pred = complete & not_term & mh_take
        act = st.get("act")
        if act is not None:
            take_pred = take_pred & act
        zcand = _where_z(take_pred, s_zcand, st["zcand"])

        c_zleft = _where_z(fwd, st["t_zleft"], s_zleft)
        c_zright = _where_z(fwd, s_zright, st["t_zright"])
        c_vleft = jnp.where(fwd, t_vleft_c, s_vleft)
        c_vright = jnp.where(fwd, s_vright, t_vright_c)
        c_rho = st["t_rho"] + s_rho_f

        if is_classic:
            dtheta_c = c_zright.theta - c_zleft.theta
            full_turn = _uturn_classic(dtheta_c, c_vleft, c_vright)
        else:
            full_turn = _uturn_generalised(c_rho, c_vleft, c_vright)
        if is_strict:
            tl_rho = jnp.where(fwd, st["t_rho"], s_rho_f)
            tr_rho = jnp.where(fwd, s_rho_f, st["t_rho"])
            tr_zleft_r = jnp.where(fwd, s_zleft.r, st["t_zleft"].r)
            tr_vleft = jnp.where(fwd, s_vleft, t_vleft_c)
            tl_zright_r = jnp.where(fwd, st["t_zright"].r, s_zright.r)
            tl_vright = jnp.where(fwd, t_vright_c, s_vright)
            sl = _uturn_generalised(tl_rho + tr_zleft_r, c_vleft, tr_vleft)
            sr = _uturn_generalised(tl_zright_r + tr_rho, tl_vright, c_vright)
            full_turn = full_turn | sl | sr

        if ts == SLICE:
            c_w = st["t_w"] + s_w_f
        else:
            c_w = jnp.logaddexp(st["t_w"], s_w_f)

        depth_new = st["depth"] + jnp.where(complete & not_term, 1, 0)
        turning_new = st["turning"] | (complete & (s_turning_f | full_turn))
        diverged_new = st["diverged"] | (complete & s_diverged_f)
        done_new = (
            (complete & (sub_done | full_turn))
            | (depth_new >= (st["cap"] if _traced_cap else max_depth))
        )

        sel = lambda p, a, b: jnp.where(p, a, b)
        key_out = jnp.where(pair_go, key2, key1)
        out = dict(
            key=key_out,
            eps=st["eps"],
            **({"cap": st["cap"]} if _traced_cap else {}),
            m_inv=st["m_inv"],
            chol_u=st["chol_u"],
            h0=st["h0"],
            lu=st["lu"],
            t_zleft=_where_z(complete, c_zleft, st["t_zleft"]),
            t_zright=_where_z(complete, c_zright, st["t_zright"]),
            t_vleft=(st["t_vleft"] if cheap_vel
                     else sel(complete, c_vleft, st["t_vleft"])),
            t_vright=(st["t_vright"] if cheap_vel
                      else sel(complete, c_vright, st["t_vright"])),
            t_rho=sel(complete, c_rho, st["t_rho"]),
            zcand=zcand,
            t_w=sel(complete, c_w, st["t_w"]),
            sum_alpha=st["sum_alpha"] + sel(complete, s_sum_alpha_f, 0.0),
            n_alpha=st["n_alpha"] + sel(complete, s_n_alpha_f, 0),
            dh_max=sel(complete, maxabs(st["dh_max"], s_dh_max_f),
                       st["dh_max"]),
            depth=depth_new,
            turning=turning_new,
            diverged=diverged_new,
            done=done_new,
            v=v,
            leaf=sel(complete, 0, i_b + 1),
            z_edge=z_last,
            s_zfirst=s_zfirst,
            s_vfirst=(st["s_vfirst"] if cheap_vel else s_vfirst),
            s_rho=s_rho_f,
            s_w=sel(complete, sub_w0, s_w_f),
            s_zcand=s_zcand,
            s_sum_alpha=sel(complete, 0.0, s_sum_alpha_f),
            s_n_alpha=sel(complete, 0, s_n_alpha_f),
            s_dh_max=sel(complete, 0.0, s_dh_max_f),
            s_turning=jnp.logical_not(complete) & s_turning_f,
            s_diverged=sel(complete, False, s_diverged_f),
            ck_theta=ck_theta,
            ck_r=ck_r,
            ck_vel=ck_vel,
            ck_cum=ck_cum,
            ck_odd_r=ck_odd_r,
            ck_odd_vel=ck_odd_vel,
            sck_ad=sck_ad,
            sck_tv=sck_tv,
        )
        return out

    if _return_machinery:
        return state, cond, (body_pair if _pair else body), fresh_fields

    assert not slim, "_slim_candidates requires _return_machinery"
    # honor _pair on the direct (non-machinery) path too — silently running
    # the single-leaf body under a pair=True flag was ADVICE r4's top item
    final = jax.lax.while_loop(cond, body_pair if _pair else body, state)

    zcand = final["zcand"]
    h_cand = zcand.energy()
    n_alpha = final["n_alpha"]
    stats = {
        "n_steps": n_alpha,
        "is_accept": jnp.asarray(True),
        "acceptance_rate": final["sum_alpha"]
        / jnp.maximum(n_alpha.astype(dtype), 1.0),
        "log_density": zcand.logdensity,
        "hamiltonian_energy": h_cand,
        "hamiltonian_energy_error": h_cand - h0,
        "max_hamiltonian_energy_error": final["dh_max"],
        "tree_depth": final["depth"],
        "numerical_error": final["diverged"],
        "step_size": integ.current_step_size,
        "nom_step_size": integ.nom_step_size,
    }
    if return_debug:
        return zcand, stats, final
    return zcand, stats


def _packed_while_loop(cond_key, vbody, fstate, layout):
    """Run `lax.while_loop(any(not done), vbody, fstate)` with every
    (C,)-shaped f32/i32/bool leaf of the carry packed into ONE array.

    The batch-explicit fused loop carries ~29 per-chain scalar fields as
    separate [C] buffers; the compiled loop's per-leaf "fused per-chain
    scalar updates" fusion is issue-limited, not byte-limited (PERF.md
    hlo_stats profile: ~19 µs/leaf for ~800 KB of traffic at 42 GB/s
    effective). Packing the fields into one wide array turns those stores
    into one dense buffer write per iteration. Layout "fc" stacks fields on
    axis 0 → (NF, C) (dense (8,128) tiling); "cf" stacks on axis -1 →
    (C, NF) (lane-padded NF→128 but chain-major like everything else).

    Bit-exact by construction: the per-leaf compute graph is unchanged —
    only the carry layout differs. f32 columns round-trip bitwise; bool and
    the small int32 counters (depth ≤ max_depth, leaf < 2^max_depth,
    n_alpha ≤ 2^max_depth, t ≤ n_transitions, v = ±1) are exact in f32.
    """
    leaves, treedef = jax.tree_util.tree_flatten(fstate)
    n_chains = fstate[cond_key].shape[0]
    packable = [
        i for i, l in enumerate(leaves)
        if l.ndim == 1 and l.shape[0] == n_chains
        and l.dtype in (jnp.dtype(jnp.float32), jnp.dtype(jnp.int32),
                        jnp.dtype(bool))
    ]
    dtypes = [leaves[i].dtype for i in packable]
    axis = 0 if layout == "fc" else -1
    # position of all_done among the packed columns (for the loop cond)
    flat_keys = [
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(fstate)[0]
    ]
    done_col = packable.index(flat_keys.index(cond_key))

    def pack(leaves):
        cols = [leaves[i].astype(jnp.float32) for i in packable]
        arr = jnp.stack(cols, axis=axis)
        rest = [l for i, l in enumerate(leaves) if i not in packable]
        return arr, tuple(rest)

    def unpack(arr, rest):
        cols = list(jnp.moveaxis(arr, axis, 0))
        out, it_rest = [], iter(rest)
        for i, _ in enumerate(leaves):
            if i in packable:
                j = packable.index(i)
                out.append(cols[j].astype(dtypes[j]))
            else:
                out.append(next(it_rest))
        return jax.tree_util.tree_unflatten(treedef, out)

    def pcond(carry):
        arr, _ = carry
        done = arr[done_col] if axis == 0 else arr[:, done_col]
        return jnp.any(done == 0.0)

    def pbody(carry):
        st = unpack(*carry)
        st2 = vbody(st)
        return pack(jax.tree_util.tree_flatten(st2)[0])

    final = jax.lax.while_loop(pcond, pbody, pack(leaves))
    return unpack(*final)


def nuts_transitions_fused(key, h: Hamiltonian, traj, z0: PhasePoint,
                           n_transitions: int, refreshment,
                           adapt_cfg=None, adapt_state=None,
                           adapt_flags=None, unroll: int = 1,
                           out_dtype=None, batched: bool = False,
                           metric_batch=None, eps_batch=None,
                           stage_slots: int = 0, t_min=None,
                           pack_carry: str = "", depth_caps=None,
                           pair: bool = False):
    """Run `n_transitions` sequential NUTS transitions inside ONE while-loop.

    Chains advance through their own transition sequences asynchronously, so
    the vmapped loop's wasted-lane factor drops from mean/max of a SINGLE
    tree size to mean/max of the SUM of `n_transitions` tree sizes (law of
    large numbers) — the main utilisation lever for many-chain NUTS on TPU
    (PERF.md). Draw-phase only: adaptation state is frozen; momentum refresh,
    per-trajectory step-size jitter, and the slice variable are re-drawn at
    every transition boundary inside the loop, exactly matching the
    per-transition semantics of the scan path (ref sampler.jl:48-58).

    Warmup mode: pass `adapt_cfg` (AdaptorConfig), `adapt_state` (per-chain
    AdaptState) and `adapt_flags` (dict of (≥n_transitions,) flag arrays from
    adaptation.adapt_flags). The full per-transition adaptation update — dual
    averaging, Welford/Nutpie pushes, Stan window resets, and the metric
    refresh — then runs INSIDE the loop at each chain's own transition
    boundary, indexed by its own transition counter: exactly the reference's
    per-chain semantics (ref sampler.jl:60-90), but with the async-lane
    utilisation of the fused loop. Diagonal/unit metrics only. Returns
    (z_final, thetas, stats, adapt_state_final).

    Returns (z_final, thetas (n_transitions, dim), stats dict of
    (n_transitions,)) for a single chain; vmap for a batch.

    Batch-explicit mode (`batched=True`): `key` is a (C,) batch of per-chain
    keys, `z0`/`adapt_state` have a leading chain axis, and `h`'s leaves are
    UNBATCHED (shared metric — the cross-chain configuration) or the
    per-chain metric is carried in the loop state: diagonal M⁻¹ (adaptive or
    frozen) or frozen dense M⁻¹ + its Cholesky factor (draw phase; beyond
    the reference, whose dense metric is single-chain only, metric.jl:103). ONE
    `lax.while_loop` then runs over the batched state with `vmap(body)` and
    a `jnp.any` condition instead of vmapping the whole loop. This removes
    the automatic done-guard select that vmapped `while_loop` inserts on
    EVERY carry each iteration — at bench shape those doubled the cost of
    the checkpoint-stack and draw-buffer writes, the two hottest loop ops
    (PERF.md). Active chains compute bit-identically to the vmapped path;
    finished chains' state drifts harmlessly (every field read after a
    chain finishes — zcand, the out buffers, `ad` — is gated by the chain's
    not-done predicate). Returns batched outputs (C, n_transitions, ...).

    Variable-draws-per-chain mode (`t_min` = M < n_transitions, batched,
    full refreshment, draw phase only): the loop runs until EVERY chain has
    completed at least M transitions; chains that finish early KEEP
    sampling (up to the `n_transitions` buffer capacity) instead of idling.
    The per-dispatch wall is still set by the slowest chain reaching M —
    identical to a rectangular M-transition dispatch — but the
    previously-wasted fast-chain lanes now produce extra draws, so the
    collected-draws/wall ratio rises by the rectangular loop's idle-lane
    factor (PERF.md "lane utilisation"). Returns
    (z_final, thetas (C, n_transitions, dim), stats, counts (C,)) where
    chain c's draws occupy rows [0, counts[c]) and
    M ≤ counts[c] ≤ n_transitions. The chain's resume state is its LAST
    COMPLETED transition's draw (partial trees in flight at loop exit are
    discarded — a progressive-sampling candidate is only a valid draw at a
    completed transition boundary). Use
    diagnostics.effective_sample_size_ragged for ESS on the ragged result.

    Segmented collection (`stage_slots` = NS > 0, batched mode): the
    (C, n_transitions, dim) output buffers are the hottest carry traffic of
    the loop (rewritten via select on EVERY leaf; ~16% of leaf wall at
    bench shape, PERF.md). They are moved OUT of the per-leaf carry into an
    outer while-loop: the inner loop records boundary draws into a tiny
    (C, NS, dim) staging register and exits as soon as ANY chain has filled
    its NS staging rows (overflow is impossible by construction — the cond
    is checked before each body call); the outer body then flushes the
    stage into the big buffers once per segment (amortised over the
    ~NS·E[tree leaves] leaves of a segment) and re-enters. Statistics are
    bit-identical to the unsegmented path: recording is merely repositioned.
    Measured SLOWER at bench shape (10.1 vs 15.2 M leaves/s at δ=0.6: the
    nested-loop boundary repacks outweigh the saved buffer traffic — see
    PERF.md), so the default is 0 (single-loop layout); kept as a tested
    opt-in for shapes with much larger fuse × dim buffers.
    """
    from .hamiltonian import FullMomentumRefreshment

    ts = traj.ts_kind
    integ = traj.integrator
    dim = z0.theta.shape[-1]
    dtype = z0.theta.dtype
    adaptive = adapt_cfg is not None
    adaptive_metric = adaptive and adapt_cfg.uses_mm
    # With full momentum refreshment the candidate's momentum is never used
    # (resampled at every boundary): carry slim candidates without r, with
    # the energy cached as a scalar.
    slim = isinstance(refreshment, FullMomentumRefreshment)

    # Per-chain metrics in batched mode ride the m_inv-in-state machinery
    # (diagonal, or dense when frozen), whether or not the metric is being
    # adapted.
    metric_in_state = adaptive_metric or (batched and metric_batch is not None)
    from .metrics import DenseEuclideanMetric as _DenseMetric

    dense_in_state = metric_in_state and isinstance(
        metric_batch if metric_batch is not None else h.metric, _DenseMetric
    )
    # In-loop DENSE adaptation (per-chain Welford-cov + Cholesky refresh at
    # boundaries) exceeds the reference, whose dense metric is single-chain
    # only and marked "TODO: make dense mass matrix support matrix-mode"
    # (/root/reference/src/metric.jl:103). The refresh costs one per-chain
    # (D,D) Cholesky per transition boundary inside the loop body — warmup-
    # phase only; the draw phase carries the metric frozen.

    # per-transition tree-depth caps (traced; transient-gated warmup
    # schedule): chain at local transition t runs with depth capped at
    # depth_caps[t] (≤ the criterion's static max_depth)
    traced_cap = depth_caps is not None
    if traced_cap:
        depth_caps = jnp.asarray(depth_caps, jnp.int32)
        assert depth_caps.shape == (n_transitions,)
        # Clamp to the criterion's static max_depth: the checkpoint stacks
        # are sized for max_depth-1 rows, so a larger traced cap would let
        # the doubling loop run past the stacks (writes clamp at the top
        # slot, silently corrupting the U-turn check set).
        depth_caps = jnp.minimum(
            depth_caps, jnp.int32(int(traj.criterion.max_depth)))

    def _core_state(k, z0_c, metric_c=None):
        h_c = h if metric_c is None else h.replace(metric=metric_c)
        k, k_ref0 = jax.random.split(k)
        z_start = refreshment.refresh(k_ref0, h_c, z0_c)
        return nuts_transition(
            k, h_c, traj, z_start, _return_machinery=True,
            _adaptive_metric=metric_in_state, _slim_candidates=slim,
            _traced_cap=traced_cap, _pair=pair,
        )

    if batched:
        # `metric_batch` supplies per-chain metric leaves (per-chain
        # adaptation / per-chain frozen-metric mode). The initial
        # refresh/state build uses them; the loop body reads M⁻¹ from the
        # state, so the representative machinery below may close over the
        # shared template `h`.
        assert unroll == 1, "batched fused loop does not support unroll"
        n_chains = z0.theta.shape[0]
        if metric_batch is None:
            state = jax.vmap(lambda k, z: _core_state(k, z)[0])(key, z0)
        else:
            state = jax.vmap(lambda k, z, m: _core_state(k, z, m)[0])(
                key, z0, metric_batch
            )
        # representative single-chain machinery (closes over shared statics
        # only; all per-chain values flow through the state dict)
        k0 = jax.tree_util.tree_map(lambda x: x[0], key)
        z00 = jax.tree_util.tree_map(lambda x: x[0], z0)
        m0 = (None if metric_batch is None else
              jax.tree_util.tree_map(lambda x: x[0], metric_batch))
        _, cond, body, fresh_fields = _core_state(k0, z00, m0)
    else:
        state, cond, body, fresh_fields = _core_state(key, z0)
    if eps_batch is not None:
        assert batched, "eps_batch requires batched mode"
        state = dict(state, eps=jnp.asarray(eps_batch, dtype))
    if adaptive:
        state = dict(state, ad=adapt_state)
    if traced_cap:
        state = dict(state, cap=jnp.full_like(state["depth"], depth_caps[0]))
    edtype = jnp.result_type(jnp.zeros((), state["h0"].dtype))
    t_count = n_transitions

    # per-transition statistic fields and their storage dtypes (shared by
    # the big output buffers and the staging registers)
    stat_dtypes = dict(
        n_steps=jnp.int32, alpha=dtype, logdensity=edtype, energy=edtype,
        energy_error=edtype, dh_max=edtype, depth=jnp.int32, diverged=bool,
        eps=dtype,
    )
    use_staged = bool(batched and unroll == 1 and stage_slots
                      and 0 < stage_slots < t_count)
    ragged = t_min is not None and int(t_min) < t_count
    if pack_carry:
        if use_staged or t_min is not None:
            raise ValueError(
                "pack_carry cannot be combined with stage_slots or t_min: "
                "the staged/ragged loop layouts would silently take "
                "precedence and the packed path would never run")
        if t_count >= 2 ** 24:
            raise ValueError(
                "pack_carry packs int32 counters into f32 columns, exact "
                f"only below 2**24; n_transitions={t_count} violates that")
    if t_min is not None:
        assert batched and unroll == 1 and not use_staged, (
            "variable-draws mode requires the batch-explicit single-loop "
            "layout (batched=True, unroll=1, stage_slots=0)"
        )
        assert not adaptive, (
            "variable-draws mode is draw-phase only (adaptation is a "
            "per-transition-index schedule; ragged counts would desync it)"
        )
        assert slim, (
            "variable-draws mode requires full momentum refreshment (the "
            "resume state is rebuilt from the last completed transition's "
            "slim candidate)"
        )
        assert 1 <= int(t_min) < t_count, (
            "t_min must be < n_transitions: the ragged 4-tuple return "
            "contract only holds for t_min < n_transitions (for a "
            "rectangular run call without t_min)"
        )

    fused_fields = dict(
        t=jnp.asarray(0, jnp.int32),
        all_done=jnp.asarray(False),
        # `out_dtype` stores the (fuse, dim) draw buffer reduced-precision
        # (e.g. bf16): the buffer is rewritten every leaf, so its bytes are
        # hot-loop carry traffic; draws are cast back to `dtype` on return.
        out_theta=jnp.zeros((t_count, dim), jnp.dtype(out_dtype or dtype)),
        **{f"out_{k}": jnp.zeros((t_count,), dt)
           for k, dt in stat_dtypes.items()},
    )
    if use_staged:
        fused_fields.update(
            stg_theta=jnp.zeros((stage_slots, dim),
                                jnp.dtype(out_dtype or dtype)),
            stg_slot=jnp.zeros((stage_slots,), jnp.int32),
            stg_cnt=jnp.asarray(0, jnp.int32),
            **{f"stg_{k}": jnp.zeros((stage_slots,), dt)
               for k, dt in stat_dtypes.items()},
        )
    if batched:
        fused_fields = jax.tree_util.tree_map(
            lambda x: jnp.zeros((n_chains,) + x.shape, x.dtype), fused_fields
        )
    fstate = dict(state, **fused_fields)
    if eps_batch is not None:
        # per-chain NOMINAL step size (jitter base at transition boundaries)
        fstate["eps_nom"] = jnp.asarray(eps_batch, dtype)
    if ragged:
        # snapshot of the last COMPLETED transition's candidate — the chain's
        # resume point (partial trees at loop exit are discarded). Init from
        # the refreshed start point (t_min ≥ 1 guarantees one overwrite).
        zc0 = state["zcand"]
        fstate.update(zl_theta=zc0["theta"], zl_ld=zc0["ld"],
                      zl_grad=zc0["grad"], zl_h=zc0["h"])
    inner_keys = [k for k in state.keys()]
    body_keys = [k for k in inner_keys if k != "ad"]
    if adaptive:
        from .adaptation import adapt_step as _adapt_step

    def fcond(st):
        return jnp.logical_not(st["all_done"])

    def fbody(st, staged=False):
        # not-done predicate: folded into the inner zcand select and every
        # boundary-gated write below, so the batched loop needs no outer
        # whole-state done-guard (the vmapped loop's body_pred adds one
        # anyway; there it is redundant but harmless).
        act = jnp.logical_not(st["all_done"])
        st2 = body(dict({k: st[k] for k in body_keys}, act=act))
        boundary = st2["done"] & act
        t = st["t"]

        zc = st2["zcand"]
        if slim:
            zc_theta, zc_ld, zc_grad = zc["theta"], zc["ld"], zc["grad"]
            energy = zc["h"]
        else:
            zc_theta, zc_ld, zc_grad = zc.theta, zc.logdensity, zc.grad
            energy = zc.energy()
        n_alpha = st2["n_alpha"]
        vals = dict(
            n_steps=n_alpha,
            alpha=st2["sum_alpha"] / jnp.maximum(n_alpha.astype(dtype), 1.0),
            logdensity=zc_ld,
            energy=energy,
            energy_error=energy - st2["h0"],
            dh_max=st2["dh_max"],
            depth=st2["depth"],
            diverged=st2["diverged"],
            eps=st2["eps"],
        )
        if staged:
            # record into the next free staging row (cond_inner guarantees
            # stg_cnt < stage_slots on entry — no overflow possible)
            oh = (jnp.arange(stage_slots) == st["stg_cnt"]) & boundary
            out = {f"stg_{k}": jnp.where(oh, v, st[f"stg_{k}"])
                   for k, v in vals.items()}
            out["stg_theta"] = jnp.where(
                oh[:, None],
                zc_theta.astype(st["stg_theta"].dtype)[None, :],
                st["stg_theta"],
            )
            out["stg_slot"] = jnp.where(oh, t, st["stg_slot"])
            out["stg_cnt"] = st["stg_cnt"] + boundary.astype(jnp.int32)
        else:
            onehot = (jnp.arange(t_count) == t) & boundary
            out = {f"out_{k}": jnp.where(onehot, v, st[f"out_{k}"])
                   for k, v in vals.items()}
            out["out_theta"] = jnp.where(
                onehot[:, None],
                zc_theta.astype(st["out_theta"].dtype)[None, :],
                st["out_theta"],
            )
        if ragged:
            out["zl_theta"] = jnp.where(boundary, zc_theta, st["zl_theta"])
            out["zl_ld"] = jnp.where(boundary, zc_ld, st["zl_ld"])
            out["zl_grad"] = jnp.where(boundary, zc_grad, st["zl_grad"])
            out["zl_h"] = jnp.where(boundary, energy, st["zl_h"])

        t_new = jnp.where(boundary, t + 1, t)
        all_done = t_new >= t_count
        if traced_cap:
            # next transition's depth cap: masked-sum lookup (no per-chain
            # dynamic gather — see the scatter/gather landmine in CLAUDE.md)
            t_safe = jnp.minimum(t_new, t_count - 1)
            cap_next = jnp.sum(
                jnp.where(jnp.arange(t_count) == t_safe, depth_caps, 0)
            ).astype(st2["cap"].dtype)
            cap_next = jnp.where(boundary, cap_next, st2["cap"])

        # --- in-loop per-chain adaptation at the boundary (warmup mode) ---
        if adaptive:
            tt = jnp.minimum(t, t_count - 1)
            flags_t = {k: adapt_flags[k][tt] for k in
                       ("is_adapt", "in_window", "window_end", "is_last")}
            alpha_tr = st2["sum_alpha"] / jnp.maximum(
                n_alpha.astype(dtype), 1.0
            )
            ad_new = _adapt_step(adapt_cfg, st["ad"], zc_theta, zc_grad,
                                 alpha_tr, flags_t)
            ad = jax.tree_util.tree_map(
                lambda a, b: jnp.where(boundary, a, b), ad_new, st["ad"]
            )
            nominal_eps = ad.da.eps
            m_inv_next = ad.mm.m_inv if adaptive_metric else None
            if adaptive_metric and dense_in_state:
                # refresh the momentum-draw factor whenever the estimate can
                # have moved (Stan window end); elsewhere keep the carried
                # factor — m_inv only changes at window ends, so this stays
                # exactly consistent with the m_inv merge below
                chol_next = jnp.where(
                    flags_t["window_end"] & boundary,
                    jnp.linalg.cholesky(m_inv_next).T,
                    st["chol_u"],
                )
            else:
                chol_next = None
        else:
            ad = None
            nominal_eps = None
            m_inv_next = None
            chol_next = None

        # --- prepare the next transition (masked) ---
        key2, k_ref, k_slice, k_jit = jax.random.split(st2["key"], 4)
        if metric_in_state and dense_in_state:
            from .metrics import DenseEuclideanMetric as _DnEM

            if adaptive_metric:
                h_b = h.replace(metric=_DnEM(m_inv=m_inv_next,
                                             chol_u=chol_next))
            else:
                h_b = h.replace(metric=_DnEM(m_inv=st2["m_inv"],
                                             chol_u=st2["chol_u"]))
        elif adaptive_metric or metric_in_state:
            from .metrics import DiagEuclideanMetric as _DEM

            mi = m_inv_next if adaptive_metric else st2["m_inv"]
            h_b = h.replace(metric=_DEM(m_inv=mi, sqrt_m_inv=jnp.sqrt(mi)))
        else:
            h_b = h
        if slim:
            # full refreshment inlined on the slim record (≡ refresh())
            z_next = h_b.phasepoint(zc_theta, h_b.rand_momentum(k_ref),
                                    logdensity=zc_ld, grad=zc_grad)
        else:
            z_next = refreshment.refresh(k_ref, h_b, zc)
        h0n = z_next.energy()
        if ts == SLICE:
            lun = -h0n - rand_exponential(k_slice, dtype=edtype)
        else:
            lun = jnp.zeros_like(h0n)
        if adaptive:
            integ_b = integ.with_nom_step_size(nominal_eps)
        elif eps_batch is not None:
            integ_b = integ.with_nom_step_size(st["eps_nom"])
        else:
            integ_b = integ
        eps_next = integ_b.jitter(k_jit).current_step_size

        fresh = fresh_fields(z_next, h0n, lun,
                             m_inv=(m_inv_next if adaptive_metric
                                    else st2["m_inv"] if dense_in_state
                                    else None))
        reset = boundary & jnp.logical_not(all_done)
        merged = {}
        for k in inner_keys:
            if k == "key":
                merged[k] = key2
            elif k == "cap":
                merged[k] = cap_next
            elif k == "eps":
                merged[k] = jnp.where(reset, eps_next, st2["eps"])
            elif k == "ad":
                merged[k] = ad
            elif k == "m_inv" and adaptive_metric:
                merged[k] = jnp.where(reset, m_inv_next, st2["m_inv"])
            elif k == "chol_u" and adaptive_metric and dense_in_state:
                merged[k] = jnp.where(reset, chol_next, st2["chol_u"])
            elif k in fresh:
                merged[k] = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(reset, a, b), fresh[k], st2[k]
                )
            else:
                merged[k] = st2[k]
        if eps_batch is not None:
            merged["eps_nom"] = st["eps_nom"]
        return dict(merged, t=t_new, all_done=all_done, **out)

    if unroll > 1:
        # U leaves per while-loop iteration: the (max_depth, dim) checkpoint
        # stacks and output buffers — the dominant HBM carry traffic (PERF.md)
        # — are written once per U leaves instead of every leaf. Chains that
        # finish mid-iteration are frozen by the all_done guard (identical
        # semantics; at most U-1 wasted leaf computations per chain).
        inner_body = fbody

        def fbody_unrolled(st):
            for _ in range(unroll):
                st2 = inner_body(st)
                st = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(st["all_done"], a, b), st, st2
                )
            return st

        fbody = fbody_unrolled

    if batched and use_staged:
        out_names = ["out_theta"] + [f"out_{k}" for k in stat_dtypes]
        vbody = jax.vmap(lambda st: fbody(st, staged=True))
        slots = jnp.arange(t_count)

        def cond_inner(st):
            return jnp.any(jnp.logical_not(st["all_done"])) & jnp.logical_not(
                jnp.any(st["stg_cnt"] >= stage_slots)
            )

        def outer_body(full):
            st = {k: v for k, v in full.items() if k not in out_names}
            st = jax.lax.while_loop(cond_inner, vbody, st)
            out = {k: full[k] for k in out_names}
            # Single-pass flush: combine ALL staged rows into one masked
            # write per buffer via a one-hot matmul (an NS-sequential
            # select chain would rewrite the (C, T, D) buffer NS times per
            # segment — measured 34% slower end-to-end at NS=3, fuse=16).
            j_idx = jnp.arange(stage_slots)
            valid = j_idx[None, :] < st["stg_cnt"][:, None]        # (C, NS)
            oh = (st["stg_slot"][:, :, None] == slots[None, None, :]) \
                & valid[:, :, None]                                # (C,NS,T)
            ohf = oh.astype(dtype)
            mask = jnp.any(oh, axis=1)                             # (C, T)
            vth = jnp.einsum(
                "cjt,cjd->ctd", ohf, st["stg_theta"].astype(dtype),
                precision=jax.lax.Precision.HIGHEST,
            )
            out["out_theta"] = jnp.where(
                mask[:, :, None], vth.astype(out["out_theta"].dtype),
                out["out_theta"],
            )
            for k in stat_dtypes:
                vk = jnp.einsum(
                    "cjt,cj->ct", ohf, st[f"stg_{k}"].astype(dtype),
                    precision=jax.lax.Precision.HIGHEST,
                )
                out[f"out_{k}"] = jnp.where(
                    mask, vk.astype(out[f"out_{k}"].dtype), out[f"out_{k}"]
                )
            return dict(st, stg_cnt=jnp.zeros_like(st["stg_cnt"]), **out)

        final = jax.lax.while_loop(
            lambda full: jnp.any(jnp.logical_not(full["all_done"])),
            outer_body,
            fstate,
        )
    elif batched and ragged:
        # run until the SLOWEST chain has t_min transitions; faster chains
        # keep collecting (capacity-frozen at t_count via all_done/act)
        final = jax.lax.while_loop(
            lambda st: jnp.any(st["t"] < t_min),
            jax.vmap(fbody),
            fstate,
        )
    elif batched and pack_carry:
        final = _packed_while_loop("all_done", jax.vmap(fbody), fstate,
                                   pack_carry)
    elif batched:
        final = jax.lax.while_loop(
            lambda st: jnp.any(jnp.logical_not(st["all_done"])),
            jax.vmap(fbody),
            fstate,
        )
    else:
        final = jax.lax.while_loop(fcond, fbody, fstate)

    # Constant-filled leaves: the one-hot buffers above are zero past each
    # chain's count by construction; `is_accept` and `nom_step_size` are
    # synthesized here, so in ragged mode mask them with the validity mask
    # too (a counts-unaware consumer then sees zeros, consistent with the
    # other leaves). In per-chain-eps mode emit each chain's own nominal eps
    # rather than broadcasting the representative chain's.
    if eps_batch is not None:
        nom_eps = jnp.broadcast_to(final["eps_nom"][..., None],
                                   final["out_eps"].shape)
    else:
        nom_eps = jnp.broadcast_to(integ.nom_step_size,
                                   final["out_eps"].shape)
    accepted = jnp.ones(final["out_n_steps"].shape, bool)
    if ragged:
        valid = jnp.arange(t_count)[None, :] < final["t"][:, None]
        accepted = accepted & valid
        nom_eps = jnp.where(valid, nom_eps, 0)
    stats = {
        "n_steps": final["out_n_steps"],
        "is_accept": accepted,
        "acceptance_rate": final["out_alpha"],
        "log_density": final["out_logdensity"],
        "hamiltonian_energy": final["out_energy"],
        "hamiltonian_energy_error": final["out_energy_error"],
        "max_hamiltonian_energy_error": final["out_dh_max"],
        "tree_depth": final["out_depth"],
        "numerical_error": final["out_diverged"],
        "step_size": final["out_eps"],
        "nom_step_size": nom_eps,
    }
    if ragged:
        # resume from the last COMPLETED transition's candidate, not the
        # (possibly mid-tree) zcand
        zf = dict(theta=final["zl_theta"], ld=final["zl_ld"],
                  grad=final["zl_grad"], h=final["zl_h"])
    elif slim:
        zf = final["zcand"]
    if slim:
        # Reconstruct a full PhasePoint for the caller's state. The momentum
        # is zeroed (it is statistically meaningless post-transition and is
        # resampled before any further use); neg_k is set so energy() still
        # reproduces the candidate's true energy.
        z_final = PhasePoint(theta=zf["theta"], r=jnp.zeros_like(zf["theta"]),
                             logdensity=zf["ld"], grad=zf["grad"],
                             neg_k=-zf["h"] - zf["ld"])
    else:
        z_final = final["zcand"]
    out_thetas = final["out_theta"].astype(dtype)
    if ragged:
        return z_final, out_thetas, stats, final["t"]
    if adaptive:
        return z_final, out_thetas, stats, final["ad"]
    return z_final, out_thetas, stats
