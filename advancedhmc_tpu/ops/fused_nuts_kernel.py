"""Pallas TPU megakernel: fused multi-transition NUTS with VMEM-resident state.

The XLA while-loop NUTS (nuts.py) is bandwidth-bound on its loop carry: every
leaf iteration rewrites the checkpoint stacks and tree state through HBM
(~240 µs/leaf at 4096×100 vs ~50 µs for the bare leapfrog — PERF.md). This
kernel runs the ENTIRE async multi-transition draw phase for a block of
chains inside one Pallas kernel: stacks, tree state, and the target's data
all live in VMEM, so per-leaf cost approaches the gradient arithmetic.

Scope (the production fast path; everything else uses the XLA path):
  * diagonal (or unit) Euclidean metric, Gaussian kinetic;
  * multinomial trajectory sampling + Generalised no-U-turn criterion
    (the NUTS(δ) default, ref abstractmcmc.jl:415-419);
  * full momentum refreshment, fixed step size per call;
  * any jax-traceable target expressed as a *block* function
    `value_and_grad_block(theta (B, Dp)) -> (logp (B, 1), grad (B, Dp))`
    closing over VMEM-resident data refs (dims may be zero-padded to the
    128-lane boundary; padded dims must have m_inv = 0).

Randomness comes from the per-core Pallas PRNG (counter-based, seeded per
chain block) — a different stream than the host threefry path, with
identical distributions (normals via Box-Muller, Exp(1) via -log U).

Semantics mirror nuts_transitions_fused exactly (same leaf order, U-turn
check set, reservoir/biased-progressive sampling, divergence handling);
equivalence is tested distributionally against the XLA path.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _splitmix32(x):
    """Counter-based 32-bit mixer (splitmix32) — identical on CPU interpret
    and compiled TPU (the pltpu hardware PRNG is unimplemented in interpret
    mode), statistically solid for proposal randomness."""
    x = x.astype(jnp.uint32)
    sr = lambda v, k: jax.lax.shift_right_logical(v, jnp.uint32(k))
    x = (x + jnp.uint32(0x9E3779B9)) & jnp.uint32(0xFFFFFFFF)
    x = x ^ sr(x, 16)
    x = (x * jnp.uint32(0x21F0AAAD)) & jnp.uint32(0xFFFFFFFF)
    x = x ^ sr(x, 15)
    x = (x * jnp.uint32(0x735A2D97)) & jnp.uint32(0xFFFFFFFF)
    x = x ^ sr(x, 15)
    return x


def _bits(ctr, shape, salt):
    """Random uint32s for a (rows, cols) shape from counter + lane index."""
    n = shape[0] * shape[1]
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shape[1]
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ).astype(jnp.uint32)
    base = (ctr.astype(jnp.uint32) * jnp.uint32(2654435761)
            + jnp.uint32(salt) * jnp.uint32(40503))
    return _splitmix32(_splitmix32(idx + base) ^ (idx * jnp.uint32(0x9E3779B9)))


def _uniform(ctr, shape, salt):
    """U(0,1) in (2^-24, 1] from 24 high bits."""
    u24 = jax.lax.shift_right_logical(_bits(ctr, shape, salt), jnp.uint32(8))
    # Mosaic lacks uint32→f32 casts; u24 < 2^24 is exactly representable
    # through an int32 reinterpretation.
    u24_i = jax.lax.bitcast_convert_type(u24, jnp.int32)
    return (u24_i.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)


def _normal(ctr, shape, salt):
    """Standard normals via Box-Muller."""
    u1 = _uniform(ctr, shape, salt)
    u2 = _uniform(ctr, shape, salt + 101)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def _exponential(ctr, shape, salt):
    return -jnp.log(_uniform(ctr, shape, salt))


def _tz(x):
    """Trailing zeros of positive int32 (B, 1) via popcount trick."""
    ux = x.astype(jnp.uint32)
    low = ux & (jnp.uint32(0) - ux)
    return jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32)


def _t_ones(x):
    inv = ~x.astype(jnp.uint32)
    low = inv & (jnp.uint32(0) - inv)
    return jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32)


def make_fused_nuts_kernel(
    value_and_grad_block: Callable,
    dim: int,
    max_depth: int = 8,
    delta_max: float = 1000.0,
):
    """Build the kernel body. `value_and_grad_block` must accept the PADDED
    (B, Dp) position block and return ((B, 1) logp, (B, Dp) grad); it may read
    any refs passed as extra kernel inputs (closed over positionally)."""

    S = max_depth
    K = max_depth - 1

    def kernel(seed_ref, eps_ref, theta0_ref, m_inv_ref, *rest, n_transitions):
        data_refs = rest[:-4]
        out_theta, out_nsteps, out_depth, out_diverged = rest[-4:]

        rng_base = (seed_ref[0] * jnp.int32(7919)
                    + pl.program_id(0) * jnp.int32(104729))
        eps = eps_ref[0]
        b, dp = theta0_ref.shape
        T = n_transitions

        # outputs are read-modify-written inside the loop: zero-init first
        out_theta[:] = jnp.zeros_like(out_theta)
        out_nsteps[:] = jnp.zeros_like(out_nsteps)
        out_depth[:] = jnp.zeros_like(out_depth)
        out_diverged[:] = jnp.zeros_like(out_diverged)

        m_inv = m_inv_ref[:]               # (1, Dp); padded dims are 0
        sqrt_m = jnp.sqrt(m_inv)           # momentum scale = 1/sqrt(m_inv)
        inv_sqrt_m_inv = jnp.where(m_inv > 0, 1.0 / jnp.maximum(sqrt_m, 1e-30),
                                   0.0)

        vg = lambda th: value_and_grad_block(th, *data_refs)

        def rand_momentum(ctr, salt):
            return _normal(rng_base + ctr, (b, dp), salt) * inv_sqrt_m_inv

        def neg_kin(r):
            return -0.5 * jnp.sum(r * r * m_inv, axis=1, keepdims=True)

        def vel(r):
            return r * m_inv

        # ---- initial transition state ----
        th0 = theta0_ref[:]
        lp0, g0 = vg(th0)
        r0 = rand_momentum(jnp.int32(0), 1)
        h0_init = -(lp0 + neg_kin(r0))

        zeros_bd = jnp.zeros((b, dp), jnp.float32)
        izeros = jnp.zeros((b, 1), jnp.int32)
        fzeros = jnp.zeros((b, 1), jnp.float32)

        neg_inf = jnp.float32(-jnp.inf)

        carry0 = dict(
            # edge phase point (integration frontier)
            th_e=th0, r_e=r0, g_e=g0,
            # tree edges (phase points needed to restart doublings)
            th_l=th0, r_l=r0, g_l=g0,
            th_r=th0, r_r=r0, g_r=g0,
            # candidates
            th_c=th0, lp_c=lp0, g_c=g0, e_c=h0_init,
            th_sc=th0, lp_sc=lp0, g_sc=g0, e_sc=h0_init,
            # subtree first leaf
            th_f=th0, r_f=r0, g_f=g0,
            rho_t=r0, rho_s=zeros_bd,
            ck_r=tuple(zeros_bd for _ in range(S)),
            ck_cum=tuple(zeros_bd for _ in range(S)),
            # scalars
            h0=h0_init,
            t_w=fzeros, s_w=jnp.full((b, 1), neg_inf),
            sum_alpha=fzeros, n_alpha=izeros,
            depth=izeros, leaf=izeros, v=jnp.ones((b, 1), jnp.int32),
            diverged=izeros,
            t=izeros, all_done=izeros,
            it=jnp.zeros((), jnp.int32),
            ctr=jnp.ones((), jnp.int32),
        )

        max_iters = jnp.int32(T * (2 ** S) + 16)

        def cond(c):
            return jnp.logical_not(jnp.all(c["all_done"] != 0)) & (
                c["it"] < max_iters
            )

        def body(c):
            ctr = rng_base + c["ctr"]
            start = c["leaf"] == 0                       # (B, 1) bool
            # direction
            u_dir = _uniform(ctr, (b, 1), 2)
            v_draw = jnp.where(u_dir < 0.5, -1, 1).astype(jnp.int32)
            v = jnp.where(start, v_draw, c["v"])
            fwd = v > 0
            th_e = jnp.where(start, jnp.where(fwd, c["th_r"], c["th_l"]), c["th_e"])
            r_e = jnp.where(start, jnp.where(fwd, c["r_r"], c["r_l"]), c["r_e"])
            g_e = jnp.where(start, jnp.where(fwd, c["g_r"], c["g_l"]), c["g_e"])
            rho_s = jnp.where(start, zeros_bd, c["rho_s"])
            s_w = jnp.where(start, neg_inf, c["s_w"])

            # ---- one leapfrog step ----
            eps_s = eps * v.astype(jnp.float32)
            r_half = r_e + 0.5 * eps_s * g_e
            th_n = th_e + eps_s * (r_half * m_inv)
            lp_n, g_n = vg(th_n)
            lp_n = jnp.where(jnp.isfinite(lp_n), lp_n, neg_inf)
            r_n = r_half + 0.5 * eps_s * g_n
            nk = neg_kin(r_n)
            nk = jnp.where(jnp.isfinite(nk), nk, neg_inf)
            h_n = -(lp_n + nk)
            dh = h_n - c["h0"]
            alpha_leaf = jnp.exp(jnp.minimum(0.0, -dh))
            alpha_leaf = jnp.where(jnp.isnan(alpha_leaf), 0.0, alpha_leaf)
            vel_n = vel(r_n)

            i = c["leaf"]

            # multinomial leaf weight + reservoir
            lw_leaf = -dh
            new_sw = jnp.logaddexp(s_w, lw_leaf)
            u_res = _uniform(ctr, (b, 1), 3)
            take = jnp.log(u_res) < lw_leaf - new_sw
            diverging = jnp.logical_not(dh < delta_max)
            s_w = new_sw

            th_sc = jnp.where(take, th_n, c["th_sc"])
            lp_sc = jnp.where(take, lp_n, c["lp_sc"])
            g_sc = jnp.where(take, g_n, c["g_sc"])
            e_sc = jnp.where(take, h_n, c["e_sc"])

            rho_s = rho_s + r_n
            sum_alpha = c["sum_alpha"] + alpha_leaf
            n_alpha = c["n_alpha"] + 1
            th_f = jnp.where(start, th_n, c["th_f"])
            r_f = jnp.where(start, r_n, c["r_f"])
            g_f = jnp.where(start, g_n, c["g_f"])

            # ---- U-turn checks over aligned spans (k = 1..K unrolled) ----
            i_even = (i % 2) == 0
            tones = _t_ones(i)
            s_turning = izeros != 0  # (B, 1) all-False
            ck_r, ck_cum = c["ck_r"], c["ck_cum"]
            for k in range(1, K + 1):
                span = 1 << k
                a = i - span + 1
                active = jnp.logical_not(i_even) & (k <= tones) & (a >= 0)
                a_safe = jnp.maximum(a, 0)
                slot = jnp.where(a_safe == 0, S - 1,
                                 jnp.minimum(_tz(jnp.maximum(a_safe, 1)), S - 1))
                r_a = zeros_bd
                cum_a = zeros_bd
                for s_idx in range(S):
                    m = (slot == s_idx).astype(jnp.float32)
                    r_a = r_a + m * ck_r[s_idx]
                    cum_a = cum_a + m * ck_cum[s_idx]
                rho_span = rho_s - cum_a + r_a
                d1 = jnp.sum(rho_span * (r_a * m_inv), axis=1, keepdims=True)
                d2 = jnp.sum(rho_span * vel_n, axis=1, keepdims=True)
                s_turning = s_turning | (active & ((d1 <= 0) | (d2 <= 0)))

            s_diverged = diverging
            # (divergence earlier in the subtree already ended the doubling)

            # ---- store checkpoints (even leaves) ----
            tz_i = jnp.where(i == 0, S - 1,
                             jnp.minimum(_tz(jnp.maximum(i, 1)), S - 1))
            ck_r = tuple(
                jnp.where((tz_i == s_idx) & i_even, r_n, ck_r[s_idx])
                for s_idx in range(S)
            )
            ck_cum = tuple(
                jnp.where((tz_i == s_idx) & i_even, rho_s, ck_cum[s_idx])
                for s_idx in range(S)
            )

            # ---- doubling complete? ----
            n_leaves = jnp.left_shift(jnp.int32(1), c["depth"])
            sub_done = s_turning | s_diverged
            complete = sub_done | (i >= n_leaves - 1)
            not_term = jnp.logical_not(sub_done)

            # subtree tree-order edges
            s_th_l = jnp.where(fwd, th_f, th_n)
            s_r_l = jnp.where(fwd, r_f, r_n)
            s_g_l = jnp.where(fwd, g_f, g_n)
            s_th_r = jnp.where(fwd, th_n, th_f)
            s_r_r = jnp.where(fwd, r_n, r_f)
            s_g_r = jnp.where(fwd, g_n, g_f)

            # biased progressive sampling
            e_mh = _exponential(ctr, (b, 1), 4)
            mh_take = c["t_w"] < s_w + e_mh
            acc = complete & not_term & mh_take
            th_c = jnp.where(acc, th_sc, c["th_c"])
            lp_c = jnp.where(acc, lp_sc, c["lp_c"])
            g_c = jnp.where(acc, g_sc, c["g_c"])
            e_c = jnp.where(acc, e_sc, c["e_c"])

            # combined tree
            c_th_l = jnp.where(fwd, c["th_l"], s_th_l)
            c_r_l = jnp.where(fwd, c["r_l"], s_r_l)
            c_g_l = jnp.where(fwd, c["g_l"], s_g_l)
            c_th_r = jnp.where(fwd, s_th_r, c["th_r"])
            c_r_r = jnp.where(fwd, s_r_r, c["r_r"])
            c_g_r = jnp.where(fwd, s_g_r, c["g_r"])
            c_rho = c["rho_t"] + rho_s

            fl = jnp.sum(c_rho * (c_r_l * m_inv), axis=1, keepdims=True) <= 0
            fr = jnp.sum(c_rho * (c_r_r * m_inv), axis=1, keepdims=True) <= 0
            full_turn = fl | fr

            c_w = jnp.logaddexp(c["t_w"], s_w)
            depth_new = c["depth"] + jnp.where(complete & not_term, 1, 0)
            diverged_new = (c["diverged"] != 0) | (complete & s_diverged)
            done_new = (complete & (sub_done | full_turn)) | (depth_new >= S)

            selv = lambda p, a_, b_: jnp.where(p, a_, b_)
            nxt = dict(
                th_e=th_n, r_e=r_n, g_e=g_n,
                th_l=selv(complete, c_th_l, c["th_l"]),
                r_l=selv(complete, c_r_l, c["r_l"]),
                g_l=selv(complete, c_g_l, c["g_l"]),
                th_r=selv(complete, c_th_r, c["th_r"]),
                r_r=selv(complete, c_r_r, c["r_r"]),
                g_r=selv(complete, c_g_r, c["g_r"]),
                th_c=th_c, lp_c=lp_c, g_c=g_c, e_c=e_c,
                th_sc=th_sc, lp_sc=lp_sc, g_sc=g_sc, e_sc=e_sc,
                th_f=th_f, r_f=r_f, g_f=g_f,
                rho_t=selv(complete, c_rho, c["rho_t"]),
                rho_s=rho_s,
                ck_r=ck_r, ck_cum=ck_cum,
                h0=c["h0"],
                t_w=selv(complete, c_w, c["t_w"]),
                s_w=selv(complete, jnp.full((b, 1), neg_inf), s_w),
                sum_alpha=sum_alpha,
                n_alpha=n_alpha,
                depth=depth_new,
                leaf=selv(complete, 0, i + 1),
                v=v,
                diverged=diverged_new.astype(jnp.int32),
                t=c["t"], all_done=c["all_done"],
                it=c["it"] + 1,
                ctr=c["ctr"] + 1,
            )

            # ---------- transition boundary ----------
            boundary = done_new & (c["all_done"] == 0)
            t = c["t"]
            t_new = jnp.where(boundary, t + 1, t)
            all_done = t_new >= T

            # fresh transition from the candidate with refreshed momentum
            r_new0 = rand_momentum(c["ctr"], 5)
            nk0 = neg_kin(r_new0)
            h0_new = -(nxt["lp_c"] + nk0)
            reset = boundary & jnp.logical_not(all_done)

            def rst(name, fresh):
                nxt[name] = jnp.where(reset, fresh, nxt[name])

            rst("th_e", nxt["th_c"]); rst("r_e", r_new0); rst("g_e", nxt["g_c"])
            rst("th_l", nxt["th_c"]); rst("r_l", r_new0); rst("g_l", nxt["g_c"])
            rst("th_r", nxt["th_c"]); rst("r_r", r_new0); rst("g_r", nxt["g_c"])
            rst("th_sc", nxt["th_c"]); rst("lp_sc", nxt["lp_c"])
            rst("g_sc", nxt["g_c"]); rst("e_sc", h0_new)
            rst("th_f", nxt["th_c"]); rst("r_f", r_new0); rst("g_f", nxt["g_c"])
            rst("rho_t", r_new0); rst("rho_s", zeros_bd)
            rst("h0", h0_new)
            rst("t_w", fzeros)
            rst("s_w", jnp.full((b, 1), neg_inf))
            rst("sum_alpha", fzeros)
            nxt["n_alpha"] = jnp.where(reset, izeros, nxt["n_alpha"])
            nxt["depth"] = jnp.where(reset, izeros, nxt["depth"])
            nxt["leaf"] = jnp.where(reset, izeros, nxt["leaf"])
            nxt["diverged"] = jnp.where(reset, 0, nxt["diverged"])
            nxt["e_c"] = jnp.where(reset, h0_new, nxt["e_c"])

            nxt["t"] = t_new
            nxt["all_done"] = ((c["all_done"] != 0) | all_done).astype(jnp.int32)

            # record outputs at slot t (one-hot over T) when boundary fires
            div_i = diverged_new.astype(jnp.int32)
            for t_idx in range(T):
                mi = boundary & (t == t_idx)              # (B, 1)
                mrec = mi.astype(jnp.float32)
                out_theta[:, t_idx, :] = (
                    mrec * nxt["th_c"]
                    + (1.0 - mrec) * out_theta[:, t_idx, :]
                )
                out_nsteps[:, t_idx:t_idx + 1] = jnp.where(
                    mi, n_alpha, out_nsteps[:, t_idx:t_idx + 1])
                out_depth[:, t_idx:t_idx + 1] = jnp.where(
                    mi, depth_new, out_depth[:, t_idx:t_idx + 1])
                out_diverged[:, t_idx:t_idx + 1] = jnp.where(
                    mi, div_i, out_diverged[:, t_idx:t_idx + 1])

            return nxt

        jax.lax.while_loop(cond, body, carry0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("value_and_grad_block", "dim", "n_transitions",
                     "max_depth", "block_chains", "interpret",
                     "vmem_limit_mb"),
)
def fused_nuts_pallas(
    value_and_grad_block,
    theta0,                      # (C, dim)
    m_inv,                       # (dim,)
    eps,
    seed,
    data: Sequence,              # tuple of data arrays for the target
    dim: int,
    n_transitions: int = 16,
    max_depth: int = 8,
    block_chains: int = 256,
    interpret: bool = False,
    vmem_limit_mb: int = 100,
):
    """Run the fused NUTS megakernel over all chains.

    Returns (thetas (n_transitions, C, dim), n_steps (n_transitions, C),
    depth, diverged)."""
    c, d = theta0.shape
    dp = _round_up(d, 128)
    cp = _round_up(c, block_chains)
    T = n_transitions

    th = jnp.zeros((cp, dp), jnp.float32).at[:c, :d].set(theta0)
    mi = jnp.zeros((1, dp), jnp.float32).at[0, :d].set(m_inv)

    kernel = make_fused_nuts_kernel(value_and_grad_block, dim, max_depth)
    grid = (cp // block_chains,)
    blk = lambda i: (i, 0)
    blk3 = lambda i: (i, 0, 0)

    data_specs = [
        pl.BlockSpec(a.shape, (lambda nd: (lambda i: tuple([0] * nd)))(a.ndim),
                     memory_space=pltpu.VMEM)
        for a in data
    ]

    out_shapes = (
        jax.ShapeDtypeStruct((cp, T, dp), jnp.float32),
        jax.ShapeDtypeStruct((cp, T), jnp.int32),
        jax.ShapeDtypeStruct((cp, T), jnp.int32),
        jax.ShapeDtypeStruct((cp, T), jnp.int32),
    )
    out_theta, n_steps, depth, diverged = pl.pallas_call(
        functools.partial(kernel, n_transitions=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),   # eps
            pl.BlockSpec((block_chains, dp), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *data_specs,
        ],
        out_specs=(
            pl.BlockSpec((block_chains, T, dp), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, T), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, T), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, T), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=pltpu.InterpretParams() if interpret else False,
        # bigger chain blocks (better MXU shapes) need more scoped VMEM than
        # the 16 MB compiler default; v5e has 128 MB/core to spend.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        ),
    )(jnp.asarray([seed], jnp.int32), jnp.asarray([eps], jnp.float32),
      th, mi, *data)

    thetas = jnp.swapaxes(out_theta[:c, :, :d], 0, 1)     # (T, C, dim)
    return (thetas, jnp.swapaxes(n_steps[:c], 0, 1),
            jnp.swapaxes(depth[:c], 0, 1),
            jnp.swapaxes(diverged[:c], 0, 1).astype(bool))
