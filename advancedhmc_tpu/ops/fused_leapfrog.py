"""Pallas TPU kernel: fully-fused multi-step leapfrog for diagonal-Gaussian
targets (the 'vectorized chains' regime of the reference's CUDA extension —
1000s of chains × small dim, /root/reference/test/CUDA/cuda.jl:14-31).

Why a kernel: XLA compiles a scan of leapfrog steps with the loop carry
round-tripping HBM every iteration. For small-state chains the whole batch
block fits in VMEM, so running all L steps inside one Pallas kernel removes
the per-step HBM traffic entirely — the kick/drift/kick arithmetic is pure
VPU work on resident registers/VMEM.

Scope: GaussianKinetic + DiagEuclideanMetric + a diagonal-Gaussian target
(∇logπ = -prec ⊙ θ). The sampler auto-dispatches to this kernel via
`ops.try_fused_static_leapfrog`; everything else takes the generic XLA path.
Falls back to a pure-jnp reference implementation off-TPU (interpret mode is
used in CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(theta_ref, r_ref, prec_ref, m_inv_ref, eps_ref,
            theta_out, r_out, pot_out, kin_out, *, n_steps):
    eps = eps_ref[0]
    th = theta_ref[:]
    r = r_ref[:]
    prec = prec_ref[:]          # (1, D) broadcast over the chain block
    m_inv = m_inv_ref[:]

    g = -prec * th              # ∇logπ for the diagonal Gaussian

    def body(i, carry):
        th, r, g = carry
        r = r + 0.5 * eps * g
        th = th + eps * (m_inv * r)
        g = -prec * th
        r = r + 0.5 * eps * g
        return th, r, g

    th, r, g = jax.lax.fori_loop(0, n_steps, body, (th, r, g))

    theta_out[:] = th
    r_out[:] = r
    pot_out[:] = 0.5 * jnp.sum(prec * th * th, axis=1, keepdims=True)
    kin_out[:] = 0.5 * jnp.sum(m_inv * r * r, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("n_steps", "block_chains", "interpret"))
def fused_gaussian_leapfrog(theta, r, prec, m_inv, eps, n_steps: int,
                            block_chains: int = 256, interpret: bool = False):
    """Run `n_steps` leapfrog steps for all chains in one fused kernel.

    theta, r: (C, D); prec, m_inv: (D,); eps scalar.
    Returns (theta', r', potential_energy (C,), kinetic_energy (C,)).
    """
    c, d = theta.shape
    dtype = theta.dtype
    d_pad = _round_up(d, 128)
    c_pad = _round_up(c, block_chains)

    th = jnp.zeros((c_pad, d_pad), dtype).at[:c, :d].set(theta)
    rr = jnp.zeros((c_pad, d_pad), dtype).at[:c, :d].set(r)
    # zero-padded dims: prec=0 keeps gradient 0; m_inv=0 keeps them frozen
    pr = jnp.zeros((1, d_pad), dtype).at[0, :d].set(prec)
    mi = jnp.zeros((1, d_pad), dtype).at[0, :d].set(m_inv)
    ep = jnp.asarray([eps], dtype)

    grid = (c_pad // block_chains,)
    blk = lambda i: (i, 0)
    out_shapes = (
        jax.ShapeDtypeStruct((c_pad, d_pad), dtype),
        jax.ShapeDtypeStruct((c_pad, d_pad), dtype),
        jax.ShapeDtypeStruct((c_pad, 1), dtype),
        jax.ShapeDtypeStruct((c_pad, 1), dtype),
    )
    theta2, r2, pot, kin = pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_chains, d_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, d_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_chains, d_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, d_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, 1), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(th, rr, pr, mi, ep)

    return (
        theta2[:c, :d],
        r2[:c, :d],
        pot[:c, 0],
        kin[:c, 0],
    )


def reference_gaussian_leapfrog(theta, r, prec, m_inv, eps, n_steps: int):
    """Pure-XLA reference (scan) for correctness and speed comparison."""

    def step(carry, _):
        th, rr, g = carry
        rr = rr + 0.5 * eps * g
        th = th + eps * (m_inv * rr)
        g = -prec * th
        rr = rr + 0.5 * eps * g
        return (th, rr, g), None

    g0 = -prec * theta
    (th, rr, _), _ = jax.lax.scan(step, (theta, r, g0), None, length=n_steps)
    pot = 0.5 * jnp.sum(prec * th * th, axis=-1)
    kin = 0.5 * jnp.sum(m_inv * rr * rr, axis=-1)
    return th, rr, pot, kin
