"""One-pass value-and-gradient Pallas kernel for logistic likelihoods.

The XLA lowering of the analytic logistic gradient is two MXU matmuls
(logits = θ·Xᵀ, grad = resid·X) with a materialised (chains, n) residual
between them — at bench shape (4096 × 1000) that boundary is a ~32 MB HBM
round trip per leapfrog step, ~20% of the NUTS hot-loop wall (PERF.md).
This kernel fuses forward, sigmoid, reduction, and backward into one
program per chain block, holding the (block, n) logits entirely in VMEM:
HBM traffic drops to θ-in + grad-out (~4 MB).

Numerics match the XLA path: matmul inputs are cast to bfloat16 (exactly
what XLA's default dot precision does on TPU) with float32 accumulation;
the log-likelihood reduction stays float32.

Data layout (mirrors `hierarchical_logistic_block`, models/logistic.py):
`xt` is (dim, n_pad) with row 0 zero — the slot of a non-likelihood
parameter such as the hierarchical log σ — so the full θ block multiplies
without slicing, and the returned gradient's row-0 component is exactly 0.
Padded observation columns carry y = 0 and weight w = 0, which zeroes both
their log-likelihood terms and their residuals.

Capability note: the reference has no fused-likelihood machinery (its
hot-loop cost model is Julia broadcast, ref src/integrator.jl:216-265);
this is TPU-native performance work on top of the same target contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(theta_ref, xt_ref, yw_ref, lp_ref, gl_ref):
    th = theta_ref[:].astype(jnp.bfloat16)            # (BC, dim)
    xm = xt_ref[:]                                    # (dim, n_pad) bf16
    logits = jnp.dot(th, xm, preferred_element_type=jnp.float32)
    yv = yw_ref[0:1, :]                               # (1, n_pad)
    wv = yw_ref[1:2, :]
    # Bernoulli log likelihood, stable form; padded columns (y=0, w=0)
    # contribute exactly 0
    ll = yv * logits - wv * jnp.logaddexp(0.0, logits)
    lp_ref[:] = jnp.sum(ll, axis=1, keepdims=True)
    resid = (yv - wv * jax.nn.sigmoid(logits)).astype(jnp.bfloat16)
    gl_ref[:] = jax.lax.dot_general(
        resid, xm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def fused_logistic_value_grad(x, y, *, block_chains: int = 512,
                              interpret: bool = False):
    """Build `apply(thetas (C, dim) f32) -> (loglik (C,), grad (C, dim))`.

    `x` is the (n, p) design matrix, `y` the (n,) 0/1 responses; dim = p+1
    with parameter 0 not entering the likelihood (the hierarchical log σ).
    The gradient returned is the LIKELIHOOD part only (component 0 is 0);
    prior terms are added by the caller.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y, jnp.float32)
    n, p = x.shape
    dim = p + 1
    n_pad = max(1024, ((n + 127) // 128) * 128)
    xt = jnp.zeros((dim, n_pad), jnp.bfloat16)
    xt = xt.at[1:, :n].set(x.T.astype(jnp.bfloat16))
    yw = jnp.zeros((2, n_pad), jnp.float32)
    yw = yw.at[0, :n].set(y).at[1, :n].set(1.0)

    @functools.partial(jax.jit, static_argnames=())
    def apply(thetas):
        c = thetas.shape[0]
        bc = min(block_chains, max(8, c))
        c_pad = ((c + bc - 1) // bc) * bc
        th = thetas
        if c_pad != c:
            th = jnp.pad(thetas, ((0, c_pad - c), (0, 0)))
        lp, gl = pl.pallas_call(
            _kernel,
            grid=(c_pad // bc,),
            in_specs=[
                pl.BlockSpec((bc, dim), lambda i: (i, 0)),
                pl.BlockSpec((dim, n_pad), lambda i: (0, 0)),
                pl.BlockSpec((2, n_pad), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bc, 1), lambda i: (i, 0)),
                pl.BlockSpec((bc, dim), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((c_pad, dim), jnp.float32),
            ],
            interpret=interpret,
        )(th, xt, yw)
        return lp[:c, 0], gl[:c]

    return apply
