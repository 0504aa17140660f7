"""Hierarchical Bayesian logistic regression (BASELINE.md config 4).

The driver's baseline names the German-credit task; this container has zero
egress, so a fixed-seed synthetic design matrix with the same shape
(1000 × 24 features, standardised) stands in. The model is the standard
hierarchical form used in HMC benchmarks:

    log σ ~ N(0, 1)          (global scale hyperparameter)
    β_j   ~ N(0, σ²)         (regression weights)
    y_i   ~ Bernoulli(logit⁻¹(x_iᵀ β))

θ = (log σ, β₁..β_p), dim = p + 1. The likelihood is one (n × p)·(p,) matvec
— with thousands of vmapped chains it becomes a (chains × p)·(p × n) matmul
on the TPU MXU.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp

from ..target import LogDensityTarget


@lru_cache(maxsize=None)
def _synthetic_data(n: int, p: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, p))
    x = (x - x.mean(0)) / x.std(0)
    beta_true = rng.normal(size=(p,)) * 0.5
    logits = x @ beta_true
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float64)
    return x, y


def hierarchical_logistic(
    n: int = 1000, p: int = 24, seed: int = 0, dtype=jnp.float32,
    resid_dtype=None, fused=False, x_dtype=None,
) -> LogDensityTarget:
    """`resid_dtype` (e.g. "bfloat16") stores the Bernoulli residual
    y − σ(logits) — the only tensor crossing the fwd→grad fusion boundary —
    reduced-precision, halving the (chains, n) HBM round trip per gradient
    under vmapped chains. The log density itself (and hence the MH accept)
    stays exact float32; a reduced-precision gradient only perturbs the
    leapfrog flow, which remains reversible and volume-preserving, so the
    sampler is still exact (acceptance, not correctness, absorbs the
    rounding). Residuals are bounded in [−1, 1] — ideal for bf16.

    `x_dtype` (e.g. "bfloat16") stores the DESIGN MATRIX reduced-precision
    (the dominant HBM fetch at large p: x is (n, p) and read once per
    gradient); both model matmuls accumulate in float32 via
    preferred_element_type, so only the 8-bit-mantissa rounding of the
    standardised covariates enters — a data perturbation, not a sampler
    approximation (the perturbed posterior is sampled exactly)."""
    x_np, y_np = _synthetic_data(n, p, seed)
    x = jnp.asarray(x_np, x_dtype if x_dtype is not None else dtype)
    y = jnp.asarray(y_np, dtype)
    dim = p + 1

    # x-side matmuls accumulate at model precision (≥ f32) regardless of
    # the x storage dtype (bf16 inputs, f32 accumulation on the MXU)
    _acc_t = jnp.promote_types(jnp.float32, dtype)

    def _matvec(a, b):
        import jax as _jax

        return _jax.lax.dot_general(
            a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=_acc_t,
        ).astype(dtype)

    def logdensity(theta):
        log_sigma = theta[0]
        beta = theta[1:]
        sigma2 = jnp.exp(2.0 * log_sigma)
        lp = -0.5 * jnp.square(log_sigma)                       # log σ ~ N(0,1)
        lp = lp - 0.5 * jnp.sum(jnp.square(beta)) / sigma2 - p * log_sigma
        logits = _matvec(x, beta.astype(x.dtype))
        # Bernoulli log likelihood: y·logit − log(1+e^logit), stable form
        lp = lp + jnp.sum(y * logits - jnp.logaddexp(0.0, logits))
        return lp

    def logdensity_and_grad(theta):
        import jax as _jax

        log_sigma = theta[0]
        beta = theta[1:]
        inv_s2 = jnp.exp(-2.0 * log_sigma)
        bsq = jnp.sum(jnp.square(beta))
        logits = _matvec(x, beta.astype(x.dtype))
        lp = (-0.5 * jnp.square(log_sigma) - 0.5 * bsq * inv_s2
              - p * log_sigma
              + jnp.sum(y * logits - jnp.logaddexp(0.0, logits)))
        resid = y - _jax.nn.sigmoid(logits)
        if resid_dtype is not None:
            resid = resid.astype(resid_dtype)
        grad_beta = _matvec(resid.astype(x.dtype), x).astype(
            theta.dtype) - beta * inv_s2
        grad_ls = -log_sigma + bsq * inv_s2 - p
        return lp, jnp.concatenate([grad_ls[None], grad_beta])

    if not fused:
        return LogDensityTarget(logdensity, dim, logdensity_and_grad)

    # `fused`: route BATCHED gradient evaluations (the vmapped hot loop)
    # through the one-pass Pallas likelihood kernel (ops/fused_logistic.py),
    # which keeps the (chains, n) logits in VMEM instead of round-tripping
    # them through HBM between the forward and backward matmuls. "auto"
    # gates on float32 + a TPU backend at trace time; everything else
    # (single-chain calls, float64 CPU tests) falls back to the analytic
    # path above. The prior terms are added outside the kernel (cheap
    # elementwise ops XLA fuses into neighbours).
    import jax as _jax

    from ..ops.fused_logistic import fused_logistic_value_grad

    _apply_fused = fused_logistic_value_grad(x, y)

    def _prior_batched(thetas):
        ls = thetas[:, 0]
        beta = thetas[:, 1:]
        inv_s2 = jnp.exp(-2.0 * ls)
        bsq = jnp.sum(jnp.square(beta), -1)
        lp = -0.5 * jnp.square(ls) - 0.5 * bsq * inv_s2 - p * ls
        g0 = -ls + bsq * inv_s2 - p
        return lp, jnp.concatenate([g0[:, None], -beta * inv_s2[:, None]], 1)

    @_jax.custom_batching.custom_vmap
    def vg(theta):
        return logdensity_and_grad(theta)

    @vg.def_vmap
    def _vg_batched(axis_size, in_batched, thetas):
        use_kernel = (
            in_batched[0]
            and thetas.ndim == 2
            and thetas.dtype == jnp.float32
            and _jax.default_backend() not in ("cpu", "gpu")
        )
        if use_kernel:
            lp_lik, gl_lik = _apply_fused(thetas)
            lp_pri, g_pri = _prior_batched(thetas)
            out = (lp_pri + lp_lik, g_pri + gl_lik)
        else:
            thetas_b = thetas if in_batched[0] else jnp.broadcast_to(
                thetas[None], (axis_size,) + thetas.shape
            )
            out = _jax.vmap(logdensity_and_grad)(thetas_b)
        return out, (True, True)

    return LogDensityTarget(logdensity, dim, vg)


def hierarchical_logistic_nc(
    n: int = 1000, p: int = 24, seed: int = 0, dtype=jnp.float32,
) -> LogDensityTarget:
    """Non-centered reparameterization of `hierarchical_logistic`.

    Same posterior, same data: θ = (log σ, β̃) with β = σ·β̃, β̃ ~ N(0, I),
    log σ ~ N(0, 1). The centered hierarchy's funnel coupling between log σ
    and β (the bench's worst-mixing direction — PERF.md min-dim ESS) moves
    into the likelihood, where the data usually tames it. The log σ marginal
    is identical to the centered model's, so posterior-moment gates carry
    over; β moments are recovered as σ·β̃ per draw.
    """
    x_np, y_np = _synthetic_data(n, p, seed)
    x = jnp.asarray(x_np, dtype)
    y = jnp.asarray(y_np, dtype)
    dim = p + 1

    def logdensity(theta):
        log_sigma = theta[0]
        beta_t = theta[1:]
        logits = jnp.exp(log_sigma) * (x @ beta_t)
        lp = -0.5 * jnp.square(log_sigma) - 0.5 * jnp.sum(jnp.square(beta_t))
        return lp + jnp.sum(y * logits - jnp.logaddexp(0.0, logits))

    def logdensity_and_grad(theta):
        import jax as _jax

        log_sigma = theta[0]
        beta_t = theta[1:]
        s = jnp.exp(log_sigma)
        u = x @ beta_t
        logits = s * u
        lp = (-0.5 * jnp.square(log_sigma)
              - 0.5 * jnp.sum(jnp.square(beta_t))
              + jnp.sum(y * logits - jnp.logaddexp(0.0, logits)))
        resid = y - _jax.nn.sigmoid(logits)
        # ∂logits/∂log σ = logits; ∂logits/∂β̃ = σ·x
        grad_ls = -log_sigma + jnp.sum(resid * logits)
        grad_bt = s * (resid @ x) - beta_t
        return lp, jnp.concatenate([grad_ls[None], grad_bt])

    return LogDensityTarget(logdensity, dim, logdensity_and_grad)


def german_credit_logistic(dtype=jnp.float32) -> LogDensityTarget:
    """German-credit-shaped hierarchical logistic regression (synthetic data,
    1000 rows × 24 features → 25 parameters)."""
    return hierarchical_logistic(n=1000, p=24, seed=0, dtype=dtype)


def hierarchical_logistic_block(n: int = 1000, p: int = 24, seed: int = 0,
                                d_pad: int = 128):
    """Block-form value_and_grad for the Pallas fused-NUTS megakernel.

    Returns (fn, data) where fn(theta_block (B, d_pad), xt_ref, y_ref) →
    ((B,1) logp, (B,d_pad) grad). Data layout: xt (d_pad, n) with row 0 zero
    (slot of the log σ hyperparameter) and rows p+1.. zero padding; y (1, n).
    """
    import jax

    x_np, y_np = _synthetic_data(n, p, seed)
    xt = np.zeros((d_pad, n), np.float32)
    xt[1:p + 1, :] = x_np.T
    y = y_np.astype(np.float32)[None, :]

    def fn(th, xt_ref, y_ref):
        xt_m = xt_ref[:]                   # (d_pad, n)
        y_m = y_ref[:]                     # (1, n)
        log_sigma = th[:, :1]              # (B, 1)
        inv_s2 = jnp.exp(-2.0 * log_sigma)
        logits = jax.lax.dot_general(
            th, xt_m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                   # (B, n)
        sig = jax.nn.sigmoid(logits)
        loglik = jnp.sum(y_m * logits - jnp.logaddexp(0.0, logits),
                         axis=1, keepdims=True)
        beta_sq = jnp.sum(th * th, axis=1, keepdims=True) - log_sigma**2
        lp = (-0.5 * log_sigma**2
              - 0.5 * beta_sq * inv_s2 - p * log_sigma + loglik)
        # gradient
        resid = y_m - sig                   # (B, n)
        grad_data = jax.lax.dot_general(
            resid, xt_m, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                   # (B, d_pad)
        grad_beta_prior = -th * inv_s2      # correct for beta dims; fix col 0
        grad_ls = (-log_sigma + beta_sq * inv_s2 - p)
        col0 = jax.lax.broadcasted_iota(jnp.int32, th.shape, 1) == 0
        grad_prior = jnp.where(col0, grad_ls, grad_beta_prior)
        return lp, grad_data + grad_prior

    return fn, (jnp.asarray(xt), jnp.asarray(y))
