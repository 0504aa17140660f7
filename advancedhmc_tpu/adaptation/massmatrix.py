"""Online mass-matrix estimators (Welford var/cov, Nutpie) as pure pytrees.

Mirrors /root/reference/src/adaptation/massmatrix.jl with Stan's shrinkage
estimate n/((n+5)(n-1))·M + 1e-3·(5/(n+5)) (massmatrix.jl:152-157,335-340)
and n_min=10 (massmatrix.jl:60-62).

Two entry points per estimator:

* `push(x)` — one sample (vmapped per chain reproduces the reference's
  per-chain matrix mode, massmatrix.jl:103-121);
* `push_batch(xs)` — a whole `(chains, dim)` batch folded in with the exact
  Chan/parallel-Welford combine. This is the cross-chain adaptation path: under
  `jit` with chains sharded over a mesh, the batch means/M2 reductions lower to
  psums over ICI (SURVEY.md §2.3). The batch combine is algebraically exact —
  the final (n, μ, M2) equal sequential pushes of every sample.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

N_MIN_DEFAULT = 10
SHRINKAGE_EPS = 1.0e-3


def _shrunk(n, m2, identity_like):
    """Stan regularised estimate (ref massmatrix.jl:152-157)."""
    nf = n.astype(m2.dtype)
    return nf / ((nf + 5.0) * (nf - 1.0)) * m2 + SHRINKAGE_EPS * (
        5.0 / (nf + 5.0)
    ) * identity_like


class WelfordVarState(struct.PyTreeNode):
    """Diagonal (variance) estimator (ref massmatrix.jl:86-157)."""

    n: jnp.ndarray      # sample count
    mean: jnp.ndarray   # (dim,)
    m2: jnp.ndarray     # (dim,) sum of squared deviations
    var: jnp.ndarray    # (dim,) current M⁻¹ estimate
    n_min: int = struct.field(pytree_node=False, default=N_MIN_DEFAULT)

    @classmethod
    def init(cls, dim, dtype=jnp.float32, n_min=N_MIN_DEFAULT):
        z = jnp.zeros((dim,), dtype)
        return cls(n=jnp.zeros((), jnp.int32), mean=z, m2=z,
                   var=jnp.ones((dim,), dtype), n_min=n_min)

    def push(self, x):
        """Welford single-sample update (ref massmatrix.jl:141-149)."""
        n = self.n + 1
        nf = n.astype(x.dtype)
        delta = x - self.mean
        mean = self.mean + delta / nf
        m2 = self.m2 + delta * delta * ((nf - 1.0) / nf)
        return self.replace(n=n, mean=mean, m2=m2)

    def push_batch(self, xs, weight_axis_total: Optional[jnp.ndarray] = None):
        """Fold in a `(batch, dim)` block via exact parallel-Welford combine.

        `weight_axis_total` overrides the batch count (for sharded batches
        where `xs` is the local shard but means are global — unused in the
        jit/GSPMD path where xs is the full logical batch).
        """
        c = xs.shape[0] if weight_axis_total is None else weight_axis_total
        cf = jnp.asarray(c, xs.dtype)
        b_mean = jnp.mean(xs, axis=0)
        b_m2 = jnp.sum(jnp.square(xs - b_mean[None, :]), axis=0)
        n0f = self.n.astype(xs.dtype)
        n_new = self.n + c
        nf = n0f + cf
        delta = b_mean - self.mean
        mean = self.mean + delta * (cf / nf)
        m2 = self.m2 + b_m2 + jnp.square(delta) * (n0f * cf / nf)
        return self.replace(n=n_new, mean=mean, m2=m2)

    def update_estimate(self):
        """Refresh `var` if n ≥ n_min (ref massmatrix.jl:60-62)."""
        ok = self.n >= self.n_min
        est = _shrunk(self.n, self.m2, jnp.ones_like(self.m2))
        return self.replace(var=jnp.where(ok, est, self.var))

    def reset(self):
        """Zero moments, keep the current estimate (ref massmatrix.jl:134-139)."""
        return self.replace(
            n=jnp.zeros_like(self.n),
            mean=jnp.zeros_like(self.mean),
            m2=jnp.zeros_like(self.m2),
        )

    @property
    def m_inv(self):
        return self.var


class WelfordCovState(struct.PyTreeNode):
    """Dense (covariance) estimator (ref massmatrix.jl:284-340)."""

    n: jnp.ndarray
    mean: jnp.ndarray   # (dim,)
    m2: jnp.ndarray     # (dim, dim)
    cov: jnp.ndarray    # (dim, dim) current M⁻¹ estimate
    n_min: int = struct.field(pytree_node=False, default=N_MIN_DEFAULT)

    @classmethod
    def init(cls, dim, dtype=jnp.float32, n_min=N_MIN_DEFAULT):
        return cls(
            n=jnp.zeros((), jnp.int32),
            mean=jnp.zeros((dim,), dtype),
            m2=jnp.zeros((dim, dim), dtype),
            cov=jnp.eye(dim, dtype=dtype),
            n_min=n_min,
        )

    def push(self, x):
        """M += (s - μ_new)(s - μ_old)ᵀ (ref massmatrix.jl:324-332)."""
        n = self.n + 1
        nf = n.astype(x.dtype)
        delta = x - self.mean
        mean = self.mean + delta / nf
        m2 = self.m2 + jnp.outer(x - mean, delta)
        return self.replace(n=n, mean=mean, m2=m2)

    def push_batch(self, xs):
        c = xs.shape[0]
        cf = jnp.asarray(c, xs.dtype)
        b_mean = jnp.mean(xs, axis=0)
        centred = xs - b_mean[None, :]
        # (dim, dim) = centredᵀ @ centred — an MXU matmul for batched chains.
        b_m2 = centred.T @ centred
        n0f = self.n.astype(xs.dtype)
        n_new = self.n + c
        nf = n0f + cf
        delta = b_mean - self.mean
        mean = self.mean + delta * (cf / nf)
        m2 = self.m2 + b_m2 + jnp.outer(delta, delta) * (n0f * cf / nf)
        return self.replace(n=n_new, mean=mean, m2=m2)

    def update_estimate(self):
        ok = self.n >= self.n_min
        est = _shrunk(self.n, self.m2, jnp.eye(self.m2.shape[0], dtype=self.m2.dtype))
        return self.replace(cov=jnp.where(ok, est, self.cov))

    def reset(self):
        return self.replace(
            n=jnp.zeros_like(self.n),
            mean=jnp.zeros_like(self.mean),
            m2=jnp.zeros_like(self.m2),
        )

    @property
    def m_inv(self):
        return self.cov


class LowRankCovState(struct.PyTreeNode):
    """Rank-preserving low-rank + diagonal covariance estimator for the
    RankUpdateEuclideanMetric (M⁻¹ = diag(A) + B·D·Bᵀ).

    The reference's rank-update metric (/root/reference/src/metric.jl:155-245)
    carries an externally supplied (Pathfinder-style) factorisation but has no
    adaptor that can PRODUCE one — its `renew` path would degrade it to a
    diagonal. This estimator closes that gap natively: full Welford covariance
    moments (same recursions as WelfordCovState, ref massmatrix.jl:284-340)
    plus an estimate step that extracts the top-k eigenpairs of the
    DIAGONALLY-WHITENED covariance,

        Σ = shrunk(M2);  A = diag(Σ);  S = A^{-1/2} Σ A^{-1/2}
        eigh(S) → (λ, V);  keep the k λ's furthest from 1 (|log λ|)
        B = √A · V_k,  D = diag(λ_k − 1)

    so that diag(A) + B·D·Bᵀ = √A (I + V_k(Λ_k−I)V_kᵀ) √A — exactly Σ when
    k = D, positive-definite for ANY k (the whitened eigenvalues satisfy
    λ ≥ 0, and shrinkage keeps them strictly positive, so I + V(Λ−I)Vᵀ has
    spectrum {λ_k, 1} ≻ 0). Selecting by |log λ| keeps both overdispersed
    AND compressed directions — the ones that hurt conditioning.

    The estimate is the (a_diag, b, d) triple consumed by
    `RankUpdateEuclideanMetric.renew`; all shapes are static in k so the
    state threads through lax.scan carries unchanged.
    """

    n: jnp.ndarray
    mean: jnp.ndarray     # (dim,)
    m2: jnp.ndarray       # (dim, dim)
    a_diag: jnp.ndarray   # (dim,) current diagonal of M⁻¹
    b: jnp.ndarray        # (dim, k)
    d: jnp.ndarray        # (k,) diagonal of the low-rank factor D
    rank: int = struct.field(pytree_node=False, default=8)
    n_min: int = struct.field(pytree_node=False, default=N_MIN_DEFAULT)

    @classmethod
    def init(cls, dim, dtype=jnp.float32, n_min=N_MIN_DEFAULT, rank=8):
        rank = min(rank, dim)
        return cls(
            n=jnp.zeros((), jnp.int32),
            mean=jnp.zeros((dim,), dtype),
            m2=jnp.zeros((dim, dim), dtype),
            a_diag=jnp.ones((dim,), dtype),
            b=jnp.zeros((dim, rank), dtype),
            d=jnp.zeros((rank,), dtype),
            rank=rank,
            n_min=n_min,
        )

    def push(self, x):
        n = self.n + 1
        nf = n.astype(x.dtype)
        delta = x - self.mean
        mean = self.mean + delta / nf
        m2 = self.m2 + jnp.outer(x - mean, delta)
        return self.replace(n=n, mean=mean, m2=m2)

    def push_batch(self, xs):
        c = xs.shape[0]
        cf = jnp.asarray(c, xs.dtype)
        b_mean = jnp.mean(xs, axis=0)
        centred = xs - b_mean[None, :]
        b_m2 = centred.T @ centred
        n0f = self.n.astype(xs.dtype)
        n_new = self.n + c
        nf = n0f + cf
        delta = b_mean - self.mean
        mean = self.mean + delta * (cf / nf)
        m2 = self.m2 + b_m2 + jnp.outer(delta, delta) * (n0f * cf / nf)
        return self.replace(n=n_new, mean=mean, m2=m2)

    def update_estimate(self, n_refine: int = 3):
        ok = self.n >= self.n_min
        dim = self.m2.shape[-1]
        sigma = _shrunk(self.n, self.m2, jnp.eye(dim, dtype=self.m2.dtype))
        # guard against the n∈{0,1} NaN (inf·0 in the shrinkage factor):
        # masked out by `ok` below, but eigh must still see finite input
        sigma = jnp.where(jnp.isfinite(sigma), sigma, jnp.eye(
            dim, dtype=self.m2.dtype))
        sig_diag = jnp.clip(jnp.diagonal(sigma), 1e-10)

        def factor(a):
            inv_sqrt_a = 1.0 / jnp.sqrt(a)
            s = inv_sqrt_a[:, None] * sigma * inv_sqrt_a[None, :]
            lam, v = jnp.linalg.eigh(s)
            lam = jnp.clip(lam, 1e-8)
            score = jnp.abs(jnp.log(lam))
            idx = jnp.argsort(-score)[: self.rank]
            lam_k = lam[idx]
            v_k = jnp.take(v, idx, axis=1)
            b = jnp.sqrt(a)[:, None] * v_k
            d = lam_k - 1.0
            return b, d

        # Fixed-point refinement of the diagonal: A starts at diag(Σ) (which
        # over-counts variance lying IN the captured subspace) and is re-fit
        # to the diagonal of the residual Σ − B·D·Bᵀ each pass — for a true
        # diag + rank-k covariance this converges to the exact split
        # (S − I = A^{-1/2}·UΛUᵀ·A^{-1/2} is exactly rank k at the fixed
        # point, so the top-k eigenpairs reconstruct Σ with zero error).
        a = sig_diag
        b_new, d_new = factor(a)
        for _ in range(n_refine):
            low_diag = jnp.sum(jnp.square(b_new) * d_new[None, :], axis=1)
            a = jnp.clip(sig_diag - low_diag, 1e-10)
            b_new, d_new = factor(a)
        return self.replace(
            a_diag=jnp.where(ok, a, self.a_diag),
            b=jnp.where(ok, b_new, self.b),
            d=jnp.where(ok, d_new, self.d),
        )

    def reset(self):
        return self.replace(
            n=jnp.zeros_like(self.n),
            mean=jnp.zeros_like(self.mean),
            m2=jnp.zeros_like(self.m2),
        )

    @property
    def m_inv(self):
        """(a_diag, b, d) triple for RankUpdateEuclideanMetric.renew."""
        return (self.a_diag, self.b, self.d)


class NutpieVarState(struct.PyTreeNode):
    """Nutpie-style estimator: sqrt(var(θ)/var(∇ℓπ)) from paired position and
    gradient Welford estimators (ref massmatrix.jl:172-250)."""

    position: WelfordVarState
    gradient: WelfordVarState
    var: jnp.ndarray
    n_min: int = struct.field(pytree_node=False, default=N_MIN_DEFAULT)

    @classmethod
    def init(cls, dim, dtype=jnp.float32, n_min=N_MIN_DEFAULT):
        return cls(
            position=WelfordVarState.init(dim, dtype, n_min),
            gradient=WelfordVarState.init(dim, dtype, n_min),
            var=jnp.ones((dim,), dtype),
            n_min=n_min,
        )

    @property
    def n(self):
        return self.position.n

    def push(self, theta, grad):
        """Requires position AND gradient (ref massmatrix.jl:238-243)."""
        return self.replace(
            position=self.position.push(theta),
            gradient=self.gradient.push(grad),
        )

    def push_batch(self, thetas, grads):
        return self.replace(
            position=self.position.push_batch(thetas),
            gradient=self.gradient.push_batch(grads),
        )

    def update_estimate(self):
        """sqrt(est_pos / est_grad) (ref massmatrix.jl:246-250)."""
        ok = self.n >= self.n_min
        est_p = _shrunk(self.position.n, self.position.m2,
                        jnp.ones_like(self.position.m2))
        est_g = _shrunk(self.gradient.n, self.gradient.m2,
                        jnp.ones_like(self.gradient.m2))
        est = jnp.sqrt(est_p / est_g)
        return self.replace(var=jnp.where(ok, est, self.var))

    def reset(self):
        return self.replace(
            position=self.position.reset(), gradient=self.gradient.reset()
        )

    @property
    def m_inv(self):
        return self.var


class UnitMassMatrixState(struct.PyTreeNode):
    """No-op adaptor, M⁻¹ = I (ref massmatrix.jl:28-51)."""

    dim: int = struct.field(pytree_node=False)

    @classmethod
    def init(cls, dim, dtype=jnp.float32, n_min=N_MIN_DEFAULT):
        return cls(dim=dim)

    def push(self, *args):
        return self

    def push_batch(self, *args):
        return self

    def update_estimate(self):
        return self

    def reset(self):
        return self

    @property
    def m_inv(self):
        return None


class NaiveVar:
    """Store-everything variance estimator (ref massmatrix.jl:65-83).

    Used only in testing as the ground-truth reference for `WelfordVarState`
    (same role as the reference's NOTE "used only in testing"). Host-side
    numpy by design — it is not a jit-path component.
    """

    def __init__(self):
        self.samples = []

    def push(self, x):
        self.samples.append(np.asarray(x))

    def reset(self):
        self.samples = []

    @property
    def estimate(self):
        assert len(self.samples) >= 2, "need at least two samples"
        return np.var(np.stack(self.samples), axis=0, ddof=1)


class NaiveCov:
    """Store-everything covariance estimator (ref massmatrix.jl:266-281)."""

    def __init__(self):
        self.samples = []

    def push(self, x):
        self.samples.append(np.asarray(x))

    def reset(self):
        self.samples = []

    @property
    def estimate(self):
        assert len(self.samples) >= 2, "need at least two samples"
        return np.cov(np.stack(self.samples), rowvar=False, ddof=1)
