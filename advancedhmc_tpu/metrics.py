"""Euclidean metrics (mass matrices) — TPU-native redesign of the reference's
metric layer (/root/reference/src/metric.jl).

Design notes (vs the Julia reference):

* Each metric is an immutable `flax.struct` pytree whose leaves are the adapted
  arrays (M⁻¹ and caches). The metric *type* is static under `jax.jit`, so
  Python-level dispatch on the class replaces Julia multiple dispatch.
* All metrics are written single-chain (`(dim,)` momenta). The reference's
  matrix mode (`(dim, n_chains)` arrays, /root/reference/src/metric.jl:17,52)
  is replaced by `jax.vmap` at the sampler layer; per-chain adapted metrics are
  simply vmapped pytree leaves.
* `rand_momentum` mirrors /root/reference/src/metric.jl:290-337.
* `velocity(r)` is the reference's `∂H∂r` (M⁻¹ r,
  /root/reference/src/hamiltonian.jl:50-80); `neg_kinetic_energy` mirrors
  /root/reference/src/hamiltonian.jl:155-192.
* The dense metric's quadratic form runs through `jnp.matmul`, which XLA maps
  to the TPU MXU; batched chains turn it into a single (chains, D) x (D, D)
  matmul.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from flax import struct


class Metric(struct.PyTreeNode):
    """Base class for Euclidean metrics (position-independent M⁻¹)."""

    @property
    def dim(self) -> int:
        raise NotImplementedError

    @property
    def dtype(self):
        raise NotImplementedError

    def rand_momentum(self, key):
        raise NotImplementedError

    def velocity(self, r):
        """∂H∂r = M⁻¹ r (the 'sharp' momentum / velocity)."""
        raise NotImplementedError

    def neg_kinetic_energy(self, r):
        """-K(r) = -½ rᵀ M⁻¹ r for the Gaussian kinetic energy."""
        raise NotImplementedError

    def renew(self, m_inv):
        """Return a same-type metric rebuilt from a new M⁻¹ estimate.

        Mirrors `renew` at /root/reference/src/metric.jl:31,69,117 — metric
        *type* is preserved during adaptation.
        """
        raise NotImplementedError

    def m_inv_matrix(self):
        """Dense realisation of M⁻¹ (testing / diagnostics only)."""
        raise NotImplementedError


class UnitEuclideanMetric(Metric):
    """M⁻¹ = I. Mirrors /root/reference/src/metric.jl:17-29."""

    size: int = struct.field(pytree_node=False)
    _dtype: jnp.dtype = struct.field(pytree_node=False, default=jnp.float32)

    @property
    def dim(self):
        return self.size

    @property
    def dtype(self):
        return self._dtype

    def rand_momentum(self, key):
        return jax.random.normal(key, (self.size,), dtype=self._dtype)

    def velocity(self, r):
        return r

    def neg_kinetic_energy(self, r):
        return -0.5 * jnp.sum(jnp.square(r))

    def renew(self, m_inv):
        return self

    def m_inv_matrix(self):
        return jnp.eye(self.size, dtype=self._dtype)


class DiagEuclideanMetric(Metric):
    """Diagonal M⁻¹ with cached sqrt. Mirrors /root/reference/src/metric.jl:52-67."""

    m_inv: jnp.ndarray          # (dim,) diagonal of M⁻¹
    sqrt_m_inv: jnp.ndarray     # (dim,) cached sqrt(M⁻¹)

    @classmethod
    def create(cls, m_inv):
        m_inv = jnp.asarray(m_inv)
        return cls(m_inv=m_inv, sqrt_m_inv=jnp.sqrt(m_inv))

    @classmethod
    def identity(cls, dim, dtype=jnp.float32):
        return cls.create(jnp.ones((dim,), dtype=dtype))

    @property
    def dim(self):
        return self.m_inv.shape[-1]

    @property
    def dtype(self):
        return self.m_inv.dtype

    def rand_momentum(self, key):
        # r = z / sqrt(M⁻¹)  (ref /root/reference/src/metric.jl:300-309)
        z = jax.random.normal(key, self.m_inv.shape, dtype=self.dtype)
        return z / self.sqrt_m_inv

    def velocity(self, r):
        return self.m_inv * r

    def neg_kinetic_energy(self, r):
        return -0.5 * jnp.sum(jnp.square(r) * self.m_inv)

    def renew(self, m_inv):
        return DiagEuclideanMetric.create(m_inv)

    def m_inv_matrix(self):
        return jnp.diag(self.m_inv)


class DenseEuclideanMetric(Metric):
    """Dense M⁻¹ with cached upper-Cholesky factor of M⁻¹.

    Mirrors /root/reference/src/metric.jl:89-115. Momentum sampling solves
    U r = z with UᵀU = M⁻¹ so that cov(r) = (UᵀU)⁻¹ = M
    (ref /root/reference/src/metric.jl:311-320).
    """

    m_inv: jnp.ndarray       # (dim, dim)
    chol_u: jnp.ndarray      # (dim, dim) upper triangular, UᵀU = M⁻¹

    @classmethod
    def create(cls, m_inv):
        m_inv = jnp.asarray(m_inv)
        chol_l = jnp.linalg.cholesky(m_inv)
        return cls(m_inv=m_inv, chol_u=chol_l.T)

    @classmethod
    def identity(cls, dim, dtype=jnp.float32):
        return cls.create(jnp.eye(dim, dtype=dtype))

    @property
    def dim(self):
        return self.m_inv.shape[-1]

    @property
    def dtype(self):
        return self.m_inv.dtype

    def rand_momentum(self, key):
        z = jax.random.normal(key, (self.dim,), dtype=self.dtype)
        return jax.scipy.linalg.solve_triangular(self.chol_u, z, lower=False)

    def velocity(self, r):
        return self.m_inv @ r

    def neg_kinetic_energy(self, r):
        return -0.5 * jnp.dot(r, self.m_inv @ r)

    def renew(self, m_inv):
        return DenseEuclideanMetric.create(m_inv)

    def m_inv_matrix(self):
        return self.m_inv


class RankUpdateEuclideanMetric(Metric):
    """M⁻¹ = diag(A) + B·D·Bᵀ (Woodbury low-rank update; Pathfinder metric).

    Mirrors /root/reference/src/metric.jl:155-245. Kinetic energy and velocity
    cost O(n·k); momentum sampling uses the Woodbury factorisation
    U = sqrt(A), Q R = U⁻¹B, VᵀV = I + R D Rᵀ
    (ref /root/reference/src/metric.jl:170-177,324-337).
    """

    a_diag: jnp.ndarray   # (dim,) positive diagonal A
    b: jnp.ndarray        # (dim, k)
    d: jnp.ndarray        # (k, k) symmetric
    q_full: jnp.ndarray   # (dim, dim) full orthogonal factor of qr(U⁻¹ B)
    v_upper: jnp.ndarray  # (k, k) upper Cholesky of I + R D Rᵀ

    @classmethod
    def create(cls, a_diag, b, d):
        a_diag = jnp.asarray(a_diag)
        b = jnp.asarray(b)
        d = jnp.asarray(d)
        dim, k = b.shape
        u = jnp.sqrt(a_diag)
        if k == 0:
            q_full = jnp.eye(dim, dtype=a_diag.dtype)
            v_upper = jnp.zeros((0, 0), dtype=a_diag.dtype)
        else:
            q_full, r = jnp.linalg.qr(b / u[:, None], mode="complete")
            r = r[:k, :]
            inner = jnp.eye(k, dtype=a_diag.dtype) + r @ d @ r.T
            v_upper = jnp.linalg.cholesky(inner).T
        return cls(a_diag=a_diag, b=b, d=d, q_full=q_full, v_upper=v_upper)

    @classmethod
    def identity(cls, dim, dtype=jnp.float32, rank=0):
        """M⁻¹ = I carried at the given rank (B = 0): rank > 0 reserves
        static-shaped low-rank slots so an adapting run (mm_kind='lowrank')
        can renew in place without changing the pytree structure."""
        return cls.create(
            jnp.ones((dim,), dtype=dtype),
            jnp.zeros((dim, rank), dtype=dtype),
            jnp.zeros((rank, rank), dtype=dtype),
        )

    @property
    def dim(self):
        return self.a_diag.shape[-1]

    @property
    def rank(self):
        return self.b.shape[-1]

    @property
    def dtype(self):
        return self.a_diag.dtype

    def rand_momentum(self, key):
        # r = U⁻¹ · Q · [V⁻¹ z₁:ₖ ; zₖ₊₁:], ref /root/reference/src/metric.jl:324-337
        z = jax.random.normal(key, (self.dim,), dtype=self.dtype)
        k = self.rank
        if k > 0:
            head = jax.scipy.linalg.solve_triangular(self.v_upper, z[:k], lower=False)
            z = z.at[:k].set(head)
        r = self.q_full @ z
        return r / jnp.sqrt(self.a_diag)

    def velocity(self, r):
        # A r + B (D (Bᵀ r)), ref /root/reference/src/hamiltonian.jl:70-80
        out = self.a_diag * r
        if self.rank > 0:
            out = out + self.b @ (self.d @ (self.b.T @ r))
        return out

    def neg_kinetic_energy(self, r):
        # -(rᵀ A r + (Bᵀr)ᵀ D (Bᵀr)) / 2, ref /root/reference/src/hamiltonian.jl:186-192
        quad = jnp.sum(jnp.square(r) * self.a_diag)
        if self.rank > 0:
            btr = self.b.T @ r
            quad = quad + jnp.dot(btr, self.d @ btr)
        return -0.5 * quad

    def renew(self, m_inv):
        """Rank-PRESERVING renew.

        A low-rank estimate — the (a_diag, b, d) triple produced by
        `adaptation.massmatrix.LowRankCovState` — rebuilds the full
        Woodbury factorisation at the same rank (d may be the (k,) diagonal
        of D or a full (k, k) matrix). A plain diagonal estimate (from the
        Welford-var/Nutpie estimators) folds into A with the low-rank part
        zeroed AT THE CURRENT RANK, so the pytree structure is unchanged
        either way (scan-carry safe). Mirrors the role of `renew` at
        /root/reference/src/metric.jl:263-267 but actually preserves the
        low-rank structure the reference's metric exists to carry."""
        if isinstance(m_inv, (tuple, list)):
            a, b, d = m_inv
            d = jnp.asarray(d)
            if d.ndim == 1:
                d = jnp.diag(d)
            return RankUpdateEuclideanMetric.create(jnp.asarray(a),
                                                    jnp.asarray(b), d)
        return RankUpdateEuclideanMetric.create(
            jnp.asarray(m_inv),
            jnp.zeros((self.dim, self.rank), dtype=self.dtype),
            jnp.zeros((self.rank, self.rank), dtype=self.dtype),
        )

    def m_inv_matrix(self):
        out = jnp.diag(self.a_diag)
        if self.rank > 0:
            out = out + self.b @ self.d @ self.b.T
        return out


AnyMetric = Union[
    UnitEuclideanMetric,
    DiagEuclideanMetric,
    DenseEuclideanMetric,
    RankUpdateEuclideanMetric,
]


def make_metric(kind: str, dim: int, dtype=jnp.float32, rank: int = 0) -> Metric:
    """Symbol-style shorthand, mirroring :unit/:diagonal/:dense resolution at
    /root/reference/src/abstractmcmc.jl:374-391. `rank` (rank_update only)
    reserves low-rank slots for an adapting run (mm_kind='lowrank')."""
    if kind in ("unit",):
        return UnitEuclideanMetric(size=dim, _dtype=dtype)
    if kind in ("diag", "diagonal"):
        return DiagEuclideanMetric.identity(dim, dtype=dtype)
    if kind in ("dense",):
        return DenseEuclideanMetric.identity(dim, dtype=dtype)
    if kind in ("rank_update", "rankupdate"):
        return RankUpdateEuclideanMetric.identity(dim, dtype=dtype, rank=rank)
    raise ValueError(f"unknown metric kind: {kind!r}")
