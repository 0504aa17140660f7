"""Diagnostics: EBFMI, split-R̂, effective sample size.

EBFMI mirrors /root/reference/src/diagnosis.jl:1-3; ESS/R̂ replace the
reference's MCMCChains extension (/root/reference/ext/AdvancedHMCMCMCChainsExt.jl)
with native implementations (rank-normalised split-R̂ and bulk ESS in the
Vehtari et al. 2021 style, computed with batched FFT autocorrelations so the
whole summary runs on-device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ebfmi(energies):
    """E-BFMI = mean(diff(E)²) / var(E) (ref /root/reference/src/diagnosis.jl:1-3).

    `energies`: (n_samples,) or (n_samples, n_chains) — per-chain result.
    """
    energies = jnp.asarray(energies)
    d = jnp.diff(energies, axis=0)
    return jnp.mean(jnp.square(d), axis=0) / jnp.var(energies, axis=0)


def _autocovariance_fft(x):
    """Autocovariance along axis 0 via FFT. x: (n, ...)."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    nfft = 1
    while nfft < 2 * n:
        nfft *= 2
    f = jnp.fft.rfft(xc, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:n]
    return jnp.real(acov) / n


def effective_sample_size(x):
    """Bulk ESS with Geyer initial monotone sequence (per parameter).

    x: (n_samples, n_chains, dim) → (dim,) ESS estimates combining chains.
    """
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, None, :]
    n, m, dim = x.shape

    acov = _autocovariance_fft(x)                      # (n, m, dim)
    chain_var = acov[0] * n / (n - 1.0)                # (m, dim)
    mean_var = jnp.mean(chain_var, axis=0)             # within-chain W
    var_plus = mean_var * (n - 1.0) / n
    if m > 1:
        var_plus = var_plus + jnp.var(jnp.mean(x, axis=0), axis=0, ddof=1)

    rho = 1.0 - (mean_var[None] - jnp.mean(acov, axis=1)) / var_plus[None]  # (n, dim)

    # Geyer initial monotone sequence: P_m = rho_{2m} + rho_{2m+1} starting
    # at rho_0 (Geyer 1992; Stan/Vehtari et al. 2021), summed while positive
    # with monotone decrease enforced; tau = -1 + 2*sum(P_m).
    n_pairs = n // 2
    even = rho[0 : 2 * n_pairs : 2]
    odd = rho[1 : 2 * n_pairs : 2]
    pair = even + odd[: even.shape[0]]

    def scan_fn(carry, p):
        prev_min, alive = carry
        p = jnp.minimum(p, prev_min)          # enforce monotone decrease
        alive = alive & (p > 0)
        contrib = jnp.where(alive, p, 0.0)
        return (jnp.where(alive, p, prev_min), alive), contrib

    (_, _), contribs = jax.lax.scan(
        scan_fn,
        (jnp.full((pair.shape[-1],), jnp.inf, pair.dtype),
         jnp.ones((pair.shape[-1],), bool)),
        pair,
    )
    tau = -1.0 + 2.0 * jnp.sum(contribs, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(n * m))))
    return n * m / tau


def effective_sample_size_ragged(x, counts):
    """Per-chain bulk ESS summed over chains, for RAGGED draw sets.

    `x`: (n_chains, T, dim) where chain c's draws occupy rows [0, counts[c]);
    `counts`: (n_chains,) int. Returns (dim,): the SUM over chains of each
    chain's Geyer-initial-monotone ESS computed on its own valid prefix.

    This is the estimator for the variable-draws-per-chain fused collection
    (chains collect different numbers of transitions per device dispatch, so
    no rectangular (T, C) array exists). On rectangular input
    (counts[c] = T ∀c) it is the per-chain-sum variant of
    `effective_sample_size` — same autocovariances, but no cross-chain
    pooling of the correlograms and no between-chain variance term, so each
    chain's τ is noisier while the sum over many chains is tight.
    """
    x = jnp.asarray(x)
    n_chains, t_max, dim = x.shape
    counts = jnp.asarray(counts)
    cntf = counts.astype(x.dtype)
    mask = jnp.arange(t_max)[None, :] < counts[:, None]            # (C, T)
    maskf = mask.astype(x.dtype)[..., None]                        # (C, T, 1)
    mean_c = jnp.sum(x * maskf, axis=1, keepdims=True) / jnp.maximum(
        cntf[:, None, None], 1.0
    )
    xc = (x - mean_c) * maskf
    nfft = 1
    while nfft < 2 * t_max:
        nfft *= 2
    f = jnp.fft.rfft(xc, n=nfft, axis=1)
    acov = jnp.real(
        jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=1)[:, :t_max]
    ) / jnp.maximum(cntf[:, None, None], 1.0)                      # (C, T, d)
    var_c = acov[:, 0]                                             # (C, d)
    rho = acov / jnp.maximum(var_c[:, None, :], jnp.finfo(x.dtype).tiny)

    # Geyer pairs per chain, P_m = rho_{2m} + rho_{2m+1} from rho_0 (as in
    # effective_sample_size); lags at/after a chain's count are exact zeros
    # (zero-padded xc), so the monotone scan stops there at the latest.
    n_pairs = t_max // 2
    even = rho[:, 0 : 2 * n_pairs : 2]
    odd = rho[:, 1 : 2 * n_pairs : 2]
    pair = even + odd[:, : even.shape[1]]                          # (C, P, d)

    def scan_fn(carry, p):
        prev_min, alive = carry
        p = jnp.minimum(p, prev_min)
        alive = alive & (p > 0)
        contrib = jnp.where(alive, p, 0.0)
        return (jnp.where(alive, p, prev_min), alive), contrib

    (_, _), contribs = jax.lax.scan(
        scan_fn,
        (jnp.full((n_chains, dim), jnp.inf, pair.dtype),
         jnp.ones((n_chains, dim), bool)),
        jnp.moveaxis(pair, 1, 0),
    )
    tau = -1.0 + 2.0 * jnp.sum(contribs, axis=0)
    tau = jnp.maximum(
        tau, 1.0 / jnp.log10(jnp.maximum(cntf[:, None], 10.0))
    )
    ess_c = cntf[:, None] / tau                                    # (C, d)
    ess_c = jnp.where((var_c > 0) & (counts[:, None] > 1), ess_c, 0.0)
    return jnp.sum(ess_c, axis=0)


def _rank_normalize(x):
    """Rank-normalize draws over the pooled (sample, chain) axes:
    z = Φ⁻¹((rank − 3/8)/(S + 1/4)) (Vehtari et al. 2021, Eq. 14)."""
    x = jnp.asarray(x)
    n, m = x.shape[0], x.shape[1]
    flat = x.reshape(n * m, -1)
    order = jnp.argsort(flat, axis=0)
    ranks = jnp.argsort(order, axis=0) + 1.0
    u = (ranks - 0.375) / (n * m + 0.25)
    from jax.scipy.special import ndtri

    return ndtri(u).reshape(x.shape)


def ess_bulk(x):
    """Rank-normalized bulk ESS. x: (n, m, dim) → (dim,)."""
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, None, :]
    return effective_sample_size(_rank_normalize(x))


def ess_tail(x, prob: float = 0.05):
    """Tail ESS: min of the ESS of the two tail-indicator sequences
    I(x ≤ q_prob), I(x ≥ q_{1−prob}) (rank-normalized)."""
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, None, :]
    q_lo = jnp.quantile(x.reshape(-1, x.shape[-1]), prob, axis=0)
    q_hi = jnp.quantile(x.reshape(-1, x.shape[-1]), 1.0 - prob, axis=0)
    # ESS of the tail-indicator sequences directly (they are already
    # bounded; rank-normalizing a binary sequence shreds ties)
    ess_lo = effective_sample_size((x <= q_lo).astype(x.dtype))
    ess_hi = effective_sample_size((x >= q_hi).astype(x.dtype))
    return jnp.minimum(ess_lo, ess_hi)


def rhat(x):
    """Rank-normalized split-R̂: max of the bulk and folded (|x−median|)
    statistics (Vehtari et al. 2021, Eq. 15-16). x: (n, m, dim) → (dim,)."""
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, None, :]
    bulk = split_rhat(_rank_normalize(x))
    folded = jnp.abs(x - jnp.median(x.reshape(-1, x.shape[-1]), axis=0))
    return jnp.maximum(bulk, split_rhat(_rank_normalize(folded)))


def split_rhat(x):
    """Split-R̂ per parameter. x: (n_samples, n_chains, dim) → (dim,)."""
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, None, :]
    n = x.shape[0]
    half = n // 2
    halves = jnp.concatenate([x[:half], x[half : 2 * half]], axis=1)  # (half, 2m, dim)
    nn, mm, dim = halves.shape
    chain_mean = jnp.mean(halves, axis=0)
    chain_var = jnp.var(halves, axis=0, ddof=1)
    w = jnp.mean(chain_var, axis=0)
    b = nn * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (nn - 1.0) / nn * w + b / nn
    return jnp.sqrt(var_plus / w)


class OnlineMoments:
    """Storage-free running summary of a draw stream (per chain, per param).

    Welford mean/variance over draws plus a K-lag autocovariance accumulator
    (ring of the last K draws, most recent first), so pooled bulk ESS can be
    estimated without materialising the (n_draws, n_chains, dim) array —
    the memory-bound-long-run mode the reference cannot offer (it always
    stores all samples, /root/reference/src/sampler.jl:188,224-227).

    A pytree of arrays; thread through `lax.scan` with `online_update`.
    """

    def __init__(self, n, mean, m2, lag_buf, lag_acc):
        self.n = n
        self.mean = mean
        self.m2 = m2
        self.lag_buf = lag_buf   # (K, C, D) last K draws, most recent first
        self.lag_acc = lag_acc   # (K, C, D) running Σ_t x_t·x_{t-k-1}

    def tree_flatten(self):
        return (self.n, self.mean, self.m2, self.lag_buf, self.lag_acc), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


jax.tree_util.register_pytree_node(
    OnlineMoments, OnlineMoments.tree_flatten, OnlineMoments.tree_unflatten
)


def online_init(n_chains: int, dim: int, n_lags: int = 16,
                dtype=jnp.float32) -> OnlineMoments:
    z = jnp.zeros((n_chains, dim), dtype)
    zk = jnp.zeros((n_lags, n_chains, dim), dtype)
    return OnlineMoments(jnp.zeros((), jnp.int32), z, jnp.zeros_like(z), zk, zk)


def online_update(om: OnlineMoments, x) -> OnlineMoments:
    """Fold one draw batch x (n_chains, dim) into the running summary."""
    k = om.lag_buf.shape[0]
    valid = (om.n > jnp.arange(k))[:, None, None]
    lag_acc = om.lag_acc + jnp.where(valid, x[None, :, :] * om.lag_buf, 0.0)
    lag_buf = jnp.concatenate([x[None], om.lag_buf[:-1]], axis=0)
    n1 = om.n + 1
    delta = x - om.mean
    mean = om.mean + delta / n1.astype(x.dtype)
    m2 = om.m2 + delta * (x - mean)
    return OnlineMoments(n1, mean, m2, lag_buf, lag_acc)


def online_summary(om: OnlineMoments):
    """Finalize: per-chain mean/var + pooled bulk ESS from the K-lag window.

    The ESS estimate truncates the Geyer sum at K lags (exact when the chain
    mixes within K lags; an upper bound otherwise) — pick n_lags ≳ a few
    integrated autocorrelation times.
    """
    n = om.n.astype(om.mean.dtype)
    k, n_chains, dim = om.lag_buf.shape
    var = om.m2 / jnp.maximum(n - 1.0, 1.0)              # (C, D) per-chain
    # autocovariance at lag k+1: S_k/(n-k-1) - mean²  (final-mean approx)
    lags = jnp.arange(1, k + 1, dtype=om.mean.dtype)[:, None, None]
    acov = om.lag_acc / jnp.maximum(n - lags, 1.0) - jnp.square(om.mean)[None]
    w = jnp.mean(var, axis=0)                            # (D,) within-chain
    var_plus = w * (n - 1.0) / n
    if n_chains > 1:
        var_plus = var_plus + jnp.var(om.mean, axis=0, ddof=1)
    rho = 1.0 - (w[None] - jnp.mean(acov, axis=1)) / var_plus[None]  # (K, D)
    rho = jnp.concatenate([jnp.ones((1, dim), rho.dtype), rho], axis=0)

    n_pairs = (k + 1) // 2
    even = rho[0 : 2 * n_pairs : 2]
    odd = rho[1 : 1 + 2 * n_pairs : 2]
    pair = even + odd[: even.shape[0]]

    def scan_fn(carry, p):
        prev_min, alive = carry
        p = jnp.minimum(p, prev_min)
        alive = alive & (p > 0)
        return (jnp.where(alive, p, prev_min), alive), jnp.where(alive, p, 0.0)

    (_, _), contribs = jax.lax.scan(
        scan_fn,
        (jnp.full((dim,), jnp.inf, pair.dtype), jnp.ones((dim,), bool)),
        pair,
    )
    tau = jnp.maximum(-1.0 + 2.0 * jnp.sum(contribs, axis=0), 1.0)
    total = n * n_chains
    return {
        "n": om.n,
        "mean": om.mean,
        "var": var,
        "ess": total / tau,
    }


def summarize(result, verbose: bool = True):
    """End-of-run report ≅ /root/reference/src/sampler.jl:229-246."""
    stats = result.stats
    energies = stats["hamiltonian_energy"]
    report = {
        "ebfmi": ebfmi(energies),
        "mean_acceptance_rate": jnp.mean(stats["acceptance_rate"], axis=0),
        "divergence_rate": jnp.mean(
            stats["numerical_error"].astype(jnp.float32), axis=0
        ),
    }
    if result.thetas is not None:
        report["ess"] = ess_bulk(result.thetas)
        report["ess_tail"] = ess_tail(result.thetas)
        report["rhat"] = rhat(result.thetas)
    elif getattr(result, "online", None) is not None:
        report["ess"] = result.online["ess"]
    if verbose:
        msg = {
            k: (float(jnp.mean(v)) if v.ndim else float(v))
            for k, v in report.items()
        }
        print(f"[advancedhmc_tpu] sampling finished: {msg}")
        # ≅ the reference's high-divergence warning (sampler.jl:200-203)
        if msg["divergence_rate"] > 0.25:
            print("[advancedhmc_tpu] WARNING: the level of numerical errors "
                  "is high (>25% divergent transitions). Please check the "
                  "model carefully.")
    return report
