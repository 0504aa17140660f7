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

    # Geyer: sum consecutive pairs while positive (monotone-decreasing capped)
    n_pairs = (n - 1) // 2
    even = rho[1 : 1 + 2 * n_pairs : 2]
    odd = rho[2 : 2 + 2 * n_pairs : 2]
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
    tau = -1.0 + 2.0 * (rho[0] + 2.0 * jnp.sum(contribs, axis=0))
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(n * m))))
    return n * m / tau


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
        "ess": effective_sample_size(result.thetas),
        "rhat": split_rhat(result.thetas),
    }
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
