"""Initial step-size search (Stan-style heuristic).

Mirrors `find_good_stepsize` (/root/reference/src/trajectory.jl:768-837):
double/halve ϵ until the one-step MH accept ratio crosses 1/2, then bisect
until the log accept ratio lies in [2·log(1/2), log(3/4)]. Implemented with
`lax.while_loop` so it jits and vmaps (per-chain search is just `vmap`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .hamiltonian import Hamiltonian
from .integrators import Leapfrog, leapfrog_step


def find_good_stepsize(
    key,
    h: Hamiltonian,
    theta,
    initial_step_size=0.1,
    max_n_iters: int = 100,
):
    """Heuristic search for a good leapfrog step size. Returns a scalar ϵ."""
    dtype = theta.dtype
    log_a_cross = jnp.log(jnp.asarray(0.5, dtype))
    log_a_min = 2 * log_a_cross
    log_a_max = jnp.log(jnp.asarray(0.75, dtype))

    z = h.init_phasepoint(key, theta)
    h0 = z.energy()

    def delta_h(eps):
        # One leapfrog step; ΔH = H - H' so exp(ΔH) is the MH accept ratio
        # (ref trajectory.jl:753-757,790).
        z_new = leapfrog_step(Leapfrog(step_size=eps), h, z, eps)
        return h0 - z_new.energy()

    eps0 = jnp.asarray(initial_step_size, dtype)
    dh0 = delta_h(eps0)
    too_high = dh0 > log_a_cross  # step too small → grow (ref :791-799)

    # --- crossing loop (ref :794-809) ---
    def cross_cond(st):
        eps, eps_prev, it, crossed = st
        return jnp.logical_not(crossed) & (it < max_n_iters)

    def cross_body(st):
        eps, eps_prev, it, crossed = st
        eps_new = jnp.where(too_high, 2.0 * eps, 0.5 * eps)
        dh = delta_h(eps_new)
        crossed_new = jnp.logical_xor(too_high, dh > log_a_cross)
        return eps_new, eps, it + 1, crossed_new

    eps_a, eps_b, _, _ = jax.lax.while_loop(
        cross_cond, cross_body, (eps0, eps0, jnp.int32(0), jnp.asarray(False))
    )
    lo = jnp.minimum(eps_a, eps_b)
    hi = jnp.maximum(eps_a, eps_b)

    # --- bisection (ref :816-834) ---
    def bis_cond(st):
        lo, hi, best, it, found = st
        return jnp.logical_not(found) & (it < max_n_iters)

    def bis_body(st):
        lo, hi, best, it, found = st
        mid = 0.5 * (lo + hi)
        dh = delta_h(mid)
        hi_new = jnp.where(dh < log_a_min, mid, hi)
        lo_new = jnp.where(dh > log_a_max, mid, lo)
        ok = (dh <= log_a_max) & (dh >= log_a_min)
        best_new = jnp.where(ok, mid, best)
        return lo_new, hi_new, best_new, it + 1, ok

    lo_f, hi_f, best, _, found = jax.lax.while_loop(
        bis_cond, bis_body, (lo, hi, lo, jnp.int32(0), jnp.asarray(False))
    )
    return jnp.where(found, best, lo_f)
