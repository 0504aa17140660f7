"""One-call Riemannian HMC sampling loop (experimental tier).

The reference drives Riemannian HMC through the same `sample` loop with
`GeneralizedLeapfrog` + EndPointTS (research tests); here the loop is a
dedicated scan because the Hamiltonian type differs (position-dependent
metric). Step-size dual averaging is supported; mass-matrix adaptation does
not apply (the metric IS the model geometry).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..adaptation import DualAveragingConfig, DualAveragingState, da_update
from ..target import LogDensityTarget
from ..termination import DynamicTerminationCriterion
from ..trajectory import Trajectory
from .hamiltonian import RiemannianHamiltonian
from .integrator import GeneralizedLeapfrog, transition_rmhmc
from .metric import DenseRiemannianMetric, SoftAbsMap


def sample_rmhmc(
    key,
    target: LogDensityTarget,
    init_theta,
    n_samples: int,
    n_leapfrog: int = 8,
    step_size: float = 0.1,
    n_fp: int = 6,
    map_cfg=None,
    metric: Optional[DenseRiemannianMetric] = None,
    n_adapts: int = 0,
    da: DualAveragingConfig = DualAveragingConfig(delta=0.8),
    n_chains: Optional[int] = None,
    criterion=None,
    ts_kind: str = "multinomial",
):
    """Sample with SoftAbs-Riemannian HMC.

    Default: generalized leapfrog + endpoint MH with `n_leapfrog` fixed steps
    (the reference's supported combination). Passing a dynamic `criterion`
    (e.g. GeneralisedNoUTurn) runs **Riemannian NUTS**: the iterative tree
    doubling of nuts.py over the position-dependent geometry — a capability
    beyond the reference (its RMHMC is static-only,
    /root/reference/test/riemannian.jl).

    Returns (thetas (n, C, D), stats dict, final_state).
    """
    if metric is None:
        metric = DenseRiemannianMetric.from_hessian(
            target, map_cfg or SoftAbsMap(20.0)
        )
    h = RiemannianHamiltonian(metric=metric, target=target)

    theta = jnp.asarray(init_theta)
    if theta.ndim == 1:
        theta = jnp.broadcast_to(theta[None, :], (n_chains or 1, theta.shape[-1]))
    n_chains = theta.shape[0]
    dtype = theta.dtype

    key, k_init = jax.random.split(key)
    z = jax.vmap(h.init_phasepoint)(jax.random.split(k_init, n_chains), theta)
    da_state = DualAveragingState.init(jnp.asarray(step_size, dtype))

    dynamic = criterion is not None and isinstance(
        criterion, DynamicTerminationCriterion
    )
    if dynamic:
        from ..nuts import nuts_transition
    elif criterion is not None:
        from ..termination import FixedNSteps

        if isinstance(criterion, FixedNSteps):
            n_leapfrog = int(criterion.n_steps)  # honor, don't ignore
        else:
            raise ValueError(
                "criterion must be a dynamic (no-U-turn) criterion or "
                "FixedNSteps; use n_leapfrog= for the static path"
            )

    def one_chain(k, eps, zc):
        integ = GeneralizedLeapfrog(step_size=eps, n_fp=n_fp)
        k_mom, k_tr = jax.random.split(k)
        r = h.rand_momentum(k_mom, zc.theta)
        zc = h.phasepoint(zc.theta, r)
        if dynamic:
            traj = Trajectory(integ, criterion, ts_kind)
            return nuts_transition(k_tr, h, traj, zc)
        return transition_rmhmc(k_tr, h, integ, n_leapfrog, zc)

    def step(carry, i):
        zc, das, k = carry
        k, k_step = jax.random.split(k)
        keys = jax.random.split(k_step, n_chains)
        z_new, stats = jax.vmap(lambda kk, zz: one_chain(kk, das.eps, zz))(
            keys, zc
        )
        is_adapt = i < n_adapts
        das_new = da_update(da, das, jnp.mean(stats["acceptance_rate"]))
        das_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(is_adapt, a, b), das_new, das
        )
        das_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(i == n_adapts - 1, a, b),
            das_new.finalize(), das_new,
        )
        return (z_new, das_new, k), (z_new.theta, stats)

    (z, da_state, key), (thetas, stats) = jax.lax.scan(
        step, (z, da_state, key), jnp.arange(n_samples)
    )
    return thetas, stats, (z, da_state)
