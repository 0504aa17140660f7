"""Device-mesh chain parallelism (the new native scale-out layer).

The reference's only distribution story is independent chains via Julia
threads/processes with zero inter-chain communication
(/root/reference/src/abstractmcmc.jl:90-129; SURVEY.md §2.3). Here chains are
a sharded array axis on a 1-D `chains` mesh: the vmapped transition partitions
trivially (pure data parallel), and cross-chain adaptation reductions
(Welford moments, dual-averaging mean α) are jnp reductions over the chain
axis that XLA lowers to psum collectives over ICI/DCN — the GSPMD pattern, no
hand-written NCCL/MPI analogue needed.

Multi-host entry: call `jax.distributed.initialize()` before building the
mesh; `mesh_of_all_devices` then spans the pod slice and the same code runs
unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chains"


def distributed_init(**kwargs):
    """Initialise multi-host JAX (call once per host before building meshes).

    Thin wrapper over `jax.distributed.initialize` — the multi-host entry for
    pod-slice chain parallelism (SURVEY.md §2.3). No-ops if already
    initialised; any OTHER failure (bad coordinator address, timeout,
    version mismatch, ...) is re-raised rather than swallowed — a silently
    missing coordination service would otherwise surface much later as a
    confusing single-host mesh error.
    """
    # Prefer the public probe where it exists; the private global_state
    # fallback is wrapped defensively (attribute renames across JAX
    # versions must not turn a benign probe into an AttributeError).
    is_init = getattr(jax.distributed, "is_initialized", None)
    try:
        if is_init is not None and is_init():
            return  # already initialised
        state = getattr(getattr(jax, "_src", None), "distributed", None)
        state = getattr(state, "global_state", None)
        if state is not None and getattr(state, "client", None) is not None:
            return  # already initialised
    except AttributeError:
        pass  # probe failed — fall through and let initialize() decide
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # last-resort message match (kept as fallback only; a reworded
        # message on a true duplicate init re-raises, which is loud but safe)
        if "already initialized" in str(e).lower():
            return
        raise


def mesh_of_all_devices(n_devices: Optional[int] = None, axis_name: str = CHAIN_AXIS) -> Mesh:
    """1-D mesh over (the first n) available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def chain_sharding(mesh: Mesh, axis_name: str = CHAIN_AXIS) -> NamedSharding:
    """Shard the leading (chain) axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_hmc_state(state, mesh: Mesh, per_chain_adapt: bool, axis_name: str = CHAIN_AXIS):
    """Place an HMCState on the mesh: chain-major leaves sharded along
    `chains`, shared adaptation state and PRNG key replicated."""
    p_chain = chain_sharding(mesh, axis_name)
    p_rep = replicated(mesh)

    def put_sharded(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, p_chain if getattr(x, "ndim", 0) >= 1 else p_rep),
            tree,
        )

    def put_replicated(tree):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, p_rep), tree)

    z = put_sharded(state.z)
    if per_chain_adapt:
        metric = put_sharded(state.metric)
        adapt = put_sharded(state.adapt)
    else:
        metric = put_replicated(state.metric)
        adapt = put_replicated(state.adapt)
    return state.replace(
        z=z,
        metric=metric,
        adapt=adapt,
        key=jax.device_put(state.key, p_rep),
        iteration=jax.device_put(state.iteration, p_rep),
    )
