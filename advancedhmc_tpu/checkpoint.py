"""Checkpoint / resume for sampler state.

The reference's resumability lives in its `HMCState` snapshot
(/root/reference/src/abstractmcmc.jl:11-27) with no on-disk serialisation.
Here `HMCState` is a single pytree, so checkpointing is flatten → npz (no
extra deps; orbax-compatible since the state is a standard pytree).
"""

from __future__ import annotations

import numpy as np

import jax

from .sampler import HMCState


def save_state(path: str, state: HMCState) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_state(path: str, like: HMCState) -> HMCState:
    """Load a checkpoint into the structure of `like` (same spec/shape run)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    import jax.numpy as jnp

    leaves = [jnp.asarray(a, dtype=b.dtype) for a, b in zip(leaves, leaves_like)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
