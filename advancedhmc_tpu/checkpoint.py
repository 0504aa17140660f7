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


def save_result(path: str, result) -> None:
    """Persist a SampleResult (draws + stats + online summary + final state)
    to one npz. Counterpart of `load_result`; the final state restores with
    the structure of a freshly-built state via `load_state`-style matching."""
    payload = {}
    if result.thetas is not None:
        payload["thetas"] = np.asarray(result.thetas)
    for k, v in result.stats.items():
        payload[f"stats.{k}"] = np.asarray(v)
    if result.warmup_stats:
        for k, v in result.warmup_stats.items():
            payload[f"warmup_stats.{k}"] = np.asarray(v)
    if result.online:
        for k, v in result.online.items():
            payload[f"online.{k}"] = np.asarray(v)
    leaves, _ = jax.tree_util.tree_flatten(result.final_state)
    for i, leaf in enumerate(leaves):
        payload[f"state.leaf_{i}"] = np.asarray(leaf)
    np.savez(path, **payload)


def load_result(path: str, like_state=None):
    """Load a SampleResult saved by `save_result`.

    `like_state` (an HMCState with matching structure, e.g. from init_state
    on the same spec) restores `final_state`; without it, final_state is
    None and only draws/stats/summaries load.
    """
    from .sampler import SampleResult

    data = np.load(path)
    groups = {"stats": {}, "warmup_stats": {}, "online": {}}
    thetas = None
    state_leaves = {}
    for k in data.files:
        if k == "thetas":
            thetas = data[k]
        elif k.startswith("state.leaf_"):
            state_leaves[int(k.split("_")[-1])] = data[k]
        else:
            grp, name = k.split(".", 1)
            groups[grp][name] = data[k]
    final_state = None
    if like_state is not None:
        import jax.numpy as jnp

        leaves_like, treedef = jax.tree_util.tree_flatten(like_state)
        leaves = [
            jnp.asarray(state_leaves[i], dtype=b.dtype)
            for i, b in enumerate(leaves_like)
        ]
        final_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return SampleResult(
        thetas=thetas,
        stats=groups["stats"],
        warmup_stats=groups["warmup_stats"] or None,
        final_state=final_state,
        online=groups["online"] or None,
    )
