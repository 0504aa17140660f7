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
    """Load a checkpoint into the structure of `like` (same spec/shape run).

    The stored treedef and every leaf's shape are validated against `like`:
    a structure mismatch (different spec, chain count, or dimension) raises
    instead of silently misassigning leaves by index.
    """
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    if "__treedef__" in data.files:
        stored = bytes(data["__treedef__"]).decode()
        if stored != str(treedef):
            raise ValueError(
                "checkpoint structure mismatch: the stored state's treedef "
                f"differs from `like`'s.\n  stored: {stored}\n  "
                f"expected: {treedef}"
            )
    n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_stored != len(leaves_like):
        raise ValueError(
            f"checkpoint has {n_stored} leaves but `like` has "
            f"{len(leaves_like)}"
        )
    import jax.numpy as jnp

    leaves = []
    for i, b in enumerate(leaves_like):
        a = data[f"leaf_{i}"]
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"checkpoint leaf {i} has shape {tuple(a.shape)} but `like` "
                f"expects {tuple(np.shape(b))} (different chain count, "
                "dimension, or adaptor configuration?)"
            )
        leaves.append(jnp.asarray(a, dtype=jnp.asarray(b).dtype))
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
        if len(state_leaves) != len(leaves_like):
            raise ValueError(
                f"saved result has {len(state_leaves)} state leaves but "
                f"`like_state` has {len(leaves_like)}"
            )
        leaves = []
        for i, b in enumerate(leaves_like):
            a = state_leaves[i]
            if tuple(a.shape) != tuple(np.shape(b)):
                raise ValueError(
                    f"saved state leaf {i} has shape {tuple(a.shape)} but "
                    f"`like_state` expects {tuple(np.shape(b))}"
                )
            leaves.append(jnp.asarray(a, dtype=jnp.asarray(b).dtype))
        final_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return SampleResult(
        thetas=thetas,
        stats=groups["stats"],
        warmup_stats=groups["warmup_stats"] or None,
        final_state=final_state,
        online=groups["online"] or None,
    )
