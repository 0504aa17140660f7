"""Checkpoint / resume for sampler state.

The reference's resumability lives in its `HMCState` snapshot
(/root/reference/src/abstractmcmc.jl:11-27) with no on-disk serialisation.
Here `HMCState` is a single pytree, so checkpointing is flatten → npz (no
extra deps; orbax-compatible since the state is a standard pytree).

Validation is structural: alongside the leaves we store a MANIFEST — one
(path, shape, dtype) record per leaf, with paths built from
`tree_flatten_with_path` (attribute/dict-key names). Loading validates
field-by-field against the target structure and fails with the offending
path, not an index. `str(treedef)` is NOT used for validation — treedef
string forms are not stable across JAX versions, so a string compare could
spuriously reject (or, bypassed, silently misalign) otherwise-valid
checkpoints.
"""

from __future__ import annotations

import json
import warnings

import numpy as np

import jax

from .sampler import HMCState, _path_name

MANIFEST_KEY = "__manifest__"
_LEGACY_TREEDEF_KEY = "__treedef__"


def _manifest_of(tree):
    """[(path, shape, dtype), ...] per leaf, in flatten order."""
    leaves_p, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in leaves_p:
        a = np.asarray(leaf)
        out.append((_path_name(path) or "<root>", list(a.shape), str(a.dtype)))
    return out


def _validate_manifest(stored, like_tree, what="checkpoint",
                       allow_narrowing=False):
    """Compare a stored manifest against `like_tree`'s structure; raise with
    a field-level message on any mismatch.

    dtype differences: same-width/widening loads warn and cast (x64 tests vs
    f32 production runs legitimately round-trip); NARROWING loads (f64→f32,
    int width loss, kind changes) raise unless `allow_narrowing=True` —
    silently dropping precision on restore is a data-loss bug, not a
    convenience (ADVICE r4)."""
    expected = _manifest_of(like_tree)
    if len(stored) != len(expected):
        s_paths = [m[0] for m in stored]
        e_paths = [m[0] for m in expected]
        missing = [p for p in e_paths if p not in s_paths]
        extra = [p for p in s_paths if p not in e_paths]
        raise ValueError(
            f"{what} structure mismatch: stored {len(stored)} leaves, "
            f"expected {len(expected)}."
            + (f" missing: {missing}" if missing else "")
            + (f" unexpected: {extra}" if extra else "")
        )
    for i, ((sp, ss, sd), (ep, es, ed)) in enumerate(zip(stored, expected)):
        if sp != ep:
            raise ValueError(
                f"{what} field {i} is {sp!r} but the target structure has "
                f"{ep!r} at that position (different spec or version?)"
            )
        if list(ss) != list(es):
            raise ValueError(
                f"{what} field {sp!r} has shape {tuple(ss)} but the target "
                f"expects {tuple(es)} (different chain count, dimension, or "
                "adaptor configuration?)"
            )
        if sd != ed:
            sdt, edt = np.dtype(sd), np.dtype(ed)
            narrowing = (edt.kind != sdt.kind) or (edt.itemsize < sdt.itemsize)
            if narrowing and not allow_narrowing:
                raise ValueError(
                    f"{what} field {sp!r} stored as {sd} but the target "
                    f"expects {ed}: loading would narrow (lose precision or "
                    "change kind). Pass allow_narrowing=True to cast anyway."
                )
            warnings.warn(
                f"{what} field {sp!r} stored as {sd}, loading as {ed}"
            )


def _load_leaves(data, prefix, like_tree, what, allow_narrowing=False):
    """Validate (manifest when present, shapes always) and rebuild the
    pytree from `prefix`-keyed npz entries."""
    import jax.numpy as jnp

    leaves_like, treedef = jax.tree_util.tree_flatten(like_tree)
    n_stored = sum(1 for k in data.files if k.startswith(prefix))
    if n_stored != len(leaves_like):
        raise ValueError(
            f"{what} has {n_stored} leaves but the target structure has "
            f"{len(leaves_like)}"
        )
    if MANIFEST_KEY in data.files:
        stored = json.loads(bytes(data[MANIFEST_KEY]).decode())
        _validate_manifest(stored, like_tree, what=what,
                           allow_narrowing=allow_narrowing)
    elif _LEGACY_TREEDEF_KEY in data.files:
        # Pre-manifest checkpoint: treedef strings are version-unstable, so
        # only warn on mismatch; shape validation below still protects
        # against misaligned loads.
        stored_str = bytes(data[_LEGACY_TREEDEF_KEY]).decode()
        if stored_str != str(treedef):
            warnings.warn(
                f"{what}: legacy treedef string differs from the target's "
                "(possibly a JAX version change); proceeding on per-leaf "
                "shape validation"
            )
    names = [m[0] for m in _manifest_of(like_tree)]
    leaves = []
    for i, b in enumerate(leaves_like):
        a = data[f"{prefix}{i}"]
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"{what} field {names[i]!r} has shape {tuple(a.shape)} but "
                f"the target expects {tuple(np.shape(b))} (different chain "
                "count, dimension, or adaptor configuration?)"
            )
        leaves.append(jnp.asarray(a, dtype=jnp.asarray(b).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_state(path: str, state: HMCState) -> None:
    leaves, _ = jax.tree_util.tree_flatten(state)
    manifest = json.dumps(_manifest_of(state)).encode()
    np.savez(
        path,
        **{MANIFEST_KEY: np.frombuffer(manifest, dtype=np.uint8)},
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_state(path: str, like: HMCState,
               allow_narrowing: bool = False) -> HMCState:
    """Load a checkpoint into the structure of `like` (same spec/shape run).

    The stored manifest (per-leaf path/shape/dtype) is validated against
    `like`: a structure mismatch (different spec, chain count, or dimension)
    raises naming the offending FIELD instead of silently misassigning
    leaves by index. Narrowing dtype loads (e.g. f64 checkpoint into an f32
    state) raise unless `allow_narrowing=True`.
    """
    data = np.load(path)
    return _load_leaves(data, "leaf_", like, what="checkpoint",
                        allow_narrowing=allow_narrowing)


def save_result(path: str, result) -> None:
    """Persist a SampleResult (draws + stats + online summary + final state)
    to one npz. Counterpart of `load_result`; the final state restores with
    manifest + shape validation against a like-structured state."""
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
    manifest = json.dumps(_manifest_of(result.final_state)).encode()
    payload[MANIFEST_KEY] = np.frombuffer(manifest, dtype=np.uint8)
    for i, leaf in enumerate(leaves):
        payload[f"state.leaf_{i}"] = np.asarray(leaf)
    np.savez(path, **payload)


def load_result(path: str, like_state=None, allow_narrowing: bool = False):
    """Load a SampleResult saved by `save_result`.

    `like_state` (an HMCState with matching structure, e.g. from init_state
    on the same spec) restores `final_state`; without it, final_state is
    None and only draws/stats/summaries load. Narrowing dtype loads raise
    unless `allow_narrowing=True` (see `load_state`).
    """
    from .sampler import SampleResult

    data = np.load(path)
    groups = {"stats": {}, "warmup_stats": {}, "online": {}}
    thetas = None
    for k in data.files:
        if k == "thetas":
            thetas = data[k]
        elif k.startswith("state.leaf_") or k == MANIFEST_KEY \
                or k == _LEGACY_TREEDEF_KEY:
            continue
        else:
            grp, name = k.split(".", 1)
            groups[grp][name] = data[k]
    final_state = None
    if like_state is not None:
        final_state = _load_leaves(
            data, "state.leaf_", like_state, what="saved state",
            allow_narrowing=allow_narrowing,
        )
    return SampleResult(
        thetas=thetas,
        stats=groups["stats"],
        warmup_stats=groups["warmup_stats"] or None,
        final_state=final_state,
        online=groups["online"] or None,
    )
