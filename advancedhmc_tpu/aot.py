"""AOT program artifacts: trace-free warm starts via ``jax.export``.

The one-time cost of bringing up a fused sampling program has three parts
(PERF.md "Program-load floor"): the Python trace (~1.9 s for the two warmup
programs at bench shape), XLA compilation (already amortised by the
persistent compile cache) and device program load over the transport. This
module removes the FIRST part on repeat runs: the traced StableHLO is
serialized to disk keyed by program identity + argument avals, and later
processes deserialize it in milliseconds instead of re-running the Python
trace. Compilation of the deserialized module still goes through XLA and
therefore still hits the persistent compile cache.

Semantics: the artifact replays the exact StableHLO of the original trace,
so a cache-hit call is bitwise-identical to the jitted original (pinned by
tests/test_aot.py). The cache key includes the jax version, backend
platform/device kind, the caller-supplied program identity string, the
input treedef and every leaf's shape/dtype — any mismatch re-traces and
overwrites the artifact. Artifacts are pairs of files:
``<sig>.stablehlo`` (``jax.export`` serialization) and ``<sig>.treedef``
(pickled output treedef — ``jax.export`` round-trips flat leaves, the
sidecar restores the pytree structure without tracing).

New capability vs the reference: Julia's method JIT caches native code
per-session only; cross-process AOT program artifacts are a deployment
feature with no counterpart in AdvancedHMC.jl.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile

import jax
from jax import tree_util as jtu

__all__ = ["aot_program", "aot_signature"]

_DEFAULT_DIR = os.environ.get("AHMC_AOT_DIR", "/tmp/ahmc_aot_cache")


def aot_signature(program_id: str, example_args) -> str:
    """Cache signature: program identity + platform + input avals.

    ``program_id`` must capture everything about the program that is not
    visible in the arguments (closure config, static args, package
    version) — two different programs with the same id and avals would
    alias. Bench/production callers embed their static config in it.
    """
    leaves, tdef = jtu.tree_flatten(example_args)
    dev = jax.devices()[0]
    parts = [
        jax.__version__,
        getattr(dev, "platform", "?"),
        getattr(dev, "device_kind", "?"),
        program_id,
        str(tdef),
    ]
    parts += [f"{tuple(getattr(l, 'shape', ()))}:"
              f"{getattr(l, 'dtype', type(l).__name__)}" for l in leaves]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:20]


def _write_atomic(path: str, data: bytes) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    try:
        os.write(fd, data)
    finally:
        os.close(fd)
    os.replace(tmp, path)


def aot_program(fn, example_args, *, program_id: str,
                cache_dir: str | None = None, verbose: bool = False):
    """Return ``(call, source)``: ``call(*args) ≡ jax.jit(fn)(*args)``.

    ``call`` accepts/returns the same pytrees as ``fn`` for any arguments
    matching ``example_args``'s structure and avals. ``source`` is
    ``"cache"`` when the StableHLO was deserialized from disk (no Python
    trace of ``fn``) or ``"trace"`` when it was freshly exported (the
    artifact is written for the next process). Any artifact-load failure
    falls back to the trace path — corrupt/stale files are overwritten,
    never fatal.

    The deserialized callable is wrapped in ``jax.jit``; its XLA
    compilation is subject to the persistent compile cache like any other
    program. Donation/sharding hints on the original ``jax.jit`` are NOT
    carried through an artifact — use for load-time-critical programs
    whose arguments are small relative to compute (the fused warmup blocks,
    not the draw loop's donated buffers).
    """
    from jax import export as jex

    cache_dir = cache_dir or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    sig = aot_signature(program_id, example_args)
    hlo_path = os.path.join(cache_dir, f"{sig}.stablehlo")
    td_path = os.path.join(cache_dir, f"{sig}.treedef")

    leaves_in, tdef_in = jtu.tree_flatten(example_args)

    if os.path.exists(hlo_path) and os.path.exists(td_path):
        try:
            with open(hlo_path, "rb") as f:
                exported = jex.deserialize(f.read())
            with open(td_path, "rb") as f:
                tdef_out = pickle.load(f)
            call_flat = jax.jit(exported.call)

            def call_cached(*args):
                lv = jtu.tree_leaves(args)
                return jtu.tree_unflatten(tdef_out, call_flat(*lv))

            if verbose:
                print(f"# aot: loaded {program_id} from {hlo_path} "
                      "(no Python trace)", file=sys.stderr)
            return call_cached, "cache"
        except Exception as e:  # stale jax version, corrupt file, ...
            if verbose:
                print(f"# aot: artifact load failed ({e!r}); re-tracing",
                      file=sys.stderr)

    # Trace path: export once, persist, return the compiled callable.
    tdef_out_box = []

    def flat_fn(*lv):
        out = fn(*jtu.tree_unflatten(tdef_in, list(lv)))
        out_leaves, tdef_out = jtu.tree_flatten(out)
        tdef_out_box.append(tdef_out)
        return tuple(out_leaves)

    exported = jex.export(jax.jit(flat_fn))(*leaves_in)
    try:
        _write_atomic(hlo_path, exported.serialize())
        _write_atomic(td_path, pickle.dumps(tdef_out_box[0]))
    except Exception as e:  # read-only cache dir etc. — never fatal
        if verbose:
            print(f"# aot: artifact write failed ({e!r})", file=sys.stderr)
    call_flat = jax.jit(exported.call)
    tdef_out = tdef_out_box[0]

    def call_traced(*args):
        lv = jtu.tree_leaves(args)
        return jtu.tree_unflatten(tdef_out, call_flat(*lv))

    if verbose:
        print(f"# aot: exported {program_id} -> {hlo_path}",
              file=sys.stderr)
    return call_traced, "trace"
