"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the multi-device testing strategy recommended in SURVEY.md §4.10: no
TPU pod is available in CI, so sharding behaviour is validated on
`--xla_force_host_platform_device_count=8` host devices.
"""

import os

# XLA's CPU compile passes recurse deeply on the big fused while-loop bodies
# (nuts.py) and can blow the default 8 MB stack mid-suite (observed: SIGSEGV
# in backend_compile_and_load after ~150 tests). Raise the limit before the
# backend spins up; applies to the main thread and all later pthreads.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 << 20
    if _hard != resource.RLIM_INFINITY:
        _want = min(_want, _hard)
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except Exception:
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize registers the axon (TPU-tunnel) backend and
# overrides jax_platforms, so the env var alone is not enough — force CPU via
# the config API before any backend is initialised.
import jax

jax.config.update("jax_platforms", "cpu")
# Match the reference's Float64-default numerics in tests (the reference is
# Julia/Float64; TPU bench runs exercise the Float32 path separately).
jax.config.update("jax_enable_x64", True)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
