"""Static-quality gates (≅ Aqua/JET, /root/reference/test/quality.jl:7-12):
all modules import, __all__ resolves, public pytrees round-trip flatten."""

import importlib

import jax
import jax.numpy as jnp

MODULES = [
    "advancedhmc_tpu",
    "advancedhmc_tpu.target",
    "advancedhmc_tpu.metrics",
    "advancedhmc_tpu.kinetic",
    "advancedhmc_tpu.hamiltonian",
    "advancedhmc_tpu.integrators",
    "advancedhmc_tpu.termination",
    "advancedhmc_tpu.trajectory",
    "advancedhmc_tpu.nuts",
    "advancedhmc_tpu.stepsize_search",
    "advancedhmc_tpu.adaptation",
    "advancedhmc_tpu.sampler",
    "advancedhmc_tpu.constructors",
    "advancedhmc_tpu.diagnostics",
    "advancedhmc_tpu.checkpoint",
    "advancedhmc_tpu.profiling",
    "advancedhmc_tpu.models",
    "advancedhmc_tpu.parallel",
    "advancedhmc_tpu.parallel.mesh",
    "advancedhmc_tpu.riemannian",
    "advancedhmc_tpu.ops.fused_leapfrog",
    "advancedhmc_tpu.utils",
    "advancedhmc_tpu.models.dists",
    "advancedhmc_tpu.transforms",
    "advancedhmc_tpu.chees",
    "advancedhmc_tpu.experimental",
]


def test_all_modules_import():
    for m in MODULES:
        importlib.import_module(m)


def test_all_exports_resolve():
    import advancedhmc_tpu as ahmc

    for name in ahmc.__all__:
        assert getattr(ahmc, name, None) is not None, name


def test_pytrees_roundtrip():
    import advancedhmc_tpu as ahmc

    metric = ahmc.DiagEuclideanMetric.identity(3)
    leaves, treedef = jax.tree_util.tree_flatten(metric)
    again = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(again, ahmc.DiagEuclideanMetric)

    integ = ahmc.Leapfrog(step_size=jnp.asarray(0.1))
    leaves, treedef = jax.tree_util.tree_flatten(integ)
    assert len(leaves) == 1
