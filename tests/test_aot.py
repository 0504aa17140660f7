"""AOT program artifacts (advancedhmc_tpu.aot).

Gates: a cache-hit call replays the exported StableHLO bitwise vs the
jitted original WITHOUT re-running the Python trace; signatures isolate
programs by identity and avals; corrupt artifacts fall back to tracing.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu

from advancedhmc_tpu import (
    AdaptorConfig,
    GeneralisedNoUTurn,
    HMCKernel,
    Leapfrog,
    Trajectory,
    make_metric,
)
from advancedhmc_tpu.aot import aot_program, aot_signature
from advancedhmc_tpu.models import std_gaussian
from advancedhmc_tpu.sampler import (
    SampleSpec,
    fused_warmup_phase_crosschain,
    init_state,
)

DIM, CHAINS = 4, 16


def _warm_setup():
    target = std_gaussian(DIM)
    kernel = HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.3, jnp.float64)),
            GeneralisedNoUTurn(max_depth=4),
            "multinomial",
        )
    )
    spec = SampleSpec(target=target, kernel=kernel,
                      adaptor=AdaptorConfig(kind="stan"), cross_chain=True)
    st0 = init_state(
        jax.random.PRNGKey(5), spec,
        make_metric("diagonal", DIM, dtype=jnp.float64),
        0.2 * jax.random.normal(jax.random.PRNGKey(1), (CHAINS, DIM),
                                jnp.float64))
    return spec, st0


def test_aot_roundtrip_bitwise_and_no_retrace(tmp_path):
    spec, st0 = _warm_setup()
    traces = []

    def warm(st):
        traces.append(1)  # counts Python traces of the program
        return fused_warmup_phase_crosschain(spec, st, 16, 8)

    ref = jax.jit(warm)(st0)
    n_ref_traces = len(traces)

    call1, src1 = aot_program(warm, (st0,), program_id="warm/16/8",
                              cache_dir=str(tmp_path))
    assert src1 == "trace"
    out1 = call1(st0)

    call2, src2 = aot_program(warm, (st0,), program_id="warm/16/8",
                              cache_dir=str(tmp_path))
    assert src2 == "cache"
    out2 = call2(st0)
    # the cache-hit path must not have re-run the Python trace
    assert len(traces) == n_ref_traces + 1

    for name, out in (("trace", out1), ("cache", out2)):
        ref_lv, ref_td = jtu.tree_flatten(ref)
        out_lv, out_td = jtu.tree_flatten(out)
        assert out_td == ref_td, name
        for a, b in zip(out_lv, ref_lv):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


def test_aot_signature_isolation():
    spec, st0 = _warm_setup()
    s1 = aot_signature("warm/16/8", (st0,))
    s2 = aot_signature("warm/32/8", (st0,))     # different program id
    st_wide = jtu.tree_map(
        lambda x: (jnp.concatenate([x, x]) if getattr(x, "ndim", 0) > 0
                   and x.shape[0] == CHAINS else x), st0)
    s3 = aot_signature("warm/16/8", (st_wide,))  # different avals
    assert len({s1, s2, s3}) == 3


def test_aot_corrupt_artifact_falls_back(tmp_path):
    spec, st0 = _warm_setup()

    def warm(st):
        return fused_warmup_phase_crosschain(spec, st, 16, 8)

    _, src = aot_program(warm, (st0,), program_id="p", cache_dir=str(tmp_path))
    assert src == "trace"
    sig = aot_signature("p", (st0,))
    path = os.path.join(str(tmp_path), f"{sig}.stablehlo")
    with open(path, "wb") as f:
        f.write(b"not stablehlo")
    call, src = aot_program(warm, (st0,), program_id="p",
                            cache_dir=str(tmp_path))
    assert src == "trace"  # fell back and overwrote
    call(st0)
    call2, src2 = aot_program(warm, (st0,), program_id="p",
                              cache_dir=str(tmp_path))
    assert src2 == "cache"
