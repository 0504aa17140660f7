"""Packed while-loop carry (nuts._packed_while_loop) is bit-exact.

The packed layouts only change the loop-carry storage (one wide array vs
~29 per-chain scalar buffers) — the per-leaf compute graph is unchanged, so
draws and statistics must be IDENTICAL to the default path, bitwise, in
both float32 (bench regime: f32 columns round-trip exactly, small ints and
bools are exact in f32) and the shared- and per-chain-metric modes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from advancedhmc_tpu import (
    AdaptorConfig,
    GeneralisedNoUTurn,
    HMCKernel,
    Leapfrog,
    Trajectory,
    init_state,
    make_metric,
)
from advancedhmc_tpu.models import std_gaussian
from advancedhmc_tpu.experimental import Experimental
from advancedhmc_tpu.sampler import SampleSpec, fused_draw_phase

DIM = 4
N_CHAINS = 8
FUSE = 6


def _state_and_spec(cross_chain):
    target = std_gaussian(DIM)
    kernel = HMCKernel(
        Trajectory(
            Leapfrog(step_size=jnp.asarray(0.4, jnp.float32)),
            GeneralisedNoUTurn(max_depth=5),
            "multinomial",
        )
    )
    spec = SampleSpec(target=target, kernel=kernel,
                      adaptor=AdaptorConfig(kind="none"),
                      cross_chain=cross_chain)
    theta0 = 0.5 * jax.random.normal(
        jax.random.PRNGKey(1), (N_CHAINS, DIM), jnp.float32
    )
    state = init_state(jax.random.PRNGKey(7), spec,
                       make_metric("diagonal", DIM, dtype=jnp.float32),
                       theta0, init_eps=0.4)
    return spec, state


def _draws(spec, state, pack):
    st, ths, stats = fused_draw_phase(spec, state, 2 * FUSE, FUSE,
                                      experimental=Experimental(
                                          pack_carry=pack))
    return st, ths, stats


def test_packed_carry_bitexact_shared_metric():
    spec, state = _state_and_spec(cross_chain=True)
    st0, th0, s0 = _draws(spec, state, "")
    for layout in ("fc", "cf"):
        st1, th1, s1 = _draws(spec, state, layout)
        np.testing.assert_array_equal(np.asarray(th0), np.asarray(th1))
        for k in s0:
            np.testing.assert_array_equal(
                np.asarray(s0[k]), np.asarray(s1[k]), err_msg=k
            )
        np.testing.assert_array_equal(
            np.asarray(st0.z.theta), np.asarray(st1.z.theta)
        )


def test_packed_carry_bitexact_per_chain_metric():
    spec, state = _state_and_spec(cross_chain=False)
    st0, th0, s0 = _draws(spec, state, "")
    st1, th1, s1 = _draws(spec, state, "fc")
    np.testing.assert_array_equal(np.asarray(th0), np.asarray(th1))
    for k in s0:
        np.testing.assert_array_equal(
            np.asarray(s0[k]), np.asarray(s1[k]), err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(st0.z.theta), np.asarray(st1.z.theta)
    )


def test_packed_carry_conflicting_knobs_raise():
    # pack_carry used to be silently ignored when the staged or ragged loop
    # layout was also requested (dispatch order staged > ragged > packed);
    # now the conflict is an explicit error.
    import pytest

    spec, state = _state_and_spec(cross_chain=True)
    with pytest.raises(ValueError, match="pack_carry"):
        fused_draw_phase(spec, state, 2 * FUSE, FUSE,
                         experimental=Experimental(pack_carry="fc",
                                                   stage_slots=2))
