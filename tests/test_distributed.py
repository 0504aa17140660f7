"""Multi-PROCESS distributed simulation (SURVEY.md §2.3 / BASELINE 2-host
scaling proxy): 2 local processes × 4 CPU devices under jax.distributed with
gloo collectives must reproduce the single-process 8-device run — the same
global mesh, chains sharded over the process boundary, cross-chain
adaptation reductions crossing it as all-reduces. Exceeds the reference's
`MCMCDistributed` (independent chains, zero communication,
/root/reference/src/abstractmcmc.jl:90-129)."""

import os
import socket
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(devices_per_proc: int):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # overwrite (conftest's 8-device flag is in the inherited env)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    return env


def _run_topology(num_processes: int, tmp_path, tag: str):
    port = _free_port()
    out = str(tmp_path / f"dist_{tag}.npz")
    devices = 8 // num_processes
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(num_processes),
             str(port), out],
            env=_worker_env(devices), cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(num_processes)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so[-1500:]}\n{se[-3000:]}"
    return np.load(out)


def test_two_process_matches_single_process(tmp_path):
    golden = _run_topology(1, tmp_path, "p1")
    multi = _run_topology(2, tmp_path, "p2")

    # Cross-process all-reduces may associate differently than the
    # single-process 8-way reduction; everything downstream must still agree
    # to reduction-order tolerance.
    np.testing.assert_allclose(multi["eps"], golden["eps"], rtol=1e-9)
    np.testing.assert_allclose(multi["m_inv"], golden["m_inv"], rtol=1e-9)
    np.testing.assert_allclose(multi["thetas"], golden["thetas"],
                               rtol=1e-7, atol=1e-9)
    assert multi["total_steps"] == golden["total_steps"]
    # fused production path (batch-explicit while_loop + block-replayed
    # cross-chain adaptation) across the process boundary
    np.testing.assert_allclose(multi["fused_eps"], golden["fused_eps"],
                               rtol=1e-9)
    np.testing.assert_allclose(multi["fused_m_inv"], golden["fused_m_inv"],
                               rtol=1e-9)
    np.testing.assert_allclose(multi["fused_thetas"], golden["fused_thetas"],
                               rtol=1e-7, atol=1e-9)
    assert multi["fused_steps"] == golden["fused_steps"]

    # sanity: the run actually sampled (adapted eps, moved chains)
    assert golden["eps"] > 0
    draws = golden["thetas"][30:].reshape(-1, golden["thetas"].shape[-1])
    assert np.linalg.norm(draws.mean(axis=0)) < 0.8


def test_four_process_matches_single_process(tmp_path):
    # 4 procs × 2 devices varies the cross-process reduction associativity
    # relative to the 2×4 case — same golden run must still be reproduced.
    golden = _run_topology(1, tmp_path, "g4")
    multi = _run_topology(4, tmp_path, "p4")
    np.testing.assert_allclose(multi["eps"], golden["eps"], rtol=1e-9)
    np.testing.assert_allclose(multi["m_inv"], golden["m_inv"], rtol=1e-9)
    np.testing.assert_allclose(multi["thetas"], golden["thetas"],
                               rtol=1e-7, atol=1e-9)
    assert multi["total_steps"] == golden["total_steps"]
    # fused production path (batch-explicit while_loop + block-replayed
    # cross-chain adaptation) across the process boundary
    np.testing.assert_allclose(multi["fused_eps"], golden["fused_eps"],
                               rtol=1e-9)
    np.testing.assert_allclose(multi["fused_m_inv"], golden["fused_m_inv"],
                               rtol=1e-9)
    np.testing.assert_allclose(multi["fused_thetas"], golden["fused_thetas"],
                               rtol=1e-7, atol=1e-9)
    assert multi["fused_steps"] == golden["fused_steps"]


def test_distributed_init_reraises_real_failures(monkeypatch):
    # A genuine coordination failure must raise, not be silently swallowed
    # (the old blanket `except RuntimeError: pass`); only the
    # already-initialised case no-ops. (A real bad-coordinator connect
    # FATALs the whole process inside the C++ coordination client, so the
    # wrapper's error routing is unit-tested via monkeypatch.)
    import types

    import jax
    import pytest

    from advancedhmc_tpu.parallel import mesh as mesh_mod

    calls = []

    def fake_initialize(**kwargs):
        calls.append(kwargs)
        raise RuntimeError("Unable to connect to coordinator at "
                           "localhost:1: Deadline Exceeded")

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    with pytest.raises(RuntimeError, match="coordinator"):
        mesh_mod.distributed_init(coordinator_address="localhost:1",
                                  num_processes=2, process_id=1)
    assert len(calls) == 1

    # the already-initialised RuntimeError is still a no-op
    def fake_initialize_dup(**kwargs):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize_dup)
    mesh_mod.distributed_init()  # must not raise

    # an active client short-circuits before touching initialize
    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setattr(jax._src.distributed, "global_state",
                        types.SimpleNamespace(client=object()))
    calls.clear()
    mesh_mod.distributed_init()
    assert calls == []
