"""Driver-facing contracts: bench.py emits one JSON line; __graft_entry__
compiles single-chip and dry-runs the multi-chip mesh."""

import json
import os
import subprocess
import sys

import jax


def test_bench_smoke_json_line():
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        AHMC_BENCH_CHAINS="16",
        AHMC_BENCH_DRAWS="8",
        AHMC_BENCH_WARMUP="8",
        AHMC_BENCH_DIM="12",
        AHMC_BENCH_CHUNK="4",
        AHMC_BENCH_FUSE="4",
        AHMC_BENCH_MAX_DEPTH="5",
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in rec
    assert rec["value"] > 0


def test_graft_entry():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(len(jax.devices()))


def test_bench_aot_artifact_roundtrip(tmp_path):
    """AHMC_BENCH_AOT=1 contract: the second bench process loads the
    warm-chunk program from the artifact cache WITHOUT re-tracing and
    reproduces the first run's statistics exactly (the artifact replays
    the original trace's StableHLO — see advancedhmc_tpu/aot.py)."""
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        AHMC_BENCH_AOT="1",
        AHMC_AOT_DIR=str(tmp_path),
        AHMC_BENCH_CHAINS="16",
        AHMC_BENCH_DRAWS="8",
        AHMC_BENCH_WARMUP="8",
        AHMC_BENCH_DIM="12",
        AHMC_BENCH_CHUNK="4",
        AHMC_BENCH_FUSE="4",
        AHMC_BENCH_MAX_DEPTH="5",
        AHMC_BENCH_CHEES="0",
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run():
        out = subprocess.run(
            [sys.executable, os.path.join(root, "bench.py")],
            capture_output=True, text=True, timeout=600, env=env, cwd=root,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1]), out.stderr

    rec1, err1 = run()
    assert "aot[trace]" in err1, err1[-2000:]
    rec2, err2 = run()
    assert "aot[cache]" in err2, err2[-2000:]
    assert "no Python trace" in err2
    for k in ("mean_logsigma", "sd_logsigma", "mean_beta_norm",
              "median_pooled_ess", "divergence_rate"):
        assert rec1[k] == rec2[k], (k, rec1[k], rec2[k])
