"""True multi-process mesh validation (jax.distributed + cross-process
collectives) via scripts/multihost_check.py — the code path a TPU pod uses."""

import os
import subprocess
import sys

def test_two_process_sharded_render_matches_single():
    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "multihost_check.py"
    )
    env = dict(os.environ)
    # The workers manage their own platform/device-count flags.
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=280,
        env=env,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "multi-host check passed" in res.stdout
