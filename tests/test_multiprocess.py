"""Multi-process (2-controller) distributed smoke (VERDICT r2 next #8):
spawns scripts/multiprocess_smoke.py — two local processes, 4 virtual
CPU devices each, joined via jax.distributed.initialize on localhost —
and requires the cross-process DP train-step loss to match a
single-process reference. Skips (recording the attempt) only when the
sandbox blocks distributed initialization (exit 75)."""

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "multiprocess_smoke.py")


def test_two_process_dp_train_step_matches_single():
    env = dict(os.environ, SMOKE_PORT="12953")
    # The smoke script manages its own JAX platform/devices per child.
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, SCRIPT], env=env,
                         capture_output=True, text=True, timeout=900)
    if out.returncode == 75:
        pytest.skip("environment blocks jax.distributed.initialize: "
                    + out.stderr[-500:])
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "multiprocess_smoke: OK" in out.stdout
