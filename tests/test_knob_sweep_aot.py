"""Kernel-knob matrix AOT compile sweep (requires the TPU PJRT plugin).

Interpret-mode tests pin every knob combination's VALUES but cannot catch
Mosaic LOWERING failures (round 4's ksplit×joint_rel combo: "batch dims must
be equal" on real TPU, green everywhere else). This drives
scripts/aot_knob_sweep.py — one attention layer AOT-compiled per combo, ~3 s
each — in a subprocess with a clean platform env. Environment conditions
(no plugin, compile service down) SKIP; genuine lowering errors FAIL.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


def test_knob_matrix_aot_compiles():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
    env["XLA_FLAGS"] = flags.strip()
    try:
        proc = subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "aot_knob_sweep.py")],
            capture_output=True,
            text=True,
            timeout=1200,
            env=env,
            cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("knob sweep timed out (compile service down/hung)")
    if "SKIP: cannot build topology" in proc.stdout:
        pytest.skip(proc.stdout.strip()[:200])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "COMPILE FAILED" not in proc.stdout, proc.stdout
    # the production default (bf16 → clamp) must be explicitly on the record
    assert "clamp" in proc.stdout and "COMPILE OK" in proc.stdout, proc.stdout
