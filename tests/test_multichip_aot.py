"""Real-TPU-topology AOT compile check (requires the TPU PJRT plugin).

The CPU-device meshes used everywhere else run Pallas kernels in interpret
mode — plain partitionable HLO — so only an AOT compile against a real TPU
TopologyDescription can catch "Mosaic kernels cannot be automatically
partitioned" (GSPMD + tpu_custom_call). The fix under test is the shard_map
island in ops/sharding.py. The probe runs in a subprocess with a clean
platform env (this test process is pinned to CPU devices by conftest).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


def test_multichip_aot_compile():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
    env["XLA_FLAGS"] = flags.strip()
    try:
        proc = subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "check_multichip_compile.py")],
            capture_output=True,
            text=True,
            timeout=1500,
            env=env,
            cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        # a hung remote compile service (tunnel down) is an environment
        # condition, same class as the script's own SKIPs
        pytest.skip("multichip AOT check timed out (compile service down/hung)")
    if "SKIP:" in proc.stdout:
        pytest.skip(proc.stdout.strip()[:200])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "forward: COMPILE OK" in proc.stdout
    assert "train_step: COMPILE OK" in proc.stdout
