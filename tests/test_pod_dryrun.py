"""Pod-topology dryrun: the multichip contract beyond the 8-device mesh.

``__graft_entry__.dryrun_multichip`` is the driver's multi-chip gate (FPD
train step + flip-test eval decode bit-equality vs 1 device + checkpoint
round trip, for the hourglass FPD pair AND the tiny-HRNet / tiny-ResNet
COCO-family legs).  The driver exercises it at n=8; this test exercises the same
contract at a pod-slice-sized n=16 so nothing in the mesh construction,
shard_map programs, or eval gather semantics silently assumes n<=8 (e.g.
v5e-16 / v4-16 slice topologies).  Runs in a subprocess because the device
count must be forced before backend init (conftest already pinned this
process to 8 virtual devices).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_16_devices():
    env = dict(os.environ)
    # drop the conftest's 8-device forcing; the child sets its own count
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(16)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"dryrun_multichip(16) failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-3000:]}")
    assert "dryrun_multichip(16): ok" in proc.stdout
