"""Driver-contract test: dryrun_multichip must self-bootstrap its mesh.

Round-1 failure mode (VERDICT.md §missing-1): the driver invokes
`dryrun_multichip(8)` in the AMBIENT env — JAX_PLATFORMS=axon, no
xla_force_host_platform_device_count — and the entry asserted instead of
bootstrapping. This test reproduces the driver's exact call in a clean
subprocess with the ambient-style env restored.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_bootstraps_ambient_env():
    env = dict(os.environ)
    # undo conftest's CPU forcing: present the entry with a driver-like env
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        text=True,
        capture_output=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dp train step ok on 8 devices" in proc.stdout
    assert "camera-parallel step ok: 8 cameras" in proc.stdout
