"""Multi-host (DCN) camera fleet: 2 real processes x 4 CPU devices each.

SURVEY.md §5 names 'multi-host batch runs over DCN' as the TPU-native
distributed equivalent; VERDICT missing-4 asked for a jax.distributed
initialize path exercised by actually spawning processes. Each worker joins
the runtime, feeds its own cameras into the GLOBAL 8-device camera-sharded
step, and verifies its local outputs against the single-process oracle.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_camera_fleet():
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"localhost:{port}", "2", str(pid)],
            cwd=REPO, env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST OK pid={pid} local_cams=4 global_devices=8" in out
