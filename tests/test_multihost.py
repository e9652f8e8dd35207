"""2-process multi-host smoke test (VERDICT round-1 item 9).

``initialize_distributed`` (jwave_tpu/parallel/mesh.py) was previously only
no-op-tested in a single process. Here two real processes form a cluster
over a localhost coordinator and run sharded transforms whose collectives
cross the process boundary (Gloo on CPU; ICI on a real pod). Skipped — not
failed — when the sandbox cannot spawn the children or bind a port.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # big banks / sweeps; fast smoke lives in test_analysis_smoke.py

_CHILD = Path(__file__).with_name("multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_runs_sharded_transforms():
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover - sandbox without sockets
        pytest.skip(f"cannot bind a localhost port: {e}")

    env = dict(os.environ)
    # children do their own platform/device setup; drop the parent's test rig
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(_CHILD), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:  # pragma: no cover - loaded CI machine
        for p in procs:
            p.kill()
        pytest.skip("multi-host children timed out (coordinator handshake)")

    for i, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.splitlines()[-15:])
        assert p.returncode == 0, f"process {i} failed:\n{tail}"
        assert "MULTIHOST_OK" in out, f"process {i} incomplete:\n{tail}"
