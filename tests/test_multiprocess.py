"""Execute the multi-process branches of parallel/distributed.py for real.

Launches a 2-process CPU pod (``jax.distributed.initialize`` on a localhost
coordinator; collectives ride Gloo) and runs ``tests/_mp_worker.py`` on each
rank: the ``process_count() > 1`` paths of ``gather_safe_sets_global`` and
``broadcast_from_host0`` — which no in-process test can reach — execute and
are checked against the single-process merge oracle inside the workers.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "_mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("n_procs", [2])
def test_multiprocess_gather_and_broadcast(n_procs):
    port = _free_port()
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        # two virtual devices per process: the ('hosts','chips') mesh gets a
        # genuine 2x2 pod shape
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": str(ROOT) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(n_procs), str(port)],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(n_procs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert f"MP_OK {i}" in out, f"rank {i} output:\n{out}"
