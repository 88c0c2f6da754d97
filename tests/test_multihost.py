"""Multi-host (multi-process) SMC: two OS processes with 4 CPU devices each
form one 8-device mesh via jax.distributed and run sharded generations -
the DCN-across-hosts topology of SURVEY 5.8, minus the network."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_generation():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/multihost_worker.py", str(i), "2",
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo", env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=500)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, mean, wnorm = line.split()
                results[pid] = (mean, wnorm)
    assert set(results) == {"0", "1"}
    # both processes computed the same replicated survivors/weights
    assert results["0"] == results["1"], results