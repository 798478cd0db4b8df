"""True multi-host training test: a 2-process jax CPU cluster (4
virtual devices per process -> 8 global) runs one sharded train step.

The reference has nothing like this (single process, single device);
SURVEY §4 explicitly calls out multi-host CPU-mesh tests as the gap to
fill.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training_step():
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
        assert "devices=8" in out
    # both processes computed the same global loss
    losses = [
        line.split("loss=")[1]
        for out in outputs
        for line in out.splitlines()
        if "MULTIHOST_OK" in line
    ]
    assert len(losses) == 2 and losses[0] == losses[1]
