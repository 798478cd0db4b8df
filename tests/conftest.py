"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware and must exercise multi-device
sharding, so we pin JAX to the CPU backend with 8 virtual devices
before jax initializes (the reference has no analog — it is
single-device only, reference `NeuralNet.py:207-208`).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# force CPU: the ambient environment pins JAX_PLATFORMS to the remote
# TPU tunnel (and a sitecustomize preimports jax), which would make
# every test compile remotely. The backend initializes lazily, so
# flipping the config here still works.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil

import pytest

REFERENCE_FIXTURE = "/root/reference/tests/hdf5/1ATN_residue.hdf5"


@pytest.fixture()
def fixture_hdf5(tmp_path):
    """A scratch copy of the 10-graph 1ATN fixture (some APIs, like
    PreCluster, mutate the input file — reference quirk Q8)."""
    dst = tmp_path / "1ATN_residue.hdf5"
    shutil.copy(REFERENCE_FIXTURE, dst)
    return str(dst)
