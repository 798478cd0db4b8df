"""AOT executable cache (train/aot.py): a second consumer at the same
shapes deserializes the compiled step instead of invoking XLA.

Through the remote-TPU tunnel cold compiles cost 1-10 minutes per
process and jax's persistent compile cache does not carry across
processes on every backend plugin — the executable snapshot does.
jax's executable unpickler binds all local devices, so snapshots are
only loaded for programs spanning every local device (the 1-chip TPU
and full-mesh cases); anything else falls back to a normal compile."""

import os
import subprocess
import sys

import jax
import numpy as np
import optax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sharded_step_and_args():
    """A full-mesh (8-device) sharded train step — the shape that the
    snapshot cache supports in a multi-device process."""
    import __graft_entry__ as ge
    from deeprank_gnn_tpu.data.batch import collate
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.parallel import make_mesh, make_sharded_train_step
    from deeprank_gnn_tpu.parallel.mesh import shard_batch

    graphs = ge._tiny_graphs(num_graphs=8)
    batch, _ = collate(graphs, node_mult=64, edge_mult=128)
    model = GINet(input_shape=8, output_shape=1, input_shape_edge=1)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    mesh = make_mesh(jax.devices())
    step = make_sharded_train_step(model, optimizer, mesh, task="reg")
    sbatch = shard_batch(batch, mesh)
    return step, (params, opt_state, sbatch, jax.random.PRNGKey(1))


def test_aot_roundtrip_same_process(tmp_path):
    from deeprank_gnn_tpu.train.aot import AotCachedFunction

    step, args = _sharded_step_and_args()
    cache = str(tmp_path / "exec")

    f1 = AotCachedFunction(step, cache, name="step")
    _, _, loss1, _, _ = f1(*args)
    assert f1.loaded_from_cache is False
    files = os.listdir(cache)
    assert any(n.endswith(".jaxexec") for n in files), files

    # a fresh wrapper (models a new process) must LOAD, not compile
    f2 = AotCachedFunction(step, cache, name="step")
    _, _, loss2, _, _ = f2(*args)
    assert f2.loaded_from_cache is True
    assert float(loss1) == float(loss2)


def test_aot_stale_snapshot_recompiles(tmp_path):
    from deeprank_gnn_tpu.train.aot import AotCachedFunction

    step, args = _sharded_step_and_args()
    cache = str(tmp_path / "exec")
    f1 = AotCachedFunction(step, cache, name="step")
    f1(*args)
    (path,) = [
        os.path.join(cache, n)
        for n in os.listdir(cache)
        if n.endswith(".jaxexec")
    ]
    with open(path, "wb") as f:
        f.write(b"corrupt")
    f2 = AotCachedFunction(step, cache, name="step")
    _, _, loss, _, _ = f2(*args)
    assert f2.loaded_from_cache is False  # recompiled, didn't crash
    assert np.isfinite(float(loss))


def test_aot_partial_device_program_not_loaded(tmp_path):
    """Single-device jit in an 8-device process: the snapshot must be
    refused at load time (the unpickler would bind all 8 devices)."""
    from deeprank_gnn_tpu.train.aot import AotCachedFunction

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device process")
    cache = str(tmp_path / "exec")

    def f(x):
        return (x * 2.0).sum()

    x = np.ones((8, 8), np.float32)
    f1 = AotCachedFunction(jax.jit(f), cache, name="f")
    out1 = float(f1(x))
    f2 = AotCachedFunction(jax.jit(f), cache, name="f")
    out2 = float(f2(x))
    assert f2.loaded_from_cache is False  # refused, recompiled
    assert out1 == out2 == 128.0


_CHILD = r"""
import os, sys, time
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, sys.argv[2])
from deeprank_gnn_tpu import NeuralNet
from deeprank_gnn_tpu.models import GINet

t0 = time.time()
nn = NeuralNet(sys.argv[3], GINet,
               node_feature=['type', 'polarity', 'bsa'],
               edge_feature=['dist'], target='irmsd', batch_size=8,
               percent=[1.0, 0.0], outdir=sys.argv[4], shuffle=False,
               executable_cache_dir=sys.argv[1])
nn.train(nepoch=1)
print(f'CHILD_OK loaded={nn._train_step.loaded_from_cache} '
      f'wall={time.time() - t0:.2f} loss={nn.train_loss[0]:.6f}')
"""


def test_aot_second_process_cold_start(tmp_path, fixture_hdf5):
    """The VERDICT item-10 'done' criterion: a second process at the
    same shapes loads the serialized executable instead of compiling
    (child runs single-device, mirroring the 1-chip TPU tunnel)."""
    cache = str(tmp_path / "exec")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    outs = []
    for run in range(2):
        out = subprocess.run(
            [
                sys.executable, "-c", _CHILD, cache,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                fixture_hdf5, str(tmp_path / f"out{run}"),
            ],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        (line,) = [l for l in out.stdout.splitlines() if "CHILD_OK" in l]
        outs.append(line)
        print(line)
    assert "loaded=False" in outs[0]
    assert "loaded=True" in outs[1]
    # identical first-epoch loss through the deserialized executable
    assert outs[0].split("loss=")[1] == outs[1].split("loss=")[1]
