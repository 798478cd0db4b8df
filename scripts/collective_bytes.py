"""Byte-level communication audit: halo vs GSPMD-sparse train steps.

Compiles the two multi-chip sparse layouts at D = 2/4/8 on a virtual
CPU mesh, walks the optimized HLO with
`deeprank_gnn_tpu.parallel.hlo_bytes`, and prints the per-step
collective traffic each layout asks the interconnect to carry. This is
the hardware-free proof (or refutation) of the halo layout's design
claim: it should move ~boundary-row bytes where the GSPMD partitioner
re-materializes node-level arrays.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python scripts/collective_bytes.py

The table is recorded in SCALING.md; the invariants are pinned by
tests/test_halo.py::test_halo_collective_bytes_vs_gspmd.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the ambient sitecustomize preimports jax pinned to the TPU tunnel;
# the backend initializes lazily, so flip it before first device use
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from bench import build_graphs, NODE_FEATS
from deeprank_gnn_tpu.data.batch import collate
from deeprank_gnn_tpu.models import GINet
from deeprank_gnn_tpu.parallel import halo as H
from deeprank_gnn_tpu.parallel.hlo_bytes import (
    activation_collective_bytes,
    collective_bytes,
)
from deeprank_gnn_tpu.parallel.mesh import make_mesh, shard_batch
from deeprank_gnn_tpu.train.losses import mse_loss

BATCH = 32


def param_bytes(params) -> int:
    return sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(params))


def sparse_step_hlo(graphs, d: int, ep: int) -> tuple:
    """Compile the GSPMD sparse train step on a (dp=d//ep, ep) mesh and
    return its optimized HLO text (mirrors NeuralNet._build_steps_sharded)."""
    mesh = make_mesh(jax.devices()[:d], ep=ep)
    batch, _ = collate(graphs)
    model = GINet(NODE_FEATS, 1, 1)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    replicated = NamedSharding(mesh, P())

    def train_step(p, o, b, rng):
        rng, key = jax.random.split(rng)

        def loss_fn(pp):
            pred = model.apply(pp, b, training=True, rng=key).reshape(-1)
            return mse_loss(pred, b.y, b.y_mask)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, rng

    step = jax.jit(
        train_step,
        in_shardings=(replicated, replicated, None, replicated),
        out_shardings=(replicated,) * 4,
    )
    txt = (
        step.lower(
            params, opt.init(params), shard_batch(batch, mesh),
            jax.random.PRNGKey(1),
        )
        .compile()
        .as_text()
    )
    return txt, param_bytes(params), None


def halo_step_hlo(graphs, d: int) -> tuple:
    """Compile the explicit halo train step at D shards; also return
    the analytic boundary-exchange byte count implied by the partition
    (send_idx capacity x conv width, per exchange)."""
    mesh = H.make_halo_mesh(jax.devices()[:d])
    batch, _ = collate(graphs)
    model = GINet(NODE_FEATS, 1, 1)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    hb = H.partition_batch(batch, d)
    step = H.make_halo_train_step(model, opt, mesh)
    txt = (
        step.lower(
            params, opt.init(params), H.shard_halo_batch(hb, mesh),
            jax.random.PRNGKey(1),
        )
        .compile()
        .as_text()
    )
    # one interface exchange = D*D*H rows of conv1 width (16) fp32;
    # internal towers exchange Hi rows; fwd+bwd for two towers
    h = hb.send_idx.shape[-1]
    hi = hb.isend_idx.shape[-1]
    boundary = d * d * (h + hi) * 16 * 4
    return txt, param_bytes(params), boundary


def fmt(n: float) -> str:
    if n >= 1e6:
        return f"{n / 1e6:.2f} MB"
    if n >= 1e3:
        return f"{n / 1e3:.1f} KB"
    return f"{int(n)} B"


def main():
    graphs = build_graphs(num_graphs=BATCH)
    print(f"batch: {BATCH} graphs, fixture-scale (~130 nodes/500 edges)")
    header = (
        f"{'layout':<14}{'D':>3}{'act. coll. B/step':>20}"
        f"{'all-gather':>14}{'all-to-all':>14}{'all-reduce':>14}"
        f"{'reduce-scat':>13}{'permute':>10}{'boundary bound':>16}"
    )
    print(header)
    rows = []
    for d in (2, 4, 8):
        for name, fn in (
            ("gspmd ep=D", lambda d=d: sparse_step_hlo(graphs, d, ep=d)),
            ("gspmd ep=2", lambda d=d: sparse_step_hlo(graphs, d, ep=2)),
            ("halo", lambda d=d: halo_step_hlo(graphs, d)),
        ):
            if name == "gspmd ep=2" and d == 2:
                continue  # same mesh as ep=D at D=2
            txt, pb, boundary = fn()
            per_op = collective_bytes(txt)
            act = activation_collective_bytes(txt, pb)

            def ob(op):
                return per_op.get(op, {}).get("operand_bytes", 0)

            row = dict(
                layout=name, d=d, act=act,
                ag=ob("all-gather"), a2a=ob("all-to-all"),
                ar=ob("all-reduce"), rs=ob("reduce-scatter"),
                cp=ob("collective-permute"),
                boundary=boundary,
            )
            rows.append(row)
            print(
                f"{name:<14}{d:>3}{fmt(act):>20}{fmt(row['ag']):>14}"
                f"{fmt(row['a2a']):>14}{fmt(row['ar']):>14}"
                f"{fmt(row['rs']):>13}{fmt(row['cp']):>10}"
                f"{(fmt(boundary) if boundary else '-'):>16}"
            )
    print()
    print("markdown:")
    print("| layout | D | activation collective B/step | all-gather | "
          "all-to-all | all-reduce | reduce-scatter | permute | "
          "boundary bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['layout']} | {r['d']} | {fmt(r['act'])} | {fmt(r['ag'])} |"
            f" {fmt(r['a2a'])} | {fmt(r['ar'])} | {fmt(r['rs'])} |"
            f" {fmt(r['cp'])} |"
            f" {fmt(r['boundary']) if r['boundary'] else '—'} |"
        )


if __name__ == "__main__":
    main()
