"""Pallas TPU kernel: segment-sum over row-sorted edges.

This is the sparse-layout hot path of every conv layer (reference hot
loop `ginet.py:57-71`: gather -> GEMM -> scatter_sum). XLA lowers an
unsorted scatter-add on TPU to a serialized update loop; with the rows
SORTED (the loader sorts each graph's doubled edges by source node —
see `data/dataset.py`; concatenation with offsets keeps the batch
globally sorted) the scatter becomes a *windowed one-hot contraction*
that runs on the MXU:

    for each block of BE edges (grid step, sequential):
        w0   = block's first row, aligned down to 128
        oh   = (rows - w0 == iota_W)        # [BE, W] one-hot in VMEM
        out[w0 : w0+W] += oh^T @ data       # MXU contraction

The full output accumulator lives in VMEM across grid steps (constant
output index map). Window width W = BE + 128 covers every row a block
can touch, because sorted rows with no gaps advance by at most one
distinct value per edge; batches are checked for that contract at
collate time (`sorted_window_ok`) and fall back to the XLA path when it
fails. Padding edges carry row == num_segments, land in the slack rows
`[N, N+W)` of the accumulator (or one-hot to nothing), and are sliced
off — identical drop semantics to `ops.segment.segment_sum`.

Backward: d(data) = grad[rows] masked at padding — a plain XLA gather
(fast on TPU), wired via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_EDGES = 512
WINDOW = BLOCK_EDGES + 128  # worst-case: 128-aligned start + block span
# VMEM accumulator budget: out[N + W, F] fp32 must fit comfortably
_VMEM_ACCUM_BYTES = 8 * 1024 * 1024


def required_window(rows: np.ndarray, num_segments: int):
    """Host-side: the smallest window (multiple of 128) satisfying the
    kernel contract for these sorted rows — within every
    BLOCK_EDGES-aligned block, all valid rows fit in
    [align128(first_row), align128(first_row) + W). Returns None for
    unsorted rows.

    The kernel's MXU work is 2*E*W*F, so a tight window is a direct
    speedup: real graph batches advance ~1 row per `degree` edges, so
    their span per 512-edge block is ~512/degree + 127 — typically 256
    instead of the worst-case 640."""
    e = len(rows)
    if e == 0:
        return 128
    if (np.diff(rows) < 0).any():
        return None
    nb = -(-e // BLOCK_EDGES)
    padded = np.full(nb * BLOCK_EDGES, num_segments, dtype=np.int64)
    padded[:e] = rows
    blocks = padded.reshape(nb, BLOCK_EDGES)
    starts = (blocks[:, 0] // 128) * 128
    valid = np.where(blocks < num_segments, blocks, -1)
    ends = valid.max(axis=1)
    span = int((ends - starts).max()) + 1
    return max(128, -(-span // 128) * 128)


def sorted_window_ok(
    rows: np.ndarray, num_segments: int, window: int = WINDOW
) -> bool:
    """Host-side check of the kernel's window contract at ``window``."""
    req = required_window(rows, num_segments)
    return req is not None and req <= window


def _make_kernel(window: int):
    def _kernel(starts_ref, data_ref, rows_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        w0 = starts_ref[i]
        rows = rows_ref[i]  # [BE]
        data = data_ref[...]  # [BE, F]
        local = rows - w0
        iota_w = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_EDGES, window), 1
        )
        # fp32-faithful in 3 bf16 MXU passes: the one-hot is exact in
        # bf16, and the data splits into three bf16 terms (8 mantissa
        # bits each) summing back to fp32 — half the passes of
        # Precision.HIGHEST, which would split BOTH operands
        oh = (local[:, None] == iota_w).astype(jnp.bfloat16)  # [BE, W]
        h1 = data.astype(jnp.bfloat16)
        r1 = data - h1.astype(jnp.float32)
        h2 = r1.astype(jnp.bfloat16)
        h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
        partial = sum(
            jax.lax.dot_general(
                oh,
                h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in (h1, h2, h3)
        )  # [W, F]
        w0a = pl.multiple_of(w0, 128)
        out_ref[pl.ds(w0a, window), :] += partial

    return _kernel


def _pallas_sorted_segment_sum(
    data: jax.Array,
    rows: jax.Array,
    num_segments: int,
    interpret: bool = False,
    window: int = WINDOW,
) -> jax.Array:
    e, f = data.shape
    nb = -(-e // BLOCK_EDGES)
    e_pad = nb * BLOCK_EDGES
    if e_pad != e:
        data = jnp.pad(data, ((0, e_pad - e), (0, 0)))
        rows = jnp.pad(rows, (0, e_pad - e), constant_values=num_segments)
    rows = rows.astype(jnp.int32).reshape(nb, BLOCK_EDGES)
    # window starts, 128-aligned; clamped so w0 + window stays in bounds
    n_out = num_segments + window
    starts = jnp.minimum(
        (rows[:, 0] // 128) * 128, jnp.int32(n_out - window)
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_EDGES, f), lambda i, s: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rows whole [nb, BE]
        ],
        out_specs=pl.BlockSpec(
            (n_out, f), lambda i, s: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _make_kernel(window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, f), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * window * f,
            bytes_accessed=e_pad * (f * 4 + 4) + n_out * f * 4,
            transcendentals=0,
        ),
    )(starts, data.astype(jnp.float32), rows)
    return out[:num_segments]


def pallas_sorted_available(
    e: int,
    f: int,
    num_segments: int,
    backend: "str | None" = None,
    window: int = WINDOW,
) -> bool:
    """True when the TPU kernel applies: TPU backend and the VMEM
    accumulator fits."""
    try:
        b = backend or jax.default_backend()
    except Exception:
        return False
    if b not in ("tpu", "axon"):
        return False
    return (num_segments + window) * max(f, 1) * 4 <= _VMEM_ACCUM_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_segment_sum(
    data: jax.Array,
    rows: jax.Array,
    num_segments: int,
    interpret: bool = False,
    window: int = WINDOW,
) -> jax.Array:
    """segment_sum(data, rows) for nondecreasing rows; padding rows
    (== num_segments, or anything >= it) drop out. [E,F] -> [N,F].
    ``window`` must satisfy the contract (`sorted_window_ok`); the
    loader picks the tightest one per batch (`required_window`)."""
    return _pallas_sorted_segment_sum(
        data, rows, num_segments, interpret, window
    )


def _fwd(data, rows, num_segments, interpret, window):
    return (
        sorted_segment_sum(data, rows, num_segments, interpret, window),
        rows,
    )


def _bwd(num_segments, interpret, window, rows, grad):
    safe = jnp.minimum(rows, num_segments - 1)
    g = jnp.take(grad, safe, axis=0)
    g = jnp.where((rows < num_segments)[:, None], g, 0.0)
    return (g, None)


sorted_segment_sum.defvjp(_fwd, _bwd)

__all__ = [
    "BLOCK_EDGES",
    "WINDOW",
    "required_window",
    "sorted_segment_sum",
    "sorted_window_ok",
    "pallas_sorted_available",
]
