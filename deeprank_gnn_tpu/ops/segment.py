"""Segment reductions with torch-scatter-compatible semantics.

The reference's models aggregate per-edge messages into per-node (or
per-cluster, or per-graph) buffers with torch_scatter's
`scatter_sum` / `scatter_mean` / `scatter_max` into zero-initialized
output buffers (reference `ginet.py:69-71`, `sGAT.py:79-81`,
`community_pooling.py:201,214`). The contract reproduced here:

- out-of-range / padding indices contribute nothing. Callers route
  padding lanes to index ``num_segments``; we reduce into
  ``num_segments + 1`` rows and slice the dump row off, which keeps the
  op fully static-shaped and portable (XLA drop semantics for OOB
  scatter are backend-dependent; an explicit dump row is not).
- ``segment_mean`` divides by ``max(count, 1)`` — empty segments give 0,
  matching torch_scatter's ``scatter_mean(..., out=zeros)`` clamp.
- ``segment_max`` returns 0 for empty segments (the zero-initialized
  ``out`` buffer of the reference), not -inf.

All ops are differentiable (they are compositions of gather/scatter-add
and elementwise math, so jax autodiff produces the exact vjps the
reference's autograd produces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dump_row(index: jax.Array, num_segments: int) -> jax.Array:
    """Clamp indices into [0, num_segments]; anything outside the valid
    range (padding convention: index == num_segments, or negative) lands
    in the dump row ``num_segments``."""
    return jnp.where(
        (index >= 0) & (index < num_segments), index, num_segments
    ).astype(jnp.int32)


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    sorted_ids: bool = False,
) -> jax.Array:
    """Sum of ``data`` rows per segment. [E, F] x [E] -> [S, F].

    Matches torch_scatter ``scatter_sum(src, index, dim=0, out=zeros)``
    (reference `ginet.py:69-71`).

    ``sorted_ids`` (truthy) asserts the caller's ids are nondecreasing
    with padding at the end (the loader's edge-sort guarantee) — on TPU
    the scatter then runs as the Pallas windowed one-hot MXU kernel
    (`ops/pallas/segment.py`) instead of XLA's serialized scatter-add.
    An INT value selects the kernel's window width (the loader computes
    the tightest contract-satisfying window per batch — the kernel's
    MXU work is proportional to it); ``True`` uses the worst-case
    default.
    """
    if sorted_ids and data.ndim == 2:
        from deeprank_gnn_tpu.ops.pallas.segment import (
            WINDOW,
            pallas_sorted_available,
            sorted_segment_sum,
        )

        window = (
            int(sorted_ids)
            if not isinstance(sorted_ids, bool)
            else WINDOW
        )
        if pallas_sorted_available(
            data.shape[0], data.shape[1], num_segments, window=window
        ):
            return sorted_segment_sum(
                data, segment_ids, num_segments, window=window
            )
    ids = _dump_row(segment_ids, num_segments)
    out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Number of entries per segment (padding excluded). [E] -> [S]."""
    ids = _dump_row(segment_ids, num_segments)
    ones = jnp.ones(segment_ids.shape[:1], dtype=jnp.float32)
    out = jax.ops.segment_sum(ones, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    nan_empty: bool = False,
    sorted_ids: bool = False,
) -> jax.Array:
    """Mean of ``data`` rows per segment.

    ``nan_empty=False`` (default) clamps the divisor to 1, so empty
    segments give 0 — torch_scatter ``scatter_mean(..., out=zeros)``
    semantics (reference `sGAT.py:79-81`, `ginet.py:133-134`).
    ``nan_empty=True`` reproduces ``torch.mean`` of an empty selection
    (NaN), the behavior of the reference FoutLayer's per-node loop
    (reference `foutnet.py:69-73`).
    """
    total = segment_sum(data, segment_ids, num_segments, sorted_ids=sorted_ids)
    count = segment_count(segment_ids, num_segments)
    count = count.reshape((num_segments,) + (1,) * (data.ndim - 1))
    if nan_empty:
        return total / count
    return total / jnp.maximum(count, 1.0)


def _segment_reduce_with_fill(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    reducer,
    identity: float,
    empty_value: float,
) -> jax.Array:
    ids = _dump_row(segment_ids, num_segments)
    out = reducer(data, ids, num_segments=num_segments + 1)[:num_segments]
    count = segment_count(segment_ids, num_segments)
    count = count.reshape((num_segments,) + (1,) * (data.ndim - 1))
    return jnp.where(count > 0, out, jnp.asarray(empty_value, data.dtype))


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Per-segment max; empty segments give 0 (the reference's
    zero-initialized scatter_max buffer, `community_pooling.py:201`)."""
    return _segment_reduce_with_fill(
        data, segment_ids, num_segments, jax.ops.segment_max, -jnp.inf, 0.0
    )


def segment_min(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Per-segment min; empty segments give 0."""
    return _segment_reduce_with_fill(
        data, segment_ids, num_segments, jax.ops.segment_min, jnp.inf, 0.0
    )


def segment_softmax(
    logits: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Numerically-stable softmax over entries sharing a segment id.

    Not used by the paper-parity GINet (whose softmax over a size-1 axis
    is identically 1, reference quirk `ginet.py:66`) but provided as the
    correct per-neighborhood attention primitive for the "fixed"
    attention mode of the model zoo.
    """
    seg_max = _segment_reduce_with_fill(
        logits, segment_ids, num_segments, jax.ops.segment_max, -jnp.inf, 0.0
    )
    ids = _dump_row(segment_ids, num_segments)
    shifted = logits - jnp.take(
        jnp.concatenate([seg_max, jnp.zeros_like(seg_max[:1])], axis=0), ids, axis=0
    )
    exp = jnp.exp(shifted)
    denom = segment_sum(exp, segment_ids, num_segments)
    denom = jnp.take(
        jnp.concatenate([denom, jnp.ones_like(denom[:1])], axis=0), ids, axis=0
    )
    return exp / jnp.maximum(denom, 1e-16)


def gather(data: jax.Array, index: jax.Array) -> jax.Array:
    """Row gather ``data[index]`` with padding-safe clamping.

    Padding indices (== data.shape[0] or negative) return row 0; callers
    mask the result. Clamping (instead of OOB UB) keeps TPU lowering
    simple and branch-free.
    """
    idx = jnp.clip(index, 0, data.shape[0] - 1)
    return jnp.take(data, idx, axis=0)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_sum_jit(data, segment_ids, num_segments):
    return segment_sum(data, segment_ids, num_segments)
