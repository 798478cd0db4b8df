"""Pallas TPU kernel: segment-sum over row-sorted edges.

This is the sparse-layout hot path of every conv layer (reference hot
loop `ginet.py:57-71`: gather -> GEMM -> scatter_sum). XLA lowers an
unsorted scatter-add on TPU to a serialized update loop; with the rows
SORTED (the loader sorts each graph's doubled edges by source node —
see `data/dataset.py`; concatenation with offsets keeps the batch
globally sorted) the scatter becomes a *windowed one-hot contraction*
that runs on the MXU:

    for each block of BE edges (grid step, sequential):
        w0   = block's first row, aligned down to the sublane tile (8)
        oh   = (rows - w0 == iota_W)        # [BE, W] one-hot in VMEM
        out[w0 : w0+W] += oh^T @ data       # MXU contraction

The full output accumulator lives in VMEM across grid steps (constant
output index map). Window width W = BE + ALIGN covers every row a block
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

BLOCK_EDGES = 4096
# Window starts align to the fp32 SUBLANE tile (8 rows) — the window
# slices the accumulator's second-minor axis, whose hardware granule is
# 8, not 128. Round-4 used 128-alignment, which inflated the typical
# per-block row span to 256 and with it the one-hot contraction's MXU
# work by ~4x.
ALIGN = 8
WINDOW = BLOCK_EDGES + ALIGN  # worst case: aligned start + block span
# VMEM budget for the kernel's resident state (accumulator + rows +
# one-hot temporaries). v5e has 128 MiB of VMEM; Mosaic's default
# scoped limit is 16 MiB, so the pallas_calls raise it explicitly.
_VMEM_ACCUM_BYTES = 64 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def required_window(rows: np.ndarray, num_segments: int):
    """Host-side: the smallest window (multiple of ALIGN) satisfying
    the kernel contract for these sorted rows — within every
    BLOCK_EDGES-aligned block, all valid rows fit in
    [align(first_row), align(first_row) + W). Returns None for
    unsorted rows.

    The kernel's MXU work is proportional to W, so a tight window is a
    direct speedup: real graph batches advance ~1 row per `degree`
    edges, so their span per 512-edge block is ~512/degree + 7 —
    typically 48-64 instead of the worst-case 520."""
    e = len(rows)
    if e == 0:
        return ALIGN
    if (np.diff(rows) < 0).any():
        return None
    nb = -(-e // BLOCK_EDGES)
    padded = np.full(nb * BLOCK_EDGES, num_segments, dtype=np.int64)
    padded[:e] = rows
    blocks = padded.reshape(nb, BLOCK_EDGES)
    starts = (blocks[:, 0] // ALIGN) * ALIGN
    valid = np.where(blocks < num_segments, blocks, -1)
    ends = valid.max(axis=1)
    span = int((ends - starts).max()) + 1
    return max(ALIGN, -(-span // ALIGN) * ALIGN)


def sorted_window_ok(
    rows: np.ndarray, num_segments: int, window: int = WINDOW
) -> bool:
    """Host-side check of the kernel's window contract at ``window``."""
    req = required_window(rows, num_segments)
    return req is not None and req <= window


def _split3_cat(v):
    """fp32 [*, F] -> bf16 [*, 3F]: three 8-mantissa-bit terms whose
    fp32 sum reproduces v exactly, CONCATENATED along lanes so ONE MXU
    pass carries all three (an N<=128 contraction costs the same MXU
    cycles at N=3F as at N=F — round 4 spent 3 separate passes)."""
    h1 = v.astype(jnp.bfloat16)
    r1 = v - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([h1, h2, h3], axis=-1)


def _sum3(z3, f: int):
    """[*, 3F] fp32 partials -> [*, F] exact sum."""
    return z3[..., :f] + z3[..., f : 2 * f] + z3[..., 2 * f :]


def _scatter_one(starts_ref, rows_ref, data, out_ref, window: int, b):
    """Accumulate one 512-edge block's windowed one-hot contraction."""
    f = data.shape[-1]
    w0 = starts_ref[b]
    rows = rows_ref[b]  # [BE]
    local = rows - w0
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_EDGES, window), 1)
    # fp32-faithful single bf16 MXU pass: the one-hot is exact in
    # bf16, and the data splits into three lane-concatenated bf16
    # terms summing back to fp32 (`_split3_cat`)
    oh = (local[:, None] == iota_w).astype(jnp.bfloat16)  # [BE, W]
    z3 = jax.lax.dot_general(
        oh,
        _split3_cat(data),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [W, 3F]
    w0a = pl.multiple_of(w0, ALIGN)
    out_ref[pl.ds(w0a, window), :] += _sum3(z3, f)


def _gather_one(starts_ref, rows_ref, out_ref, window: int, b, num_segments):
    """One block's dual contraction: ``out[rows]`` as oh @ window."""
    w0 = starts_ref[b]
    rows = rows_ref[b]
    local = rows - w0
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_EDGES, window), 1)
    oh = (local[:, None] == iota_w).astype(jnp.bfloat16)
    w0a = pl.multiple_of(w0, ALIGN)
    win = out_ref[pl.ds(w0a, window), :]  # [W, F] fp32, final
    f = win.shape[-1]
    d3 = jax.lax.dot_general(
        oh,
        _split3_cat(win),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BE, 3F]
    # padding rows (>= num_segments) must read 0, not the slack rows
    # their one-hot may select. (Mask built from the i32 operand:
    # Mosaic can't insert a minor dim on i1 vectors.)
    return jnp.where(rows[:, None] < num_segments, _sum3(d3, f), 0.0)


def _make_kernel(window: int):
    def _kernel(starts_ref, data_ref, rows_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        _scatter_one(starts_ref, rows_ref, data_ref[...], out_ref, window, i)

    return _kernel


def _pad_blocks(data, rows, num_segments):
    """Pad edges to a BLOCK_EDGES multiple; padding rows
    (== num_segments) one-hot to nothing or land in the sliced-off
    slack rows."""
    e, f = data.shape
    nb = -(-e // BLOCK_EDGES)
    e_pad = nb * BLOCK_EDGES
    if e_pad != e:
        data = jnp.pad(data, ((0, e_pad - e), (0, 0)))
        rows = jnp.pad(rows, (0, e_pad - e), constant_values=num_segments)
    return data, rows.astype(jnp.int32).reshape(nb, BLOCK_EDGES)


def _block_starts(rows, n_out, window):
    # window starts, sublane-aligned; clamped so w0+window stays in bounds
    return jnp.minimum(
        (rows[:, 0] // ALIGN) * ALIGN, jnp.int32(n_out - window)
    ).astype(jnp.int32)


def _pallas_sorted_segment_sum(
    data: jax.Array,
    rows: jax.Array,
    num_segments: int,
    interpret: bool = False,
    window: int = WINDOW,
) -> jax.Array:
    e, f = data.shape
    data, rows = _pad_blocks(data, rows, num_segments)
    e_pad = data.shape[0]
    nb = e_pad // BLOCK_EDGES
    n_out = num_segments + window
    starts = _block_starts(rows, n_out, window)

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
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * window * 3 * f,
            bytes_accessed=e_pad * (f * 4 + 4) + n_out * f * 4,
            transcendentals=0,
        ),
    )(starts, data.astype(jnp.float32), rows)
    return out[:num_segments]


def _make_fused_kernel(window: int, nb: int, num_segments: int):
    """Scatter + sorted gather-back in ONE kernel (VERDICT r4 item 1).

    Grid = 2*nb sequential steps. Steps [0, nb): the windowed one-hot
    scatter of `_make_kernel`, accumulating into a VMEM-resident
    ``out``. Steps [nb, 2*nb): the DUAL contraction — for edge block j,
    ``d2 = oh @ out[w0 : w0+W]`` ([BE, W] @ [W, F] on the MXU) — which
    is exactly ``out[rows]`` for sorted rows under the same window
    contract. ``out`` never round-trips through HBM between the two
    phases, and the gather-back stops being a random-access XLA gather
    (the op that ate ~90% of the round-4 micro-arm's iteration): HBM
    traffic is read-data + write-out + write-d2, each touched once.

    Exactness: the one-hot is exact in bf16; fp32 operand values split
    into three bf16 terms (8 mantissa bits each) whose partial products
    accumulate in fp32 — both contractions reproduce the fp32 result
    bitwise (same 3-pass scheme as `_make_kernel`).
    """

    def _kernel(starts_ref, data_ref, rows_ref, out_ref, d2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        j = jax.lax.rem(i, nb)

        @pl.when(i < nb)
        def _scatter():
            _scatter_one(
                starts_ref, rows_ref, data_ref[...], out_ref, window, j
            )

        @pl.when(i >= nb)
        def _gather():
            d2_ref[...] = _gather_one(
                starts_ref, rows_ref, out_ref, window, j, num_segments
            )

    return _kernel


def _pallas_sorted_scatter_gather(
    data: jax.Array,
    rows: jax.Array,
    num_segments: int,
    interpret: bool = False,
    window: int = WINDOW,
):
    e, f = data.shape
    data, rows = _pad_blocks(data, rows, num_segments)
    e_pad = data.shape[0]
    nb = e_pad // BLOCK_EDGES
    n_out = num_segments + window
    starts = _block_starts(rows, n_out, window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2 * nb,),
        in_specs=[
            # during the gather phase stay on the last block: no DMA
            pl.BlockSpec(
                (BLOCK_EDGES, f),
                lambda i, s: (jax.lax.min(i, nb - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rows whole [nb, BE]
        ],
        out_specs=[
            pl.BlockSpec(
                (n_out, f), lambda i, s: (0, 0), memory_space=pltpu.VMEM
            ),
            # scatter phase parks on block 0; the gather phase revisits
            # and overwrites it before the first flush
            pl.BlockSpec(
                (BLOCK_EDGES, f),
                lambda i, s: (jax.lax.max(i - nb, 0), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    out, d2 = pl.pallas_call(
        _make_fused_kernel(window, nb, num_segments),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_out, f), jnp.float32),
            jax.ShapeDtypeStruct((e_pad, f), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 3 * e_pad * window * f,
            bytes_accessed=e_pad * (2 * f * 4 + 4) + n_out * f * 4,
            transcendentals=0,
        ),
    )(starts, data.astype(jnp.float32), rows)
    return out[:num_segments], d2[:e]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_scatter_gather(
    data: jax.Array,
    rows: jax.Array,
    num_segments: int,
    interpret: bool = False,
    window: int = WINDOW,
):
    """Fused ``(segment_sum(data, rows), segment_sum(data, rows)[rows])``
    for nondecreasing rows; padding rows (>= num_segments) contribute
    nothing and gather back 0. [E,F] -> ([N,F], [E,F]).

    The sparse hot loop's scatter -> gather round trip (reference
    `ginet.py:69-71` aggregate + next layer's re-gather) as ONE Pallas
    kernel with the accumulator VMEM-resident throughout; see
    `_make_fused_kernel`.
    """
    return _pallas_sorted_scatter_gather(
        data, rows, num_segments, interpret, window
    )


def _sg_fwd(data, rows, num_segments, interpret, window):
    return (
        sorted_scatter_gather(data, rows, num_segments, interpret, window),
        rows,
    )


def _sg_bwd(num_segments, interpret, window, rows, cots):
    g_out, g_d2 = cots
    # d2 = out[rows]  =>  dout = out-cot + scatter of the d2-cot;
    # out = segsum(data) =>  ddata = dout[rows] (padding masked)
    dout = g_out + _pallas_sorted_segment_sum(
        g_d2, rows, num_segments, interpret, window
    )
    safe = jnp.minimum(rows, num_segments - 1)
    g = jnp.take(dout, safe, axis=0)
    g = jnp.where((rows < num_segments)[:, None], g, 0.0)
    return (g, None)


sorted_scatter_gather.defvjp(_sg_fwd, _sg_bwd)


def pallas_fused_available(
    e: int,
    f: int,
    num_segments: int,
    backend: "str | None" = None,
    window: int = WINDOW,
) -> bool:
    """True when the fused scatter+gather kernel applies: TPU backend
    and accumulator + whole rows array fit the VMEM budget."""
    try:
        b = backend or jax.default_backend()
    except Exception:
        return False
    if b not in ("tpu", "axon"):
        return False
    nb = -(-e // BLOCK_EDGES)
    vmem = (num_segments + window) * max(f, 1) * 4 + nb * BLOCK_EDGES * 4
    return vmem <= _VMEM_ACCUM_BYTES


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
    "sorted_scatter_gather",
    "sorted_window_ok",
    "pallas_sorted_available",
    "pallas_fused_available",
]
