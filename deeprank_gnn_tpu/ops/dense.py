"""Dense (per-graph) aggregation ops: message passing on the MXU.

Operates on `DenseGraphBatch` arrays ([G, Eg] edges into [G, S] node
slots). Edge->node aggregation is a batched one-hot contraction —
`einsum('gef,ges->gsf')` — which XLA lowers to MXU matmuls; sentinel
indices (== S) produce an all-zero one-hot row and drop out, so no
masking pass is needed. Max-pooling (few rows, node-sized not
edge-sized) stays a segment reduction on flattened ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gather_nodes(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x [G,S,F] gathered by idx [G,E] -> [G,E,F]; sentinel clamps to
    the last row (callers' aggregations drop those lanes)."""
    s = x.shape[1]
    safe = jnp.clip(idx, 0, s - 1)
    return jnp.take_along_axis(x, safe[..., None], axis=1)


def _one_hot(idx: jax.Array, size: int, dtype) -> jax.Array:
    """[G,E] -> [G,E,size]; sentinel rows are all-zero."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    return (idx[..., None] == iota).astype(dtype)


def edge_sum_to_slots(values: jax.Array, idx: jax.Array, size: int) -> jax.Array:
    """Sum edge values [G,E,F] into slots by idx [G,E] -> [G,size,F].
    The MXU replacement for scatter-add."""
    oh = _one_hot(idx, size, values.dtype)
    return jnp.einsum(
        "ges,gef->gsf", oh, values, preferred_element_type=values.dtype
    )


def edge_count_to_slots(idx: jax.Array, size: int, dtype=jnp.float32) -> jax.Array:
    oh = _one_hot(idx, size, dtype)
    return oh.sum(axis=1)  # [G, size]


def edge_mean_to_slots(values: jax.Array, idx: jax.Array, size: int) -> jax.Array:
    total = edge_sum_to_slots(values, idx, size)
    count = edge_count_to_slots(idx, size, values.dtype)
    return total / jnp.maximum(count, 1.0)[..., None]


# virtual-working-set ceiling for the broadcast form of slot_max_pool:
# [G, size, S, F] fp32 intermediates. On TPU the where-broadcast FUSES
# into the reduce (nothing materializes; the cost is G*size*S*F VPU
# select/max lanes), so the ceiling is a compute bound, not memory —
# at atomic-graph scale (S~2.5k, size~650) the fused pool still beats
# the unsorted-scatter fallback by orders of magnitude because XLA
# serializes unsorted scatter on TPU. CPU materializes more of the
# broadcast, so it keeps the conservative cap.
_BCAST_POOL_BYTES = 256 * 1024 * 1024
_BCAST_POOL_BYTES_TPU = 16 * 1024 * 1024 * 1024


def _bcast_pool_cap() -> int:
    try:
        b = jax.default_backend()
    except Exception:
        b = "cpu"
    return _BCAST_POOL_BYTES_TPU if b in ("tpu", "axon") else _BCAST_POOL_BYTES


def slot_max_pool(h: jax.Array, assign: jax.Array, size: int) -> jax.Array:
    """Max-pool [G,S,F] rows into [G,size,F] by assign [G,S]; empty
    slots give 0 (torch-scatter zero-buffer semantics).

    Per-graph cluster counts are tiny (tens), so the pool is a masked
    max over a broadcast [G, size, S, F] — scatter-free in BOTH
    directions (the max's backward is an equality select), ~10x the
    XLA segment_max scatter on TPU. Falls back to segment_max when the
    broadcast working set would be unreasonable."""
    g, s, f = h.shape
    if g * size * s * f * 4 <= _bcast_pool_cap():
        iota_c = jnp.arange(size, dtype=jnp.int32)[None, :, None]  # [1,C,1]
        member = assign[:, None, :] == iota_c  # [G,C,S]
        vals = jnp.where(member[..., None], h[:, None, :, :], -jnp.inf)
        out = vals.max(axis=2)  # [G,C,F]
        empty = ~member.any(axis=2)  # [G,C] — pad slots give 0
        return jnp.where(empty[..., None], 0.0, out)
    gid = jnp.arange(g, dtype=jnp.int32)[:, None]
    flat_ids = jnp.where(
        (assign >= 0) & (assign < size), assign + gid * size, g * size
    ).reshape(-1)
    flat = h.reshape(g * s, f)
    out = jax.ops.segment_max(
        flat, flat_ids, num_segments=g * size + 1, indices_are_sorted=False
    )[: g * size]
    count = jax.ops.segment_sum(
        jnp.ones((g * s,), h.dtype), flat_ids, num_segments=g * size + 1
    )[: g * size]
    out = jnp.where(count[:, None] > 0, out, 0.0)
    return out.reshape(g, size, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def member_max_pool(
    h: jax.Array, mem_idx: jax.Array, assign: jax.Array
) -> jax.Array:
    """Max-pool [G,S,F] rows into [G,C,F] via the precomputed member
    table ``mem_idx`` [G,C,M] (pad sentinel == S); empty slots give 0
    (torch-scatter zero-buffer semantics).

    The gather touches only C*M rows — versus the C*S select/max lanes
    of the broadcast pool — which is what makes pooling cheap at
    atomic-graph scale (M = max cluster size, tens; S = thousands).
    The backward routes each slot's cotangent to its maxima THROUGH
    ``assign`` (the inverse of the member table): a plain gather, no
    scatter anywhere; ties split evenly, matching the broadcast pool's
    reduce-max gradient.

    Every gather is a FLAT row gather (``jnp.take`` over a [G*S, F]
    view with a trailing sentinel row) — XLA lowers those to fast
    vectorized row loads on TPU, where the equivalent
    ``take_along_axis`` with a broadcast index degenerates to
    element-wise gathering (~6x slower measured at atomic scale).
    """
    return _member_max_fwd_only(h, mem_idx)


def _flat_rows(x: jax.Array, pad_value: float) -> jax.Array:
    """[G,S,F] -> [G*S + 1, F] with a trailing sentinel row."""
    g, s, f = x.shape
    return jnp.concatenate(
        [x.reshape(g * s, f), jnp.full((1, f), pad_value, x.dtype)], axis=0
    )


def _flat_idx(idx: jax.Array, bound: int, size: int) -> jax.Array:
    """Per-graph indices [G, ...] (pad sentinel == bound) -> flat row
    ids into the [G*bound + 1]-row view (pad -> the sentinel row)."""
    g = idx.shape[0]
    goff = jnp.arange(g, dtype=idx.dtype).reshape((g,) + (1,) * (idx.ndim - 1))
    return jnp.where(idx < bound, idx + goff * bound, g * bound).reshape(-1)


# Row-count ceiling for one member-gather's SOURCE: random 128-byte
# row loads from a slab this size still run near bandwidth (the slab
# stays cacheable/VMEM-resident); a 4x larger source measured ~7x
# slower per row at G=128 (HBM random access). The forward therefore
# gathers in graph chunks whose [gc*S, F] source stays under this.
_POOL_SOURCE_ROWS = 96 * 1024


def _member_max_chunk(h, mem_idx):
    g, s, f = h.shape
    c, m = mem_idx.shape[1], mem_idx.shape[2]
    vals = jnp.take(
        _flat_rows(h, -jnp.inf), _flat_idx(mem_idx, s, s), axis=0
    ).reshape(g, c, m, f)
    out = vals.max(axis=2)
    counts = (vals == out[:, :, None, :]).astype(h.dtype).sum(axis=2)
    return out, counts


def _member_max_core(h, mem_idx):
    g, s, f = h.shape
    valid = mem_idx < s  # [G,C,M]
    gc = max(1, _POOL_SOURCE_ROWS // max(s, 1))
    if g <= gc:
        out, counts = _member_max_chunk(h, mem_idx)
    else:
        outs, cnts = [], []
        for k in range(0, g, gc):
            o, ct = _member_max_chunk(h[k : k + gc], mem_idx[k : k + gc])
            outs.append(o)
            cnts.append(ct)
        out = jnp.concatenate(outs, axis=0)
        counts = jnp.concatenate(cnts, axis=0)
    # tie counts while the member values are at hand (the backward's
    # even split needs them; computing in the forward avoids
    # re-gathering the C*M member rows on the way back)
    empty = ~valid.any(axis=2)
    out = jnp.where(empty[..., None], 0.0, out)
    return out, counts


def _member_max_fwd_only(h, mem_idx):
    return _member_max_core(h, mem_idx)[0]


def _member_max_fwd(h, mem_idx, assign):
    out, counts = _member_max_core(h, mem_idx)
    return out, (h, mem_idx, assign, out, counts)


def _member_max_bwd(res, cot):
    h, mem_idx, assign, out, counts_c = res
    g, s, f = h.shape
    c = mem_idx.shape[1]
    aidx = _flat_idx(assign, c, c)  # [G*S] rows into [G*C + 1]
    own_max = jnp.take(_flat_rows(out, jnp.inf), aidx, axis=0).reshape(
        g, s, f
    )
    is_max = h == own_max  # padding nodes gather inf -> False
    counts = jnp.take(
        _flat_rows(counts_c, 1.0), aidx, axis=0
    ).reshape(g, s, f)
    cot_n = jnp.take(_flat_rows(cot, 0.0), aidx, axis=0).reshape(g, s, f)
    dh = jnp.where(is_max, cot_n / jnp.maximum(counts, 1.0), 0.0)
    return dh, jnp.zeros_like(mem_idx), jnp.zeros_like(assign)


member_max_pool.defvjp(_member_max_fwd, _member_max_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def member_max_partial(
    h: jax.Array, mem_idx: jax.Array, assign: jax.Array
) -> jax.Array:
    """:func:`member_max_pool` WITHOUT the empty-slot zero fill: empty
    slots stay -inf, so per-shard partial maxes combine correctly
    across shards (the halo layout's cross-shard pooling;
    `parallel/halo.py cross_shard_max_pool`)."""
    g, s, f = h.shape
    vals = jnp.take(
        _flat_rows(h, -jnp.inf), _flat_idx(mem_idx, s, s), axis=0
    ).reshape(g, mem_idx.shape[1], mem_idx.shape[2], f)
    return vals.max(axis=2)


def _member_partial_fwd(h, mem_idx, assign):
    g, s, f = h.shape
    vals = jnp.take(
        _flat_rows(h, -jnp.inf), _flat_idx(mem_idx, s, s), axis=0
    ).reshape(g, mem_idx.shape[1], mem_idx.shape[2], f)
    out = vals.max(axis=2)
    counts = (vals == out[:, :, None, :]).astype(h.dtype).sum(axis=2)
    return out, (h, mem_idx, assign, out, counts)


member_max_partial.defvjp(_member_partial_fwd, _member_max_bwd)


def member_counts(mem_idx: jax.Array, src_len: int) -> jax.Array:
    """Valid-member count per slot straight from the table (the
    scatter-free replacement for segment_count). [.., C, M] -> [.., C]."""
    return (mem_idx < src_len).sum(axis=-1).astype(jnp.float32)


# Below this virtual broadcast size the fused select/max pool wins:
# small batches are LATENCY-bound (few fused ops beat several gather
# dispatches); above it the broadcast's C*S lane work dominates and the
# member-table gathers win (measured crossover on v5e: fixture-scale
# scanned epochs ~20% faster on broadcast, atomic-scale steps ~2.3x
# faster on member gathers).
_MEMBER_POOL_MIN_BYTES = 64 * 1024 * 1024


# Run-padded layout tile width: every level-0 cluster's contiguous row
# run is padded to a multiple of this at collate (the fp32 sublane
# tile), so tile t covers rows [8t, 8t+8) of exactly one cluster.
TILE_R = 8


def _tiles_to_clusters_sum(a_t: jax.Array, tile_mem: jax.Array):
    """[G, F, T] tile values -> [G, C, F] per-cluster SUM over the tile
    member table (tiny gathers: MT tiles per cluster)."""
    tl = jnp.swapaxes(a_t, 1, 2)  # [G, T, F]
    g, t, f = tl.shape
    vals = jnp.take(
        _flat_rows(tl, 0.0), _flat_idx(tile_mem, t, t), axis=0
    ).reshape(g, tile_mem.shape[1], tile_mem.shape[2], f)
    return vals.sum(axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def tiled_cluster_max_pool(
    h_fm: jax.Array,
    node_mask_fm: jax.Array,
    tile_mem: jax.Array,
    tile_assign: jax.Array,
) -> jax.Array:
    """Cluster max-pool of a STRIPED feature-major activation
    [G, F, R, T] on the run-padded layout -> [G, C, F] (node-major,
    ready for the small cluster-level convs). ``node_mask_fm`` is
    [G, R, T] (member-slot r of tile t).

    The striped 4-D shape is the whole trick: tiles live on the LANE
    axis (T, a 128-padded dimension) and a tile's 8 member slots on the
    adjacent axis, so the within-tile max is a plain axis-2 reduce and
    every tile->node broadcast in the backward is a free
    ``[:, :, None, :]`` — no reduce_window (whose adjoint lowers to
    slow select-and-scatter), no lane-granular repeats (which
    materialize minor-8 arrays at 16x layout padding). Stage 2 is the
    member-table pool over TILES (T rows instead of C*M node rows).

    Forward semantics match :func:`slot_max_pool` exactly (empty
    pad-cluster slots give 0); the backward routes each cluster's
    cotangent to ALL its argmax nodes with an even tie split — the
    same rule as `member_max_pool` / the broadcast pool.
    """
    vals = jnp.where(node_mask_fm[:, None], h_fm, -jnp.inf)
    tiles = vals.max(axis=2)  # [G, F, T]
    tl = jnp.swapaxes(tiles, 1, 2)  # [G, T, F]
    return member_max_pool(tl, tile_mem, tile_assign)


def _tiled_pool_fwd(h_fm, node_mask_fm, tile_mem, tile_assign):
    out = tiled_cluster_max_pool(h_fm, node_mask_fm, tile_mem, tile_assign)
    return out, (h_fm, node_mask_fm, tile_mem, tile_assign, out)


def _clusters_to_tiles(a_c: jax.Array, tile_assign: jax.Array, pad: float):
    """[G, C, F] cluster values -> [G, F, T] at each tile via
    ``tile_assign`` — a flat ROW gather over the small [G*C+1, F] view
    (vectorized row loads; a lane-axis take_along_axis here scalarizes
    on TPU, measured ~50x slower) followed by a small transpose."""
    g, c, f = a_c.shape
    t = tile_assign.shape[1]
    rows = jnp.take(
        _flat_rows(a_c, pad), _flat_idx(tile_assign, c, c), axis=0
    ).reshape(g, t, f)
    return jnp.swapaxes(rows, 1, 2)  # [G, F, T]


def _tiled_pool_bwd(res, cot):
    h_fm, node_mask_fm, tile_mem, tile_assign, hp = res
    # cluster max / cotangent at each TILE; pad tiles read +inf / 0
    # via the flat-gather sentinel row
    cmax_t = _clusters_to_tiles(hp, tile_assign, jnp.inf)  # [G, F, T]
    cot_t = _clusters_to_tiles(cot, tile_assign, 0.0)
    vals = jnp.where(node_mask_fm[:, None], h_fm, -jnp.inf)
    is_max = vals == cmax_t[:, :, None, :]  # [G, F, R, T]
    # global even tie split: count argmax nodes per cluster
    eq_t = is_max.astype(h_fm.dtype).sum(axis=2)  # [G, F, T]
    cnt_c = _tiles_to_clusters_sum(eq_t, tile_mem)  # [G, C, F]
    cnt_t = _clusters_to_tiles(cnt_c, tile_assign, 1.0)
    dh = jnp.where(
        is_max,
        (cot_t / jnp.maximum(cnt_t, 1.0))[:, :, None, :],
        0.0,
    )
    return (
        dh,
        jnp.zeros_like(node_mask_fm),
        jnp.zeros_like(tile_mem),
        jnp.zeros_like(tile_assign),
    )


tiled_cluster_max_pool.defvjp(_tiled_pool_fwd, _tiled_pool_bwd)


def cluster_max_pool(
    h: jax.Array,
    assign: jax.Array,
    size: int,
    mem_idx=None,
) -> jax.Array:
    """Cluster max-pool dispatch: the member-table gather form when the
    batch carries a table (`collate_dense(precompute_ops=True)`) AND
    the pool is big enough to be lane-bound, else the
    broadcast/segment fallback (:func:`slot_max_pool`)."""
    g, s, f = h.shape
    if mem_idx is not None and g * size * s * f * 4 > _MEMBER_POOL_MIN_BYTES:
        return member_max_pool(h, mem_idx, assign)
    return slot_max_pool(h, assign, size)


def dense_segment_softmax(
    logits: jax.Array, idx: jax.Array, size: int
) -> jax.Array:
    """Per-slot softmax of edge logits [G,E] grouped by idx [G,E]
    (sentinel == size drops out) -> [G,E] weights. The dense analog of
    `ops.segment.segment_softmax` (reference
    `community_pooling.py:161-180` attention semantics): max-shifted,
    scatter-free (broadcast max + one-hot sum)."""
    g, e = logits.shape
    valid = idx < size  # [G,E]
    iota_c = jnp.arange(size, dtype=jnp.int32)[None, None, :]
    member = (idx[..., None] == iota_c) & valid[..., None]  # [G,E,C]
    vals = jnp.where(member, logits[..., None], -jnp.inf)
    slot_max = vals.max(axis=1)  # [G,C]
    slot_max = jnp.where(jnp.isfinite(slot_max), slot_max, 0.0)
    safe = jnp.clip(idx, 0, size - 1)
    # sanitize BEFORE exp: where()'s backward evaluates the taken-out
    # branch too, and exp(huge pad logit) = inf turns the zero cotangent
    # into inf*0 = NaN
    shifted = jnp.where(valid, logits - jnp.take_along_axis(slot_max, safe, axis=1), 0.0)
    expv = jnp.where(valid, jnp.exp(shifted), 0.0)  # [G,E]
    denom = edge_sum_to_slots(expv[..., None], idx, size)[..., 0]  # [G,C]
    # empty slots divide by 1 (NOT a tiny epsilon: the division's
    # BACKWARD squares the denominator, and eps^2 underflows fp32 to
    # zero -> 0/0 NaN; every populated slot has denom >= exp(0) = 1
    # anyway thanks to the max shift)
    denom = jnp.where(denom > 0, denom, 1.0)
    return expv / jnp.take_along_axis(denom, safe, axis=1)


def masked_mean(h: jax.Array, mask: jax.Array) -> jax.Array:
    """[G,S,F] mean over valid S rows -> [G,F]."""
    m = mask.astype(h.dtype)[..., None]
    return (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


# ---------------------------------------------------------------------------
# precomputed-operator aggregation
#
# Per-graph message passing is a LINEAR operator on node features:
# ``z[n] = sum_{e: row[e]==n} v[col[e]] = (P @ v)[n]`` with
# ``P[n, m] = multiplicity of edge n<-m``. P depends only on the batch
# structure — never on parameters — so the collator precomputes it (or
# its action on the raw features) once per graph and the training step
# applies it as a plain MXU matmul: no one-hot builds, no [E, S]
# incidence, no edge-axis contraction in the step at all. For the tiny
# pooled level (tens of clusters) P itself is stored ([C0, C0]); for
# the node level only ``P @ x`` is stored (same bytes as ``x``) because
# the first conv is ``relu(P (x W)) = relu((P x) W)``.


def _adj_contract(adj: jax.Array, v: jax.Array, exact: bool) -> jax.Array:
    """``adj [G,S,S] @ v [G,S,F] -> [G,S,F]`` on the MXU.

    ``exact=True`` reproduces the fp32 contraction bit-faithfully in a
    SINGLE bf16 MXU pass: the adjacency entries are small non-negative
    integers (edge multiplicities — exact in bf16), and ``v`` splits
    into three bf16 terms (`ops.pallas._split3`) stacked along the
    feature axis, so one [S, 3F] contraction accumulates the exact fp32
    products.
    """
    from deeprank_gnn_tpu.ops.pallas import _split3

    if not exact:
        return jax.lax.dot_general(
            adj.astype(v.dtype),
            v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=v.dtype,
        )
    f = v.shape[-1]
    cat = jnp.concatenate(_split3(v), axis=-1)  # [G, S, 3F] bf16
    z3 = jax.lax.dot_general(
        adj.astype(jnp.bfloat16),
        cat,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return z3[..., :f] + z3[..., f : 2 * f] + z3[..., 2 * f :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def adj_conv(v: jax.Array, adj: jax.Array, exact: bool = True) -> jax.Array:
    """Aggregation by a precomputed adjacency operator: ``adj @ v``.

    The custom VJP keeps the backward the exact adjoint
    (``dv = adj^T @ g``) instead of autodiff through the bf16 split —
    one MXU pass each way."""
    return _adj_contract(adj, v, exact)


def _adj_conv_fwd(v, adj, exact):
    return _adj_contract(adj, v, exact), adj


def _adj_conv_bwd(exact, adj, g):
    dv = _adj_contract(jnp.swapaxes(adj, 1, 2), g, exact)
    return dv, jnp.zeros_like(adj)


adj_conv.defvjp(_adj_conv_fwd, _adj_conv_bwd)
