"""Device-resident graph store: zero steady-state host->device traffic.

The dense layout (`data/dense_batch.py`) gives every batch field a
leading graph axis, so a whole dataset collates into one
:class:`DenseGraphBatch` of ``[N + 1, ...]`` arrays (slot ``N`` is an
all-padding graph). Uploading that ONCE turns every epoch's batch
assembly into an on-device gather over the graph axis — a
``jnp.take`` the compiler fuses into the consuming step — instead of a
host collate + host->device transfer per batch.

Why this is the TPU-native ingest design: residue-interface datasets
are small relative to HBM (the 1ATN fixture is ~1 MB dense-padded; the
full 843-complex docking benchmark is a few GB), while the host link
is the slowest wire in the system (PCIe on real hardware; ~60 MB/s
through the development tunnel). The streaming loader
(`data/batch.py` + `data/prefetch.py`) remains the path for datasets
that exceed the byte budget, for the sparse layout and for multi-host
ingest.

The reference re-reads HDF5 and re-collates on the host every epoch
(`NeuralNet.py:490-493` via the PyG ``DataLoader``); it has no device
cache of any kind.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass, field, fields
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from deeprank_gnn_tpu.data.dense_batch import DenseGraphBatch, collate_dense

# collate granularity while building the store: bounds peak host memory
# at chunk_size * per-graph-padded bytes without per-graph call overhead
_CHUNK = 256


# ---------------------------------------------------------------------------
# packed representation
#
# The scanned train step's cost at residue-graph scale tracks the BYTES
# it moves, and the per-step batch gather is the biggest mover
# (scripts/ablate_precompute.py: the staged forward is flat regardless
# of compute; fusing all fields into one gather changes nothing — it's
# traffic-bound either way). Three consequences shape this layout:
#
# 1. Fields pack into a few [slots, W] int32 matrices so batch assembly
#    is a handful of row gathers; per-field views are static column
#    slices + bitcasts XLA fuses into the consumers.
# 2. Fields are SEGMENTED BY USE. The precomputed-operator training
#    step (models' dense op path) touches no raw edge arrays — and
#    GINet's not even x — so those live in segments of their own whose
#    gathers XLA dead-code-eliminates when the model never reads them:
#      opcore — operators + pooling plan + targets (every op-mode step)
#      x      — raw node features (FoutNet/sGAT op mode, fallbacks)
#      edges  — edge arrays (attention mode, one-hot fallback, sGAT)
# 3. Fields pack at HALFWORD (16-bit) granularity, losslessly by
#    default: index fields fit uint16 (per-graph capacities are
#    hundreds), bool masks are one halfword, and integer-valued float
#    operators (in-degrees, pooled adjacency multiplicities) store as
#    uint16 and widen for free in the fused unpack — so the gather
#    moves half the bytes for everything except raw fp32 payloads.
#    ``pack='bf16'`` additionally halves those payloads (x, edge_attr,
#    agg_x, ...) with ~3 decimal digits of precision — opt-in because
#    it is the one lossy knob in the store.

_SEGMENT_OF = {
    "deg0": "opcore", "adj1": "opcore",
    "assign0": "opcore", "pool0_mask": "opcore",
    "assign1": "opcore", "pool1_mask": "opcore",
    "mem0_idx": "opcore", "mem1_idx": "opcore",
    "y": "opcore", "y_mask": "opcore",
    # the two level-1 aggregation actions each get their OWN segment:
    # segments are the store's traffic granularity (a model gathers
    # whole segment rows), and a model reads exactly one of the two —
    # GINet's feature-major path reads opfm, everything else aggx
    "agg_x": "aggx",
    "agg_x_fm": "opfm", "node_mask_fm": "opfm",
    "tile_mem0": "opfm", "tile_assign0": "opfm",
    "x": "x",
    # node_mask gets its own (tiny) segment: the feature-major GINet
    # path needs it for tile masking but must NOT drag the raw-x
    # payload segment along (segments are the gather granularity)
    "node_mask": "nmask",
    "row": "edges", "col": "edges", "edge_attr": "edges",
    "edge_mask": "edges", "edge_to_pe": "edges",
    "pe_row": "edges", "pe_col": "edges", "pe_mask": "edges",
    # edge-attribute-weighted operators (sGAT only)
    "wagg_x": "wop", "ea_rowsum0": "wop",
    "wadj1": "wop", "ea_rowsum1": "wop",
}


# fields that MAY store as bf16 under pack="bf16" (raw fp32 payloads;
# y stays host-side and exact). Everything else is already lossless-16
# or structurally fp32-exact.
_BF16_OK = frozenset(
    {"x", "edge_attr", "agg_x", "agg_x_fm", "wagg_x", "wadj1",
     "ea_rowsum0", "ea_rowsum1"}
)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PackedStore:
    """A few [slots, W] int32 matrices holding a whole dense dataset.

    ``layout`` is static metadata: ``(name, segment, start, stop,
    shape, kind)`` per field — start/stop in HALFWORD (uint16) columns,
    ``kind`` in {"f32", "i32", "bf16", "u16i", "u16b", "u16f"} —
    hashable, so jitted consumers specialize on it.
    """

    segments: dict
    layout: tuple = field(metadata=dict(static=True))

    @property
    def num_slots(self) -> int:
        return next(iter(self.segments.values())).shape[0]


def static_field_kinds(
    *, ng: int, eg: int, pg: int, c0g: int, c1g: int, pack: str = "lossless"
) -> dict:
    """Deterministic per-field halfword encodings from the dense
    capacities ALONE — no data inspection. Two properties depend on
    this determinism: (a) every chunk of a ChunkedGraphStore packs to
    the same static layout, so one compiled epoch program serves all
    chunks (a data-driven choice could give a chunk whose float field
    happens to be integer-valued a narrower — different — layout and
    force a recompile per chunk); (b) :func:`estimate_store_bytes` is
    exact, so HBM byte budgets are respected rather than estimated
    against a best-case narrow packing.

    Index fields encode their structural bound (the pad sentinel equals
    the capacity, `dense_batch.py:133-143`): u16 when it fits, else
    i32. ``deg0`` (in-degree counts <= eg) and ``adj1`` (0/1 pooled
    adjacency) are integer-valued by construction and widen exactly
    from u16. Raw fp32 payloads stay wide unless ``pack='bf16'``.
    """
    u16max = np.iinfo(np.uint16).max

    def idx(bound):
        return "u16i" if bound <= u16max else "i32"

    def cnt(bound):
        return "u16f" if bound <= u16max else "f32"

    def pay(name):
        return "bf16" if pack == "bf16" and name in _BF16_OK else "f32"

    return {
        "node_mask": "u16b", "edge_mask": "u16b", "pool0_mask": "u16b",
        "pe_mask": "u16b", "pool1_mask": "u16b", "y_mask": "u16b",
        "row": idx(ng), "col": idx(ng),
        "assign0": idx(c0g), "edge_to_pe": idx(pg),
        "pe_row": idx(c0g), "pe_col": idx(c0g), "assign1": idx(c1g),
        "mem0_idx": idx(ng), "mem1_idx": idx(c0g),
        "tile_mem0": idx(ng), "tile_assign0": idx(c0g),
        "node_mask_fm": "u16b",
        "deg0": cnt(eg), "adj1": cnt(1),
        "agg_x_fm": pay("agg_x_fm"),
        "x": pay("x"), "edge_attr": pay("edge_attr"),
        "agg_x": pay("agg_x"), "wagg_x": pay("wagg_x"),
        "ea_rowsum0": pay("ea_rowsum0"), "wadj1": pay("wadj1"),
        "ea_rowsum1": pay("ea_rowsum1"), "y": "f32",
    }


def _field_class(kind: str) -> str:
    """Dtype class of a field encoding: which typed segment matrix the
    field packs into. u16-kind fields share a uint16 matrix; raw fp32 /
    bf16 / i32 payloads pack in their NATIVE dtype — a round-4 design
    packed everything into int32-viewed halfword rows, and the decode's
    whole-row bitcast/reshape chains materialized each multi-MB row
    several times over (measured ~8x the logical gather bytes at
    atomic scale)."""
    if kind in ("u16i", "u16f", "u16b"):
        return "u16"
    if kind in ("f32", "i32", "bf16"):
        return kind
    raise ValueError(kind)


_CLASS_DTYPE = {"u16": np.uint16, "f32": np.float32, "i32": np.int32}


def _to_typed(v: np.ndarray, kind: str, name: str = "?") -> np.ndarray:
    """[slots, ...] field -> [slots, W] matrix in its class dtype.

    u16 kinds verify the structural bound the static layout relies on
    (index <= capacity, operator integer-valued) and raise rather than
    truncate — a violation means a collation invariant broke upstream."""
    flat = np.ascontiguousarray(v.reshape(v.shape[0], -1))
    if kind == "f32":
        return flat.astype(np.float32, copy=False)
    if kind == "i32":
        return flat.astype(np.int32, copy=False)
    if kind == "bf16":
        import ml_dtypes

        return flat.astype(ml_dtypes.bfloat16)
    if kind in ("u16i", "u16f"):
        if flat.dtype not in (np.float32, np.int32, np.bool_):
            # e.g. the bf16 adj1: widen for the exactness check/cast
            flat = flat.astype(np.float32)
        if flat.size and not (
            flat.min() >= 0
            and flat.max() <= np.iinfo(np.uint16).max
            and (kind == "u16i" or np.all(flat == np.floor(flat)))
        ):
            raise ValueError(
                f"field {name!r} violates its static u16 encoding "
                "(out of [0, 65535] or non-integer) — collation "
                "invariant broken"
            )
        return flat.astype(np.uint16)
    if kind == "u16b":
        return flat.astype(np.uint16)
    raise ValueError(kind)


def _pack_host(
    batch: DenseGraphBatch, pack: str = "lossless"
) -> Tuple[dict, tuple]:
    """Flatten every non-None field of a host DenseGraphBatch into
    per-(segment, dtype-class) typed [slots, W] matrices + the static
    layout.

    ``pack``: "lossless" (default — exact round trip for every field)
    or "bf16" (raw fp32 payloads additionally halve to bfloat16).

    Field encodings come from :func:`static_field_kinds` applied to the
    batch's own capacities (its array shapes), never from the data, so
    equal-capacity batches always share one layout. A field decodes
    with a static lane slice of its class matrix plus an elementwise
    widen/cast — no whole-row bitcasts (see `_field_class`)."""
    if pack not in ("lossless", "bf16"):
        raise ValueError(f"pack must be 'lossless' or 'bf16', got {pack!r}")
    kinds = static_field_kinds(
        ng=batch.x.shape[1],
        eg=batch.row.shape[1],
        pg=batch.pe_row.shape[1],
        c0g=batch.pool0_mask.shape[1],
        c1g=batch.pool1_mask.shape[1],
        pack=pack,
    )
    cols: dict = {}
    layout = []
    for f in fields(DenseGraphBatch):
        v = getattr(batch, f.name)
        if v is None:
            continue
        kind = kinds[f.name]
        seg = f"{_SEGMENT_OF[f.name]}:{_field_class(kind)}"
        v = np.asarray(v)
        w = _to_typed(v, kind, f.name)
        start = sum(c.shape[1] for c in cols.get(seg, []))
        cols.setdefault(seg, []).append(w)
        layout.append(
            (f.name, seg, start, start + w.shape[1], tuple(v.shape[1:]), kind)
        )
    segments = {
        s2: np.ascontiguousarray(np.concatenate(ws, axis=1))
        for s2, ws in cols.items()
    }
    return segments, tuple(layout)


def unpack_rows(gathered: dict, layout: tuple) -> DenseGraphBatch:
    """Reconstruct a DenseGraphBatch from per-segment gathered rows
    ({segment: [g, W] typed}). All ops are static lane slices +
    elementwise widen/casts + free contiguous reshapes — XLA fuses
    them into the consuming step; only the row gathers touch HBM, and
    gathers of segments whose fields go unused are DCE'd."""
    import jax.numpy as jnp

    vals = {f.name: None for f in fields(DenseGraphBatch)}
    for name, seg, start, stop, shape, kind in layout:
        rows = gathered[seg]
        g = rows.shape[0]
        w = jax.lax.slice_in_dim(rows, start, stop, axis=1)
        if kind == "u16i":
            w = w.astype(jnp.int32)
        elif kind == "u16b":
            w = w != 0
        elif kind == "u16f":
            w = w.astype(jnp.float32)
        elif kind == "bf16":
            # adj1 consumes bf16 natively (adj_conv); raw payloads
            # widen — both are elementwise on the field only
            w = w if name == "adj1" else w.astype(jnp.float32)
        vals[name] = w.reshape((g,) + shape)
    return DenseGraphBatch(**vals)


def gather_packed(store: "PackedStore", idx: jax.Array) -> DenseGraphBatch:
    """Row-gather every segment for ``idx`` and reconstruct the batch.
    Unused segments' gathers are dead code the compiler removes."""
    gathered = {
        s: jnp.take(rows, idx, axis=0) for s, rows in store.segments.items()
    }
    return unpack_rows(gathered, store.layout)


def estimate_store_bytes(
    n_graphs: int,
    ng: int,
    eg: int,
    pg: int,
    c0g: int,
    c1g: int,
    num_features: int,
    num_edge_features: int,
    precompute_ops: bool = True,
    pack: str = "lossless",
    m0g: int = 0,
    m1g: int = 0,
    mt0g: int = 0,
) -> int:
    """Bytes of the packed dense store for ``n_graphs`` (+1 pad slot),
    computed from the SAME :func:`static_field_kinds` table
    :func:`_pack_host` packs with — so the estimate tracks the real
    store byte-for-byte (modulo per-segment word alignment, counted
    conservatively), including the 32-bit widening when a capacity
    exceeds uint16. HBM byte budgets (``device_cache_bytes``, chunk
    sizing) rely on this never undershooting."""
    g = n_graphs + 1
    kinds = static_field_kinds(
        ng=ng, eg=eg, pg=pg, c0g=c0g, c1g=c1g, pack=pack
    )
    hw = {"u16b": 1, "u16i": 1, "u16f": 1, "bf16": 1, "i32": 2, "f32": 2}
    elems = {
        "x": ng * num_features, "node_mask": ng,
        "row": eg, "col": eg,
        "edge_attr": eg * num_edge_features, "edge_mask": eg,
        "assign0": ng, "pool0_mask": c0g, "edge_to_pe": eg,
        "pe_row": pg, "pe_col": pg, "pe_mask": pg,
        "assign1": c0g, "pool1_mask": c1g,
        "y": 1, "y_mask": 1,
    }
    if precompute_ops:
        elems.update({"agg_x": ng * num_features, "deg0": ng,
                      "adj1": c0g * c0g,
                      "mem0_idx": c0g * m0g, "mem1_idx": c1g * m1g,
                      "agg_x_fm": ng * num_features,
                      "node_mask_fm": ng,
                      "tile_mem0": c0g * max(mt0g, 1),
                      "tile_assign0": ng // 8})
        if num_edge_features == 1:
            elems.update({
                "wagg_x": ng * num_features, "ea_rowsum0": ng,
                "wadj1": c0g * c0g, "ea_rowsum1": c0g,
            })
    per_hw = sum(n * hw[kinds[f]] for f, n in elems.items())
    num_segments = len({_SEGMENT_OF[f] for f in elems})
    per_hw += num_segments  # int32-word alignment pad, worst case
    return g * per_hw * 2


@functools.partial(jax.jit, donate_argnums=())
def _gather(store: PackedStore, idx: jax.Array) -> DenseGraphBatch:
    """Assemble a batch on-device: per-segment row gathers + fused
    unpacking. (Outside a scan every field materializes, so all
    segments are gathered here.)"""
    return gather_packed(store, idx)



def _mt0g_from_plans(plans, mt0g=None):
    """Tile member capacity (max tiles per level-0 cluster) for the
    run-padded layout, derived from the plans when not given."""
    if mt0g is not None:
        return mt0g
    best = 1
    for p in plans:
        if getattr(p, "cluster0", None) is not None and len(p.cluster0):
            lens = np.bincount(p.cluster0)
            best = max(best, int((-(-lens // 8)).max()))
    return best


class DeviceGraphStore:
    """Upload a dense-collated dataset to device memory once.

    ``samples``/``plans`` come from the loader's caches; capacities are
    the loader's dataset-wide dense capacities (every graph padded to
    the same per-graph shape, which is what makes the store a single
    stack of arrays).

    ``batch(dataset_indices, g_pad)`` returns a device-resident
    :class:`DenseGraphBatch` for the requested graphs, padded to
    ``g_pad`` with the all-padding slot, plus the molecule names. The
    returned batch's ``y``/``y_mask`` leaves are HOST numpy arrays (a
    few hundred bytes) so downstream target remapping and metrics
    bookkeeping never pay a device readback.
    """

    def __init__(
        self,
        samples: Sequence,
        plans: Sequence,
        *,
        ng: int,
        eg: int,
        pg: int,
        c0g: int,
        c1g: int,
        num_features: int,
        num_edge_features: int,
        device=None,
        precompute_ops: bool = True,
        pack: str = "lossless",
        m0g: int = 8,
        m1g: int = 8,
        mt0g: "int | None" = None,
    ):
        if len(samples) != len(plans):
            raise ValueError("samples/plans length mismatch")
        self.mols: List[str] = [s.mol for s in samples]
        self.pad_slot = len(samples)
        caps = dict(
            ng=ng, eg=eg, pg=pg, c0g=c0g, c1g=c1g, m0g=m0g, m1g=m1g,
            mt0g=_mt0g_from_plans(plans, mt0g),
            num_features=num_features, num_edge_features=num_edge_features,
            precompute_ops=precompute_ops,
        )
        chunks: List[DenseGraphBatch] = []
        for start in range(0, len(samples), _CHUNK):
            part = list(samples[start : start + _CHUNK])
            chunk, _ = collate_dense(
                part, g_pad=len(part), plans=list(plans[start : start + _CHUNK]),
                **caps,
            )
            chunks.append(chunk)
        # trailing all-padding slot: partial batches gather it
        pad, _ = collate_dense([], g_pad=1, **caps)
        chunks.append(pad)
        host = jax.tree.map(
            lambda *parts: np.concatenate(parts, axis=0), *chunks
        )
        # y/y_mask stay host-side (see class docstring); real node/edge
        # counts per slot feed the loader's padding stats without a
        # device readback
        self.y_host = np.asarray(host.y)
        self.y_mask_host = np.asarray(host.y_mask)
        self.node_counts = np.asarray(host.node_mask).sum(axis=1)
        self.edge_counts = np.asarray(host.edge_mask).sum(axis=1)
        # per-graph capacities for consumers that need shapes without
        # touching device data
        self.caps = dict(
            ng=ng, eg=eg, pg=pg, c0g=c0g, c1g=c1g,
            num_features=num_features, num_edge_features=num_edge_features,
        )
        segments, layout = _pack_host(host, pack)
        self.nbytes = sum(s.nbytes for s in segments.values())
        self.store: PackedStore = PackedStore(
            segments={
                s: jax.device_put(m, device) for s, m in segments.items()
            },
            layout=layout,
        )

    @property
    def num_graphs(self) -> int:
        return self.pad_slot

    def batch(
        self, indices: np.ndarray, g_pad: int
    ) -> Tuple[DenseGraphBatch, List[str]]:
        """Device-gathered batch for dataset ``indices`` (store slots)."""
        idx = np.full(g_pad, self.pad_slot, dtype=np.int32)
        idx[: len(indices)] = indices
        batch = _gather(self.store, jnp.asarray(idx))
        import dataclasses

        batch = dataclasses.replace(
            batch, y=self.y_host[idx], y_mask=self.y_mask_host[idx]
        )
        mols = [self.mols[int(i)] for i in indices]
        return batch, mols


class ChunkedGraphStore:
    """Rotating device residency for datasets beyond the HBM budget.

    The dataset is packed ON HOST once into fixed consecutive chunks
    (each with its own trailing pad slot); during an epoch the loader
    uploads chunk i+1 while batches gather from chunk i, so at most two
    chunks are device-resident (``chunk_bytes`` should be half the HBM
    budget) and the upload overlaps compute (async `device_put`).

    Shuffling is hierarchical — chunk order and within-chunk order are
    shuffled, batches never span chunks — a documented divergence from
    the global shuffle of the in-HBM store / streaming paths (the
    reference's DataLoader shuffles globally; so do ours when the
    dataset fits).
    """

    def __init__(
        self,
        samples: Sequence,
        plans: Sequence,
        *,
        ng: int,
        eg: int,
        pg: int,
        c0g: int,
        c1g: int,
        num_features: int,
        num_edge_features: int,
        precompute_ops: bool = True,
        chunk_bytes: int,
        pack: str = "lossless",
        batch_size: Optional[int] = None,
        m0g: int = 8,
        m1g: int = 8,
        mt0g: "int | None" = None,
    ):
        if len(samples) != len(plans):
            raise ValueError("samples/plans length mismatch")
        mt0g = _mt0g_from_plans(plans, mt0g)
        caps = dict(
            ng=ng, eg=eg, pg=pg, c0g=c0g, c1g=c1g, m0g=m0g, m1g=m1g,
            mt0g=mt0g,
            num_features=num_features, num_edge_features=num_edge_features,
            precompute_ops=precompute_ops,
        )
        per_slot = estimate_store_bytes(
            1, ng=ng, eg=eg, pg=pg, c0g=c0g, c1g=c1g, m0g=m0g, m1g=m1g,
            mt0g=mt0g,
            num_features=num_features, num_edge_features=num_edge_features,
            precompute_ops=precompute_ops, pack=pack,
        ) // 2
        slots = max(1, chunk_bytes // per_slot - 1)
        if batch_size and batch_size > 1:
            # Batches never span chunks, so a chunk whose slot count is
            # not a batch_size multiple leaves its tail batch mostly
            # padding (the 0.78 edge-fill regression of round 3). Round
            # DOWN to a batch multiple; when the budget holds less than
            # one full batch, one batch per chunk is the floor — the
            # budget is then exceeded by that remainder and fill beats
            # an unusable chunk.
            slots = max(batch_size, slots // batch_size * batch_size)
        self.mols: List[str] = [s.mol for s in samples]
        self.chunk_ranges: List[Tuple[int, int]] = []
        self._host_chunks: List[Tuple[dict, tuple]] = []
        ys, yms, ncs, ecs = [], [], [], []
        for start in range(0, len(samples), slots):
            part = list(samples[start : start + slots])
            host, _ = collate_dense(
                part, g_pad=len(part),
                plans=list(plans[start : start + slots]), **caps,
            )
            pad, _ = collate_dense([], g_pad=1, **caps)
            host = jax.tree.map(
                lambda a, b: np.concatenate([a, b], axis=0), host, pad
            )
            ys.append(np.asarray(host.y)[:-1])
            yms.append(np.asarray(host.y_mask)[:-1])
            ncs.append(np.asarray(host.node_mask).sum(axis=1)[:-1])
            ecs.append(np.asarray(host.edge_mask).sum(axis=1)[:-1])
            self._host_chunks.append(_pack_host(host, pack))
            self.chunk_ranges.append((start, len(part)))
        self.y_host = np.concatenate(ys)
        self.y_mask_host = np.concatenate(yms)
        self.node_counts = np.concatenate(ncs)
        self.edge_counts = np.concatenate(ecs)
        self.caps = dict(
            ng=ng, eg=eg, pg=pg, c0g=c0g, c1g=c1g,
            num_features=num_features, num_edge_features=num_edge_features,
        )
        self.chunk_nbytes = max(
            sum(m.nbytes for m in segs.values())
            for segs, _ in self._host_chunks
        )

    @property
    def num_graphs(self) -> int:
        return len(self.mols)

    @property
    def num_chunks(self) -> int:
        return len(self._host_chunks)

    def upload(self, ci: int, device=None) -> PackedStore:
        """Start the async transfer of chunk ``ci`` to the device."""
        segs, layout = self._host_chunks[ci]
        return PackedStore(
            segments={
                s: jax.device_put(m, device) for s, m in segs.items()
            },
            layout=layout,
        )

    def batch(
        self, store: PackedStore, ci: int, local: np.ndarray, g_pad: int
    ) -> Tuple[DenseGraphBatch, List[str]]:
        """Batch from an uploaded chunk: ``local`` are chunk-local slot
        indices; the chunk's own pad slot fills the remainder."""
        import dataclasses

        start, clen = self.chunk_ranges[ci]
        idx = np.full(g_pad, clen, dtype=np.int32)
        idx[: len(local)] = local
        batch = _gather(store, jnp.asarray(idx))
        gl = np.minimum(start + idx, len(self.mols) - 1)
        y = np.where(idx < clen, self.y_host[gl], 0.0).astype(np.float32)
        ym = (idx < clen) & self.y_mask_host[gl]
        batch = dataclasses.replace(batch, y=y, y_mask=ym)
        mols = [self.mols[start + int(i)] for i in local]
        return batch, mols


def build_chunked_store_from_loader(
    loader, chunk_bytes: int
) -> Optional[ChunkedGraphStore]:
    """Materialize a loader's dataset as a :class:`ChunkedGraphStore`
    (host-packed; chunks upload per epoch)."""
    if loader._dense_caps is None:
        return None
    ds = loader.dataset
    samples, plans, slot_of_index = [], [], {}
    for i in range(len(ds)):
        s = loader._get_sample(i)
        if s is None:
            continue
        slot_of_index[i] = len(samples)
        samples.append(s)
        plans.append(loader._get_plan(i, s))
    if not samples:
        return None
    nf, ef = ds.feature_dims()
    caps = dict(loader._dense_caps)
    caps.setdefault("pg", caps["eg"])
    store = ChunkedGraphStore(
        samples, plans,
        num_features=nf, num_edge_features=ef,
        precompute_ops=getattr(loader, "precompute_ops", True),
        pack=getattr(loader, "store_pack", "lossless"),
        chunk_bytes=chunk_bytes,
        batch_size=getattr(loader, "batch_size", None), **caps,
    )
    store.slot_of_index = slot_of_index
    return store


def build_store_from_loader(loader, device=None) -> Optional[DeviceGraphStore]:
    """Materialize a loader's dataset as a :class:`DeviceGraphStore`.

    Returns None when the dataset is empty. Uses the loader's sample
    and plan caches (so a later streaming fallback costs nothing
    extra). The loader must be dense-layout with computed capacities.
    """
    if loader._dense_caps is None:
        return None
    ds = loader.dataset
    samples, plans, slot_of_index = [], [], {}
    for i in range(len(ds)):
        s = loader._get_sample(i)
        if s is None:
            continue
        slot_of_index[i] = len(samples)
        samples.append(s)
        plans.append(loader._get_plan(i, s))
    if not samples:
        return None
    nf, ef = ds.feature_dims()
    caps = dict(loader._dense_caps)
    caps.setdefault("pg", caps["eg"])
    store = DeviceGraphStore(
        samples, plans,
        num_features=nf, num_edge_features=ef, device=device,
        precompute_ops=getattr(loader, "precompute_ops", True),
        pack=getattr(loader, "store_pack", "lossless"), **caps,
    )
    store.slot_of_index = slot_of_index
    return store
