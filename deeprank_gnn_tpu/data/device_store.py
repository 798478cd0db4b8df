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
    "agg_x": "opcore", "deg0": "opcore", "adj1": "opcore",
    "assign0": "opcore", "pool0_mask": "opcore",
    "assign1": "opcore", "pool1_mask": "opcore",
    "y": "opcore", "y_mask": "opcore",
    "x": "x", "node_mask": "x",
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
    {"x", "edge_attr", "agg_x", "wagg_x", "wadj1", "ea_rowsum0", "ea_rowsum1"}
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


def _field_kind(name: str, v: np.ndarray, pack: str) -> str:
    """Pick the narrowest exact halfword encoding (data-driven, with a
    32-bit fallback so out-of-range data never breaks — it just packs
    wider)."""
    if v.dtype == np.bool_:
        return "u16b"
    if v.dtype == np.int32:
        if v.size == 0 or (v.min() >= 0 and v.max() <= np.iinfo(np.uint16).max):
            return "u16i"
        return "i32"
    if v.dtype == np.float32:
        # integer-valued operators (in-degrees, 0/1 pooled adjacency)
        # widen exactly from uint16
        if v.size == 0 or (
            v.min() >= 0
            and v.max() <= np.iinfo(np.uint16).max
            and np.all(v == np.floor(v))
        ):
            return "u16f"
        if pack == "bf16" and name in _BF16_OK:
            return "bf16"
        return "f32"
    raise TypeError(f"unpackable dtype {v.dtype} for {name}")


def _to_halfwords(v: np.ndarray, kind: str) -> np.ndarray:
    """[slots, ...] field -> [slots, W16] uint16 matrix (little-endian
    halfword order for 32-bit kinds, matching XLA's bitcast
    lo-half-first convention on device)."""
    flat = np.ascontiguousarray(v.reshape(v.shape[0], -1))
    if kind in ("f32", "i32"):
        return flat.view(np.uint16)
    if kind == "bf16":
        import ml_dtypes

        return flat.astype(ml_dtypes.bfloat16).view(np.uint16)
    if kind in ("u16i", "u16f"):
        return flat.astype(np.uint16)
    if kind == "u16b":
        return flat.astype(np.uint16)
    raise ValueError(kind)


def _pack_host(
    batch: DenseGraphBatch, pack: str = "lossless"
) -> Tuple[dict, tuple]:
    """Flatten every non-None field of a host DenseGraphBatch into the
    per-segment [slots, W] int32 matrices + the static layout.

    ``pack``: "lossless" (default — exact round trip for every field)
    or "bf16" (raw fp32 payloads additionally halve to bfloat16)."""
    if pack not in ("lossless", "bf16"):
        raise ValueError(f"pack must be 'lossless' or 'bf16', got {pack!r}")
    cols: dict = {}
    layout = []
    for f in fields(DenseGraphBatch):
        v = getattr(batch, f.name)
        if v is None:
            continue
        seg = _SEGMENT_OF[f.name]
        v = np.asarray(v)
        kind = _field_kind(f.name, v, pack)
        w = _to_halfwords(v, kind)
        start = sum(c.shape[1] for c in cols.get(seg, []))
        cols.setdefault(seg, []).append(w)
        layout.append(
            (f.name, seg, start, start + w.shape[1], tuple(v.shape[1:]), kind)
        )
    segments = {}
    for s, ws in cols.items():
        m = np.concatenate(ws, axis=1)
        if m.shape[1] % 2:  # int32-word alignment
            m = np.concatenate(
                [m, np.zeros((m.shape[0], 1), np.uint16)], axis=1
            )
        segments[s] = np.ascontiguousarray(m).view(np.int32)
    return segments, tuple(layout)


def unpack_rows(gathered: dict, layout: tuple) -> DenseGraphBatch:
    """Reconstruct a DenseGraphBatch from per-segment gathered rows
    ({segment: [g, W] int32}). All ops are static slices/bitcasts/
    reshapes/widenings — XLA fuses them into the consuming step; only
    the row gathers touch HBM, and gathers of segments whose fields go
    unused are DCE'd."""
    vals = {f.name: None for f in fields(DenseGraphBatch)}
    half = {
        s: jax.lax.bitcast_convert_type(rows, jnp.uint16).reshape(
            rows.shape[0], -1
        )
        for s, rows in gathered.items()
    }
    for name, seg, start, stop, shape, kind in layout:
        rows = half[seg]
        g = rows.shape[0]
        w = jax.lax.slice_in_dim(rows, start, stop, axis=1)
        if kind == "f32":
            w = jax.lax.bitcast_convert_type(
                w.reshape(g, -1, 2), jnp.float32
            )
        elif kind == "i32":
            w = jax.lax.bitcast_convert_type(w.reshape(g, -1, 2), jnp.int32)
        elif kind == "bf16":
            w = jax.lax.bitcast_convert_type(w, jnp.bfloat16).astype(
                jnp.float32
            )
        elif kind == "u16i":
            w = w.astype(jnp.int32)
        elif kind == "u16b":
            w = w != 0
        elif kind == "u16f":
            w = w.astype(jnp.float32)
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
) -> int:
    """Bytes of the packed dense store for ``n_graphs`` (+1 pad slot),
    at halfword granularity: indices/masks/integer-valued operators one
    uint16 each, fp32 payloads two — one when ``pack='bf16'``."""
    g = n_graphs + 1
    payload = 1 if pack == "bf16" else 2  # halfwords per fp32 payload elem
    per_hw = (
        ng * num_features * payload  # x
        + ng  # node_mask
        + eg * 2  # row, col (u16)
        + eg * num_edge_features * payload  # edge_attr
        + eg  # edge_mask
        + ng  # assign0
        + c0g  # pool0_mask
        + eg  # edge_to_pe
        + pg * 2  # pe_row, pe_col
        + pg  # pe_mask
        + c0g  # assign1
        + c1g  # pool1_mask
        + 2 + 1  # y (f32), y_mask
    )
    if precompute_ops:
        per_hw += (
            ng * num_features * 2  # agg_x (fp32-exact sums stay wide
            # under "lossless"; bf16 halves them)
            if pack != "bf16"
            else ng * num_features
        )
        per_hw += (
            ng  # deg0 (integer counts -> u16)
            + c0g * c0g  # adj1 (0/1 multiplicities -> u16)
        )
        if num_edge_features == 1:
            per_hw += (
                ng * num_features * payload  # wagg_x
                + ng * payload  # ea_rowsum0
                + c0g * c0g * payload  # wadj1
                + c0g * payload  # ea_rowsum1
            )
    return g * per_hw * 2


@functools.partial(jax.jit, donate_argnums=())
def _gather(store: PackedStore, idx: jax.Array) -> DenseGraphBatch:
    """Assemble a batch on-device: per-segment row gathers + fused
    unpacking. (Outside a scan every field materializes, so all
    segments are gathered here.)"""
    return gather_packed(store, idx)


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
    ):
        if len(samples) != len(plans):
            raise ValueError("samples/plans length mismatch")
        self.mols: List[str] = [s.mol for s in samples]
        self.pad_slot = len(samples)
        caps = dict(
            ng=ng, eg=eg, pg=pg, c0g=c0g, c1g=c1g,
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
    ):
        if len(samples) != len(plans):
            raise ValueError("samples/plans length mismatch")
        caps = dict(
            ng=ng, eg=eg, pg=pg, c0g=c0g, c1g=c1g,
            num_features=num_features, num_edge_features=num_edge_features,
            precompute_ops=precompute_ops,
        )
        per_slot = estimate_store_bytes(
            1, ng=ng, eg=eg, pg=pg, c0g=c0g, c1g=c1g,
            num_features=num_features, num_edge_features=num_edge_features,
            precompute_ops=precompute_ops, pack=pack,
        ) // 2
        slots = max(1, chunk_bytes // per_slot - 1)
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
        chunk_bytes=chunk_bytes, **caps,
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
