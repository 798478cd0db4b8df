"""Independent torch oracle of the reference models, for parity tests.

This module re-executes the *reference's* forward semantics in plain
torch so that tests/test_reference_parity.py can compare the JAX
framework against an actually-executed PyTorch model rather than a
numpy transliteration.  It covers:

- the torch-scatter primitives the reference calls
  (reference `ginet.py:6-7`, `sGAT.py:6-7`, `community_pooling.py:6`),
- the PyG pooling internals `consecutive_cluster` / `pool_edge`
  (torch-sparse coalesce) / `pool_batch` / `max_pool_x`
  (reference `community_pooling.py:7-8,197-224`, `ginet.py:114`),
- the HDF5 graph loader transforms (direction-doubling, edge
  transform, feature stacking — reference `DataSet.py:231-366`),
- PyG `Batch.from_data_list` collation (edge/internal-edge index
  offsetting; cluster vectors concatenated un-offset, which is why
  `get_preloaded_cluster` exists — reference `community_pooling.py:25-30`),
- the three model families: GINet (reference `ginet.py:22-141`),
  FoutNet (reference `foutnet.py:15-126`), sGAT (reference
  `sGAT.py:19-139`), with state-dict-compatible module names so the
  paper's pretrained checkpoints load directly.

IMPORTANT: nothing here imports deeprank_gnn_tpu — the oracle must stay
independent of the framework under test.  torch-geometric/torch-scatter
are not installed in this image, so their documented kernel semantics
are replicated with plain torch ops below.
"""

from __future__ import annotations

import copy

import h5py
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# torch-scatter primitives (semantics of torch_scatter 2.x as used by the
# reference: scatter into zero-initialised `out` buffers).
# ---------------------------------------------------------------------------

def scatter_sum(src: torch.Tensor, index: torch.Tensor, dim_size: int) -> torch.Tensor:
    out = torch.zeros(dim_size, *src.shape[1:], dtype=src.dtype)
    return out.index_add_(0, index, src)


def scatter_mean(src: torch.Tensor, index: torch.Tensor, dim_size: int) -> torch.Tensor:
    # torch_scatter.scatter_mean = scatter_sum / count.clamp(min=1)
    total = scatter_sum(src, index, dim_size)
    count = torch.zeros(dim_size, dtype=src.dtype).index_add_(
        0, index, torch.ones(index.shape[0], dtype=src.dtype)
    )
    count = count.clamp(min=1).reshape(-1, *([1] * (src.dim() - 1)))
    return total / count


def scatter_max(src: torch.Tensor, index: torch.Tensor, dim_size: int) -> torch.Tensor:
    # torch_scatter.scatter_max: per-segment max; segments with no
    # members keep the buffer's 0 (the reference only ever max-pools
    # post-ReLU features over non-empty clusters, so the empty/negative
    # corner never fires there).
    out = torch.full((dim_size, *src.shape[1:]), float("-inf"), dtype=src.dtype)
    idx = index.reshape(-1, *([1] * (src.dim() - 1))).expand_as(src)
    out.scatter_reduce_(0, idx, src, reduce="amax", include_self=True)
    return torch.where(torch.isinf(out), torch.zeros_like(out), out)


# ---------------------------------------------------------------------------
# PyG pooling internals
# ---------------------------------------------------------------------------

def consecutive_cluster(src: torch.Tensor):
    """PyG `consecutive_cluster`: renumber cluster ids to 0..C-1 (sorted
    order) and return one representative node index per cluster."""
    uniq, inv = torch.unique(src, sorted=True, return_inverse=True)
    perm = torch.empty(uniq.numel(), dtype=torch.long)
    perm.scatter_(0, inv, torch.arange(inv.numel()))
    return inv, perm


def coalesce(edge_index: torch.Tensor, edge_attr, num_nodes: int):
    """torch-sparse `coalesce`: sort edges by (row, col) and sum the
    attributes of duplicates (reference `community_pooling.py:204-210`
    via PyG `pool_edge`)."""
    row, col = edge_index[0], edge_index[1]
    key = row * num_nodes + col
    key_sorted, order = torch.sort(key, stable=True)
    uniq_key, inv = torch.unique(key_sorted, sorted=True, return_inverse=True)
    new_index = torch.stack([uniq_key // num_nodes, uniq_key % num_nodes])
    if edge_attr is None:
        return new_index, None
    new_attr = scatter_sum(edge_attr[order], inv, uniq_key.numel())
    return new_index, new_attr


def pool_edge(cluster: torch.Tensor, edge_index: torch.Tensor, edge_attr):
    """PyG `pool_edge`: map endpoints through the cluster assignment,
    drop self-loops, coalesce."""
    num_nodes = cluster.numel()
    mapped = cluster[edge_index.reshape(-1)].reshape(2, -1)
    keep = mapped[0] != mapped[1]
    mapped = mapped[:, keep]
    if edge_attr is not None:
        edge_attr = edge_attr[keep]
    if mapped.numel() > 0:
        mapped, edge_attr = coalesce(mapped, edge_attr, num_nodes)
    return mapped, edge_attr


def pool_batch(perm: torch.Tensor, batch: torch.Tensor) -> torch.Tensor:
    return batch[perm]


def max_pool_x(cluster: torch.Tensor, x: torch.Tensor, batch: torch.Tensor):
    """PyG `max_pool_x` (reference `ginet.py:114`)."""
    cluster, perm = consecutive_cluster(cluster)
    return scatter_max(x, cluster, int(cluster.max()) + 1), pool_batch(perm, batch)


def get_preloaded_cluster(cluster: torch.Tensor, batch: torch.Tensor) -> torch.Tensor:
    """Reference `community_pooling.py:25-30` verbatim semantics: offset
    each graph's stored cluster ids past the previous graph's max, by
    in-place mutation."""
    nbatch = int(batch.max()) + 1
    for ib in range(1, nbatch):
        cluster[batch == ib] += torch.max(cluster[batch == ib - 1]) + 1
    return cluster


class Data:
    """Minimal stand-in for a PyG Data/Batch: attribute bag + clone()."""

    def clone(self) -> "Data":
        out = Data()
        for k, v in self.__dict__.items():
            out.__dict__[k] = v.clone() if torch.is_tensor(v) else copy.copy(v)
        return out


def community_pooling(cluster: torch.Tensor, data: Data) -> Data:
    """Reference `community_pooling.py:161-251` on the batch path."""
    cluster, perm = consecutive_cluster(cluster)
    x = scatter_max(data.x, cluster, int(cluster.max()) + 1)
    edge_index, edge_attr = pool_edge(cluster, data.edge_index, data.edge_attr)
    has_internal = hasattr(data, "internal_edge_index")
    if has_internal:
        internal_edge_index, internal_edge_attr = pool_edge(
            cluster, data.internal_edge_index, data.internal_edge_attr
        )
    pos = scatter_mean(data.pos, cluster, int(cluster.max()) + 1)
    c0, c1 = data.cluster0, data.cluster1
    out = Data()
    out.batch = pool_batch(perm, data.batch)
    out.x = x
    out.edge_index = edge_index
    out.edge_attr = edge_attr
    out.pos = pos
    if has_internal:
        out.internal_edge_index = internal_edge_index
        out.internal_edge_attr = internal_edge_attr
    out.cluster0 = c0
    out.cluster1 = c1
    return out


# ---------------------------------------------------------------------------
# HDF5 loading + PyG-style collation (reference `DataSet.py:231-366`,
# PyG Batch.from_data_list `__inc__` offsetting)
# ---------------------------------------------------------------------------

def default_edge_transform(x: np.ndarray) -> np.ndarray:
    # reference `DataSet.py:96`
    return np.tanh(-x / 2 + 2) + 1


def load_one_graph(
    fname: str,
    mol: str,
    node_features,
    edge_features=("dist",),
    target=None,
    clustering="mcl",
    edge_transform=default_edge_transform,
) -> Data:
    with h5py.File(fname, "r") as f5:
        grp = f5[mol]
        cols = []
        for feat in node_features:
            vals = grp["node_data/" + feat][()]
            if vals.ndim == 1:
                vals = vals.reshape(-1, 1)
            cols.append(vals)
        x = torch.tensor(np.hstack(cols), dtype=torch.float)

        def edges(index_key, data_prefix):
            ind = grp[index_key][()]
            ind = np.vstack((ind, np.flip(ind, 1))).T
            cols = []
            for feat in edge_features:
                vals = grp[data_prefix + feat][()]
                if vals.ndim == 1:
                    vals = vals.reshape(-1, 1)
                cols.append(vals)
            attr = np.hstack(cols)
            attr = np.vstack((attr, attr))
            attr = edge_transform(attr)
            return (
                torch.tensor(ind.copy(), dtype=torch.long),
                torch.tensor(attr, dtype=torch.float),
            )

        d = Data()
        d.x = x
        d.edge_index, d.edge_attr = edges("edge_index", "edge_data/")
        d.internal_edge_index, d.internal_edge_attr = edges(
            "internal_edge_index", "internal_edge_data/"
        )
        d.pos = torch.tensor(grp["node_data/pos"][()], dtype=torch.float)
        d.mol = mol
        if target is not None and target in grp["score"]:
            d.y = torch.tensor([grp["score/" + target][()]], dtype=torch.float)
        else:
            d.y = None
        cpath = f"clustering/{clustering}"
        d.cluster0 = torch.tensor(grp[cpath + "/depth_0"][()], dtype=torch.long)
        d.cluster1 = torch.tensor(grp[cpath + "/depth_1"][()], dtype=torch.long)
    return d


def batch_graphs(datalist) -> Data:
    """PyG `Batch.from_data_list` semantics: `*index*` keys offset by
    cumulative node count, everything else concatenated."""
    out = Data()
    n_off = 0
    xs, poss, eis, eas, ieis, ieas, c0s, c1s, ys, batch = (
        [], [], [], [], [], [], [], [], [], []
    )
    for gi, d in enumerate(datalist):
        n = d.x.shape[0]
        xs.append(d.x)
        poss.append(d.pos)
        eis.append(d.edge_index + n_off)
        eas.append(d.edge_attr)
        ieis.append(d.internal_edge_index + n_off)
        ieas.append(d.internal_edge_attr)
        c0s.append(d.cluster0)
        c1s.append(d.cluster1)
        if d.y is not None:
            ys.append(d.y)
        batch.append(torch.full((n,), gi, dtype=torch.long))
        n_off += n
    out.x = torch.cat(xs)
    out.pos = torch.cat(poss)
    out.edge_index = torch.cat(eis, dim=1)
    out.edge_attr = torch.cat(eas)
    out.internal_edge_index = torch.cat(ieis, dim=1)
    out.internal_edge_attr = torch.cat(ieas)
    out.cluster0 = torch.cat(c0s)
    out.cluster1 = torch.cat(c1s)
    out.y = torch.cat(ys) if ys else None
    out.batch = torch.cat(batch)
    return out


# ---------------------------------------------------------------------------
# Models (state-dict compatible with the paper checkpoints)
# ---------------------------------------------------------------------------

class GINetConvLayer(nn.Module):
    """Reference `ginet.py:22-78`."""

    def __init__(self, in_channels, out_channels, number_edge_features=1):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.fc = nn.Linear(in_channels, out_channels, bias=False)
        self.fc_edge_attr = nn.Linear(
            number_edge_features, number_edge_features, bias=False
        )
        self.fc_attention = nn.Linear(
            2 * out_channels + number_edge_features, 1, bias=False
        )

    def forward(self, x, edge_index, edge_attr):
        row, col = edge_index
        num_node = x.shape[0]
        if edge_attr.dim() == 1:
            edge_attr = edge_attr.unsqueeze(-1)
        xcol = self.fc(x[col])
        xrow = self.fc(x[row])
        ed = self.fc_edge_attr(edge_attr)
        alpha = torch.cat([xrow, xcol, ed], dim=1)
        alpha = self.fc_attention(alpha)
        alpha = F.leaky_relu(alpha)
        alpha = F.softmax(alpha, dim=1)  # [E,1] -> identically 1 (quirk Q1)
        h = alpha * xcol
        return scatter_sum(h, row, num_node)


class GINet(nn.Module):
    """Reference `ginet.py:81-141` (both towers on interface edges —
    quirk Q2).  `forward(data, trace=dict)` records intermediates."""

    def __init__(self, input_shape, output_shape=1, input_shape_edge=1):
        super().__init__()
        self.conv1 = GINetConvLayer(input_shape, 16, input_shape_edge)
        self.conv2 = GINetConvLayer(16, 32, input_shape_edge)
        self.conv1_ext = GINetConvLayer(input_shape, 16, input_shape_edge)
        self.conv2_ext = GINetConvLayer(16, 32, input_shape_edge)
        self.fc1 = nn.Linear(64, 128)
        self.fc2 = nn.Linear(128, output_shape)
        self.dropout = 0.4

    def _tower(self, conv1, conv2, data, trace, tag):
        data.x = F.relu(conv1(data.x, data.edge_index, data.edge_attr))
        trace[f"{tag}.conv1"] = data.x
        cluster = get_preloaded_cluster(data.cluster0, data.batch)
        data = community_pooling(cluster, data)
        trace[f"{tag}.pool0.x"] = data.x
        trace[f"{tag}.pool0.edge_index"] = data.edge_index
        trace[f"{tag}.pool0.edge_attr"] = data.edge_attr
        data.x = F.relu(conv2(data.x, data.edge_index, data.edge_attr))
        trace[f"{tag}.conv2"] = data.x
        cluster = get_preloaded_cluster(data.cluster1, data.batch)
        x, batch = max_pool_x(cluster, data.x, data.batch)
        trace[f"{tag}.pool1.x"] = x
        x = scatter_mean(x, batch, int(batch.max()) + 1)
        trace[f"{tag}.readout"] = x
        return x

    def forward(self, data, trace=None):
        trace = trace if trace is not None else {}
        data_ext = data.clone()
        x = self._tower(self.conv1, self.conv2, data, trace, "t1")
        x_ext = self._tower(self.conv1_ext, self.conv2_ext, data_ext, trace, "t2")
        x = torch.cat([x, x_ext], dim=1)
        x = F.relu(self.fc1(x))
        trace["fc1"] = x
        x = F.dropout(x, self.dropout, training=self.training)
        x = self.fc2(x)
        trace["out"] = x
        return x


class FoutLayer(nn.Module):
    """Reference `foutnet.py:15-87` including the per-node neighbor-mean
    loop (torch.mean of an empty slice -> NaN for isolated nodes)."""

    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.Wc = nn.Parameter(torch.zeros(in_channels, out_channels))
        self.Wn = nn.Parameter(torch.zeros(in_channels, out_channels))
        self.bias = nn.Parameter(torch.zeros(out_channels))

    def forward(self, x, edge_index):
        num_node = x.shape[0]
        alpha = x @ self.Wc
        beta = x @ self.Wn
        gamma = torch.zeros(num_node, self.Wc.shape[1])
        for n in range(num_node):
            index = edge_index[:, edge_index[0, :] == n][1, :]
            gamma[n, :] = torch.mean(beta[index, :], dim=0)
        return alpha + gamma + self.bias


class sGraphAttentionLayer(nn.Module):
    """Reference `sGAT.py:19-99` (undirected=True default: row-side
    scatter only, quirk Q10)."""

    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(2 * in_channels, out_channels))
        self.bias = nn.Parameter(torch.zeros(out_channels))

    def forward(self, x, edge_index, edge_attr):
        row, col = edge_index
        num_node = x.shape[0]
        if edge_attr.dim() == 1:
            edge_attr = edge_attr.unsqueeze(-1)
        alpha = torch.cat([x[row], x[col]], dim=-1) @ self.weight
        alpha = edge_attr * alpha
        return scatter_mean(alpha, row, num_node) + self.bias


class _SingleTowerNet(nn.Module):
    """Shared skeleton of FoutNet/sGAT (reference `foutnet.py:103-126`,
    `sGAT.py:114-139`)."""

    def __init__(self, output_shape):
        super().__init__()
        self.fc1 = nn.Linear(32, 64)
        self.fc2 = nn.Linear(64, output_shape)

    def _conv(self, conv, data):
        raise NotImplementedError

    def forward(self, data, trace=None):
        trace = trace if trace is not None else {}
        data.x = F.relu(self._conv(self.conv1, data))
        trace["conv1"] = data.x
        cluster = get_preloaded_cluster(data.cluster0, data.batch)
        data = community_pooling(cluster, data)
        trace["pool0.x"] = data.x
        data.x = F.relu(self._conv(self.conv2, data))
        trace["conv2"] = data.x
        cluster = get_preloaded_cluster(data.cluster1, data.batch)
        x, batch = max_pool_x(cluster, data.x, data.batch)
        trace["pool1.x"] = x
        x = scatter_mean(x, batch, int(batch.max()) + 1)
        trace["readout"] = x
        x = F.relu(self.fc1(x))
        x = self.fc2(x)
        trace["out"] = x
        return x


class FoutNet(_SingleTowerNet):
    def __init__(self, input_shape, output_shape=1, input_shape_edge=None):
        super().__init__(output_shape)
        self.conv1 = FoutLayer(input_shape, 16)
        self.conv2 = FoutLayer(16, 32)

    def _conv(self, conv, data):
        return conv(data.x, data.edge_index)


class sGAT(_SingleTowerNet):
    def __init__(self, input_shape, output_shape=1, input_shape_edge=None):
        super().__init__(output_shape)
        self.conv1 = sGraphAttentionLayer(input_shape, 16)
        self.conv2 = sGraphAttentionLayer(16, 32)

    def _conv(self, conv, data):
        return conv(data.x, data.edge_index, data.edge_attr)
