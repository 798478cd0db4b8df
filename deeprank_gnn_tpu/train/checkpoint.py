"""Checkpoint save/load, including torch-checkpoint import.

The reference persists a single dict with model + optimizer state and
the full data/config context (reference `NeuralNet.py:768-792`), named
``t{task}_y{target}_b{batch}_e{nepoch}_lr{lr}[_{epoch}].pth.tar``. We
keep the same dict schema and naming so downstream tooling carries
over; the payload is a pickle of numpy-ified pytrees.

`load_state` transparently loads either our format or a torch
``.pt``/``.pth.tar`` checkpoint (the paper's pretrained models); torch
state dicts are converted tensor-by-tensor into the matching parameter
pytrees (layouts already agree, see `models/common.py`).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

MAGIC = "deeprank_gnn_tpu-checkpoint"


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_state(filename: str, state: Dict[str, Any]) -> None:
    payload = dict(state)
    payload["__format__"] = MAGIC
    if "model" in payload:
        payload["model"] = _to_numpy(payload["model"])
    if "optimizer" in payload:
        payload["optimizer"] = _to_numpy(payload["optimizer"])
    with open(filename, "wb") as f:
        pickle.dump(payload, f)


def load_state(filename: str) -> Dict[str, Any]:
    """Load our pickle format, falling back to torch for reference
    checkpoints (reference `NeuralNet.py:794-825`)."""
    try:
        with open(filename, "rb") as f:
            payload = pickle.load(f)
        if isinstance(payload, dict) and payload.get("__format__") == MAGIC:
            return payload
    except Exception:
        pass
    import torch  # cpu-only torch, used purely as a file reader

    state = torch.load(filename, map_location="cpu", weights_only=False)
    out = dict(state)
    out["__format__"] = "torch"
    out["model"] = {
        k: np.asarray(v.detach().cpu().numpy()) for k, v in state["model"].items()
    }
    return out


def _g(sd, key):
    return jnp.asarray(sd[key])


def torch_state_dict_to_params(net, sd: Dict[str, np.ndarray]):
    """Convert a reference torch state dict into our parameter pytree."""
    from deeprank_gnn_tpu.models.ginet import GINet, GINetConvParams, GINetParams
    from deeprank_gnn_tpu.models.foutnet import (
        FoutLayerParams,
        FoutNet,
        FoutNetParams,
    )
    from deeprank_gnn_tpu.models.sgat import SGATLayerParams, SGATParams, sGAT

    if isinstance(net, GINet):
        def conv(prefix):
            return GINetConvParams(
                fc_w=_g(sd, f"{prefix}.fc.weight"),
                fc_edge_w=_g(sd, f"{prefix}.fc_edge_attr.weight"),
                fc_att_w=_g(sd, f"{prefix}.fc_attention.weight"),
            )

        return GINetParams(
            conv1=conv("conv1"),
            conv2=conv("conv2"),
            conv1_ext=conv("conv1_ext"),
            conv2_ext=conv("conv2_ext"),
            fc1_w=_g(sd, "fc1.weight"),
            fc1_b=_g(sd, "fc1.bias"),
            fc2_w=_g(sd, "fc2.weight"),
            fc2_b=_g(sd, "fc2.bias"),
        )
    if isinstance(net, FoutNet):
        def layer(prefix):
            return FoutLayerParams(
                wc=_g(sd, f"{prefix}.Wc"),
                wn=_g(sd, f"{prefix}.Wn"),
                bias=_g(sd, f"{prefix}.bias"),
            )

        return FoutNetParams(
            conv1=layer("conv1"),
            conv2=layer("conv2"),
            fc1_w=_g(sd, "fc1.weight"),
            fc1_b=_g(sd, "fc1.bias"),
            fc2_w=_g(sd, "fc2.weight"),
            fc2_b=_g(sd, "fc2.bias"),
        )
    if isinstance(net, sGAT):
        def layer(prefix):
            return SGATLayerParams(
                weight=_g(sd, f"{prefix}.weight"),
                bias=_g(sd, f"{prefix}.bias"),
            )

        return SGATParams(
            conv1=layer("conv1"),
            conv2=layer("conv2"),
            fc1_w=_g(sd, "fc1.weight"),
            fc1_b=_g(sd, "fc1.bias"),
            fc2_w=_g(sd, "fc2.weight"),
            fc2_b=_g(sd, "fc2.bias"),
        )
    raise TypeError(f"Unknown net type {type(net)!r} for torch import")


def adam_state_from_torch(
    opt_sd: Dict[str, Any], params, flat: bool = False
):
    """Rebuild an optax.adam state from a torch Adam state dict
    (reference `NeuralNet.py:119` restores optimizer state on pretrained
    load). Torch parameter order == our pytree leaf order (dataclass
    fields mirror the torch module attribute order), so moments map by
    index. ``flat=True`` targets `optax.flatten(optax.adam(...))` —
    moments raveled into single vectors in leaf order (the engine's
    fused-update optimizer). Returns None when the state is
    empty/unusable."""
    try:
        import optax

        state = opt_sd.get("state", {})
        if not state:
            return None
        leaves, treedef = jax.tree_util.tree_flatten(params)
        if len(state) != len(leaves):
            return None
        mu, nu, counts = [], [], []
        for i, leaf in enumerate(leaves):
            s = state[i]
            m = np.asarray(s["exp_avg"].detach().cpu().numpy())
            v = np.asarray(s["exp_avg_sq"].detach().cpu().numpy())
            if m.shape != np.asarray(leaf).shape:
                return None
            mu.append(jnp.asarray(m))
            nu.append(jnp.asarray(v))
            step = s["step"]
            counts.append(
                int(step.item() if hasattr(step, "item") else step)
            )
        count = jnp.asarray(max(counts), dtype=jnp.int32)
        mu = jax.tree_util.tree_unflatten(treedef, mu)
        nu = jax.tree_util.tree_unflatten(treedef, nu)
        if flat:
            from jax.flatten_util import ravel_pytree

            mu = ravel_pytree(mu)[0]
            nu = ravel_pytree(nu)[0]
        adam_state = optax.ScaleByAdamState(count=count, mu=mu, nu=nu)
        return (adam_state, optax.EmptyState())
    except Exception:
        return None


def adapt_opt_state(restored, reference):
    """Coerce a checkpointed optimizer state onto the live optimizer's
    structure. Handles the legacy per-leaf Adam layout (checkpoints
    written before the engine switched to `optax.flatten`d Adam) by
    raveling the moment pytrees. Returns None when the state cannot be
    adapted (caller keeps the fresh init)."""
    ref_td = jax.tree_util.tree_structure(reference)

    def _as_ref(tree):
        if jax.tree_util.tree_structure(tree) == ref_td:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        return None

    try:
        out = _as_ref(restored)
        if out is not None:
            return out
        from jax.flatten_util import ravel_pytree

        inner = restored[0]
        flat = type(inner)(
            count=inner.count,
            mu=ravel_pytree(inner.mu)[0],
            nu=ravel_pytree(inner.nu)[0],
        )
        return _as_ref((flat,) + tuple(restored[1:]))
    except Exception:
        return None


def params_from_checkpoint(net, payload: Dict[str, Any]):
    """Model params pytree from either checkpoint flavor."""
    model_state = payload["model"]
    if payload.get("__format__") == "torch":
        return torch_state_dict_to_params(net, model_state)
    return jax.tree_util.tree_map(jnp.asarray, model_state)
