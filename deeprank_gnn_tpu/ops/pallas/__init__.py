"""Pallas TPU kernels for the message-passing hot path.

`fused_gin_conv` computes, per graph in a dense batch,
``z[n] = sum_{e: row[e]==n} xw[col[e]]`` — the GINet aggregation
(reference `ginet.py:57-71`, with the dead-attention quirk Q1 already
folded). The kernel builds both edge one-hot matrices in VMEM and runs
two MXU contractions per graph, so the [E, S] incidence never
materializes in HBM:

    col_oh = (col == iota_S)        # [E, S] in VMEM
    msg    = col_oh @ xw            # gather as matmul  (MXU)
    z      = row_oh^T @ msg         # scatter as matmul (MXU)

The backward pass is the same kernel with row/col swapped
(d xw = fused(g, col, row)), wired via custom_vjp.

On non-TPU backends the mathematically identical einsum fallback runs
(used by the CPU test suite; the golden tests pin dense == sparse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _is_tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _fused_ref(xw: jax.Array, row: jax.Array, col: jax.Array) -> jax.Array:
    """einsum fallback — identical math, any backend."""
    s = xw.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
    col_oh = (col[..., None] == iota).astype(xw.dtype)  # [G,E,S]
    row_oh = (row[..., None] == iota).astype(xw.dtype)
    msg = jnp.einsum(
        "ges,gsf->gef", col_oh, xw, preferred_element_type=xw.dtype
    )
    return jnp.einsum(
        "ges,gef->gsf", row_oh, msg, preferred_element_type=xw.dtype
    )


def _fused_pallas(xw: jax.Array, row: jax.Array, col: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, s, f = xw.shape
    e = row.shape[1]

    def kernel(xw_ref, row_ref, col_ref, out_ref):
        i = pl.program_id(0)
        xw_g = xw_ref[0]  # [S, F]
        row_g = row_ref[i]  # [E] (row/col live whole in VMEM: a [1, E]
        col_g = col_ref[i]  # block would violate the (8, 128) tiling rule)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (e, s), 1)
        col_oh = (col_g[:, None] == iota_s).astype(xw_g.dtype)
        msg = jnp.dot(col_oh, xw_g, preferred_element_type=xw_g.dtype)
        row_oh = (row_g[:, None] == iota_s).astype(xw_g.dtype)
        out_ref[0] = jax.lax.dot_general(
            row_oh,
            msg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=xw_g.dtype,
        )

    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, s, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, s, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, s, f), xw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * g * e * s * f,
            bytes_accessed=g * (s * f * 8 + e * 8),
            transcendentals=0,
        ),
    )(xw, row, col)


@jax.custom_vjp
def fused_gin_conv(xw: jax.Array, row: jax.Array, col: jax.Array) -> jax.Array:
    """segment_sum(xw[col], row) per graph. [G,S,F] x [G,E] -> [G,S,F].

    Sentinel indices (== S) drop out (all-zero one-hot row/col).
    """
    if _is_tpu_backend():
        return _fused_pallas(xw, row, col)
    return _fused_ref(xw, row, col)


def _fwd(xw, row, col):
    return fused_gin_conv(xw, row, col), (row, col)


def _bwd(res, grad):
    row, col = res
    # z = R^T C x  =>  dx = C^T R g — the same contraction, swapped
    dxw = fused_gin_conv(grad, col, row)
    return dxw, None, None


fused_gin_conv.defvjp(_fwd, _bwd)

__all__ = ["fused_gin_conv"]
