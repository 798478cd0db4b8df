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
    import os

    if os.environ.get("DRGNN_NO_PALLAS"):
        return False
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


def _fused_ref_exact(xw: jax.Array, row: jax.Array, col: jax.Array) -> jax.Array:
    """fp32-faithful einsum path for TPU: the one-hots are exact in
    bf16, so contracting against the `_split3` terms of the data gives
    the exact fp32 result in three single-pass bf16 MXU contractions —
    and XLA still fuses the one-hot construction and neighbors into the
    loop (which a pallas_call boundary would prevent)."""
    s = xw.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
    col_oh = (col[..., None] == iota).astype(jnp.bfloat16)  # [G,E,S]
    row_oh = (row[..., None] == iota).astype(jnp.bfloat16)
    msg = sum(
        jnp.einsum("ges,gsf->gef", col_oh, h, preferred_element_type=jnp.float32)
        for h in _split3(xw)
    )
    return sum(
        jnp.einsum("ges,gef->gsf", row_oh, h, preferred_element_type=jnp.float32)
        for h in _split3(msg)
    )


def _split3(m):
    """Split an fp32 matrix into three bf16 terms with h1+h2+h3 == m to
    ~2^-24 relative: each bf16 carries 8 mantissa bits. A {0,1} one-hot
    is exact in bf16, so three single-pass bf16 MXU contractions against
    the split reproduce the fp32 contraction exactly (every product is
    exact; accumulation is fp32) — half the passes of Precision.HIGHEST
    (which must split BOTH operands)."""
    h1 = m.astype(jnp.bfloat16)
    r1 = m - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _fused_gather_impl(
    xw: jax.Array, row: jax.Array, col: jax.Array, exact: bool
) -> jax.Array:
    """Gather-for-col + one-hot-MXU-scatter-for-row: the message gather
    ``xw[g, col[g,e], :]`` is a plain aligned gather (cheap on the TPU
    VPU — no FLOPs, no one-hot materialization), and only the scatter
    side pays the one-hot contraction. Halves the one-hot builds and
    the MXU passes of the two-sided form."""
    g, s, f = xw.shape
    # sentinel col == s gathers the zero pad row
    padded = jnp.pad(xw, ((0, 0), (0, 1), (0, 0)))
    idx = jnp.clip(col, 0, s)[..., None]
    msg = jnp.take_along_axis(padded, jnp.broadcast_to(idx, col.shape + (f,)), axis=1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
    row_oh = (row[..., None] == iota).astype(jnp.bfloat16)
    if exact:
        return sum(
            jnp.einsum(
                "ges,gef->gsf", row_oh, h, preferred_element_type=jnp.float32
            )
            for h in _split3(msg)
        )
    return jnp.einsum(
        "ges,gef->gsf",
        row_oh.astype(msg.dtype),
        msg,
        preferred_element_type=msg.dtype,
    )


def _block_graphs(g: int, s: int, f: int, e: int) -> int:
    """Largest divisor of ``g`` (≤16) whose VMEM working set fits:
    amortizes per-grid-step overhead over several graphs."""
    import os

    forced = int(os.environ.get("DRGNN_FUSED_BLOCK", "0"))
    if forced and g % forced == 0:
        return forced
    budget = 12 * 1024 * 1024
    b = 1
    for cand in (16, 8, 4, 2):
        need = cand * (2 * s * f * 4 + 2 * e * 4) + 2 * e * s * 4
        if g % cand == 0 and need <= budget:
            b = cand
            break
    return b


def _fused_pallas(
    xw: jax.Array, row: jax.Array, col: jax.Array, exact: bool = False
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, s, f = xw.shape
    e = row.shape[1]
    b = _block_graphs(g, s, f, e)

    def kernel(xw_ref, row_ref, col_ref, out_ref):
        i = pl.program_id(0)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (e, s), 1)
        # unrolled over the graph block: Mosaic pipelines the per-graph
        # MXU contractions, amortizing grid-step overhead ~b-fold
        for k in range(b):
            xw_g = xw_ref[k]  # [S, F]
            row_g = row_ref[i * b + k]  # [E] (row/col live whole in
            col_g = col_ref[i * b + k]  # VMEM: (8,128) tiling rule)
            if exact:
                oh_t = jnp.bfloat16
                col_oh = (col_g[:, None] == iota_s).astype(oh_t)
                msg = sum(
                    jnp.dot(col_oh, h, preferred_element_type=jnp.float32)
                    for h in _split3(xw_g)
                )
                row_oh = (row_g[:, None] == iota_s).astype(oh_t)
                out_ref[k] = sum(
                    jax.lax.dot_general(
                        row_oh,
                        h,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for h in _split3(msg)
                )
            else:
                col_oh = (col_g[:, None] == iota_s).astype(xw_g.dtype)
                msg = jnp.dot(col_oh, xw_g, preferred_element_type=xw_g.dtype)
                row_oh = (row_g[:, None] == iota_s).astype(xw_g.dtype)
                out_ref[k] = jax.lax.dot_general(
                    row_oh,
                    msg,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=xw_g.dtype,
                )

    return pl.pallas_call(
        kernel,
        grid=(g // b,),
        in_specs=[
            pl.BlockSpec((b, s, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b, s, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, s, f), xw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(6 if exact else 2) * 2 * g * e * s * f,
            bytes_accessed=g * (s * f * 8 + e * 8),
            transcendentals=0,
        ),
    )(xw, row, col)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_gin_conv(
    xw: jax.Array, row: jax.Array, col: jax.Array, exact: bool = True
) -> jax.Array:
    """segment_sum(xw[col], row) per graph. [G,S,F] x [G,E] -> [G,S,F].

    Sentinel indices (== S) drop out (all-zero one-hot row/col).

    ``exact=True`` (default) reproduces the fp32 scatter bit-faithfully
    via three bf16 MXU passes per contraction (`_split3`);
    ``exact=False`` runs a single bf16 pass (~2x faster, operands
    rounded to 8 mantissa bits — fp32 accumulation either way).
    """
    if _is_tpu_backend():
        import os

        impl = os.environ.get("DRGNN_FUSED_IMPL")
        if impl == "pallas":
            return _fused_pallas(xw, row, col, exact)
        if impl == "gather":
            # gather-for-col variant: measured 130x SLOWER on v5e
            # (batched take_along_axis lowers to a serialized gather);
            # kept selectable as a record of the measurement
            # (scripts/ablate_fused.py)
            return _fused_gather_impl(xw, row, col, exact)
        # default: the two-sided one-hot einsum — XLA fuses the one-hot
        # build and adjacent elementwise ops across the contraction,
        # which a pallas_call boundary prevents; measured fastest at
        # step level on v5e (scripts/ablate_fused.py)
        return _fused_ref_exact(xw, row, col) if exact else _fused_ref(xw, row, col)
    return _fused_ref(xw, row, col)


def _fwd(xw, row, col, exact):
    return fused_gin_conv(xw, row, col, exact), (row, col)


def _bwd(exact, res, grad):
    row, col = res
    # z = R^T C x  =>  dx = C^T R g — the same contraction, swapped
    dxw = fused_gin_conv(grad, col, row, exact)
    return dxw, None, None


fused_gin_conv.defvjp(_fwd, _bwd)

__all__ = ["fused_gin_conv"]
