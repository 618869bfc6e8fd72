"""Fused triangle-attention kernel (Pallas).

The XLA path in ops/triangle.py materializes (B, I, H, Jq, Jk) logits —
O(L³·H) — and needs row chunking at long L. This kernel fuses
logits + mask bias + triangle bias + softmax + PV per (row-block, head):
nothing bigger than a (rows_block, J, J) tile ever exists, in VMEM.

Layout: q/k/v (B, I, H, J, d) with d = pairwise head width (32); the
triangle bias (B, H, Jq, Jk) is shared across rows I (reference semantics:
openfold TriangleAttention; esm/esmfold/v1/tri_self_attn_block.py:66-77);
the key mask enters as an fp32 additive row bias (B, I, Jk).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, tri_ref, maskb_ref, o_ref):
    """Grid (B, H, I) — I innermost so the (J, J) triangle-bias tile, whose
    index depends only on (b, h), stays resident in VMEM across all rows
    instead of being re-fetched every step. Blocks:
    q/k/v: (1, 1, 1, J, d); tri: (1, 1, J, J); maskb: (1, 1, 1, J);
    o: (1, 1, 1, J, d)."""
    q = q_ref[0, 0, 0]                        # (J, d)
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # (Jq, Jk)
    s = s + tri_ref[0, 0]                      # (Jq, Jk) triangle bias
    s = s + maskb_ref[0, 0, 0][None, :]        # (Jk,) key-mask bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0, 0] = (pv / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def triangle_attention_fused(
    q: jax.Array,          # (B, I, H, J, d)
    k: jax.Array,
    v: jax.Array,
    tri_bias: jax.Array,   # (B, H, Jq, Jk) fp32
    mask_bias: jax.Array,  # (B, I, Jk) fp32 additive (0 / -1e30)
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns (B, I, H, J, d) in q's dtype."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, i, h, j, d = q.shape
    mask_bias = mask_bias[:, :, None, :]  # (B, I, 1, Jk) for 4D blocking

    return pl.pallas_call(
        _kernel,
        grid=(b, h, i),
        in_specs=[
            pl.BlockSpec((1, 1, 1, j, d), lambda bb, hh, ii: (bb, ii, hh, 0, 0)),
            pl.BlockSpec((1, 1, 1, j, d), lambda bb, hh, ii: (bb, ii, hh, 0, 0)),
            pl.BlockSpec((1, 1, 1, j, d), lambda bb, hh, ii: (bb, ii, hh, 0, 0)),
            pl.BlockSpec((1, 1, j, j), lambda bb, hh, ii: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, 1, j), lambda bb, hh, ii: (bb, ii, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, j, d), lambda bb, hh, ii: (bb, ii, hh, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * i * h * j * j * d,
            bytes_accessed=(3 * b * i * h * j * d + b * h * j * j)
            * q.dtype.itemsize,
            transcendentals=b * i * h * j * j,
        ),
    )(q, k, v, tri_bias, mask_bias)
