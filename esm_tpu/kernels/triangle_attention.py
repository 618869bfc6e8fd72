"""Fused triangle-attention kernel (Pallas).

The XLA path in ops/triangle.py materializes (B, I, H, Jq, Jk) logits —
O(L³·H) — and needs row chunking at long L. This kernel fuses
logits + mask bias + triangle bias + softmax + PV per (row, q-block):
nothing bigger than a (block_q, J) tile ever exists, in VMEM.

Layout: q/k/v are (B, I, H, d, J) with d = pairwise head width (32) on the
SUBLANE axis and the sequence J on the 128-lane axis. The obvious
(..., J, d) layout would put d=32 in the lane dimension, which XLA tiles as
T(8,128) — a 4× HBM pad (and 4× the HBM traffic) on every operand; with J
minor the tensors are tight. The triangle bias (B, H, Jq, Jk) is shared
across rows I (reference semantics: openfold TriangleAttention;
esm/esmfold/v1/tri_self_attn_block.py:66-77); the key mask enters as an fp32
additive row bias (B, I, Jk).

Grid (B, H, Q, I): the row axis I is innermost, so the (block_q, J)
triangle-bias strip — whose block index depends only on (b, h, q) — stays
VMEM-resident while every row streams through it. For J ≤ 1024 there is a
single q-block and the whole (J, J) bias tile is resident (the original
kernel's behavior); longer J runs multiple q-strips, keeping VMEM bounded by
~block_q·J·8B instead of J²·8B.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# J up to this bound runs as one resident q-block; beyond it q-strip blocking
# (block_q columns of queries at a time) keeps the VMEM working set bounded.
MAX_RESIDENT_J = 1024


def _kernel(q_ref, k_ref, v_ref, tri_ref, maskb_ref, o_ref):
    """One (b, h, q-block, i) step. Blocks: q/o (1, 1, 1, d, bq);
    k/v (1, 1, 1, d, J); tri (1, 1, bq, J); maskb (1, 1, 1, J)."""
    q = q_ref[0, 0, 0]                         # (d, bq)
    k = k_ref[0, 0, 0]                         # (d, J)
    v = v_ref[0, 0, 0]
    s = jax.lax.dot_general(
        q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # (bq, J)
    s = s + tri_ref[0, 0]                      # (bq, J) triangle-bias strip
    s = s + maskb_ref[0, 0, 0][None, :]        # (J,) key-mask bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)     # (bq, 1)
    pv = jax.lax.dot_general(
        v, p.astype(v.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # (d, bq)
    inv = 1.0 / jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0, 0] = (pv * inv[:, 0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _strips(q, k, v, tri_bias, mask_bias, block_q: int, interpret: bool):
    b, i, h, d, j = q.shape
    nq = j // block_q
    return pl.pallas_call(
        _kernel,
        grid=(b, h, nq, i),
        in_specs=[
            pl.BlockSpec((1, 1, 1, d, block_q), lambda bb, hh, qq, ii: (bb, ii, hh, 0, qq)),
            pl.BlockSpec((1, 1, 1, d, j), lambda bb, hh, qq, ii: (bb, ii, hh, 0, 0)),
            pl.BlockSpec((1, 1, 1, d, j), lambda bb, hh, qq, ii: (bb, ii, hh, 0, 0)),
            pl.BlockSpec((1, 1, block_q, j), lambda bb, hh, qq, ii: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, 1, j), lambda bb, hh, qq, ii: (bb, ii, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, d, block_q), lambda bb, hh, qq, ii: (bb, ii, hh, 0, qq)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * i * h * j * j * d,
            bytes_accessed=(3 * b * i * h * j * d + b * h * j * j)
            * q.dtype.itemsize,
            transcendentals=b * i * h * j * j,
        ),
    )(q, k, v, tri_bias, mask_bias)


@functools.partial(jax.jit, static_argnames=("interpret", "block_q"))
def triangle_attention_fused(
    q: jax.Array,          # (B, I, H, d, J)
    k: jax.Array,
    v: jax.Array,
    tri_bias: jax.Array,   # (B, H, Jq, Jk) fp32
    mask_bias: jax.Array,  # (B, I, Jk) fp32 additive (0 / -1e30)
    interpret: Optional[bool] = None,
    block_q: int = 512,
) -> jax.Array:
    """Returns (B, I, H, d, J) in q's dtype. Any J: when J > MAX_RESIDENT_J
    the J axis is zero-padded to a ``block_q`` multiple (padding masked out
    via ``mask_bias``) and queries run in strips of ``block_q``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, i, h, d, j = q.shape

    if j <= MAX_RESIDENT_J:
        return _strips(q, k, v, tri_bias, mask_bias[:, :, None, :], j, interpret)

    jp = ((j + block_q - 1) // block_q) * block_q
    if jp != j:
        pad = jp - j
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad)))
        tri_bias = jnp.pad(tri_bias, ((0, 0), (0, 0), (0, pad), (0, pad)))
        mask_bias = jnp.pad(
            mask_bias, ((0, 0), (0, 0), (0, pad)), constant_values=NEG_INF
        )
    out = _strips(q, k, v, tri_bias, mask_bias[:, :, None, :], block_q, interpret)
    return out[..., :j]
