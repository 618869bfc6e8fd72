"""ESMFold trunk building blocks (JAX).

Reference semantics: esm/esmfold/v1/misc.py:150-309 (gated Attention,
SequenceToPair, PairToSequence, ResidueMLP), esm/esmfold/v1/trunk.py:75-107
(RelativePosition), esm/esmfold/v1/tri_self_attn_block.py:25-160
(TriangularSelfAttentionBlock).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.common import layer_norm, linear, softmax_fp32
from ...ops.triangle import triangle_attention, triangle_multiplicative_update


def gated_attention(
    params,
    x: jax.Array,
    *,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Gated self-attention with external pairwise bias
    (reference esm/esmfold/v1/misc.py:150-211).

    x: (B, L, C); mask: (B, L) 1=valid; bias: (B, Lq, Lk, H).
    params: {"proj": (C, 3C) no-bias linear, "o_proj", "g_proj" (if gated)}.
    """
    b, l, c = x.shape
    head_width = c // num_heads
    t = linear(params["proj"], x).reshape(b, l, num_heads, 3 * head_width)
    t = t.transpose(0, 2, 1, 3)  # (B, H, L, 3w)
    q, k, v = jnp.split(t, 3, axis=-1)

    q = q * head_width ** -0.5
    a = jnp.einsum("bhqc,bhkc->bhqk", q, k)
    if bias is not None:
        a = a + jnp.transpose(bias, (0, 3, 1, 2)).astype(a.dtype)
    if mask is not None:
        a = jnp.where(mask[:, None, None, :].astype(bool), a, -jnp.inf)
    a = softmax_fp32(a)

    y = jnp.einsum("bhqk,bhkc->bqhc", a, v).reshape(b, l, c)
    if "g_proj" in params:
        y = jax.nn.sigmoid(linear(params["g_proj"], x)) * y
    return linear(params["o_proj"], y)


def sequence_to_pair(params, s: jax.Array) -> jax.Array:
    """(B, L, C_s) -> (B, L, L, C_z) via outer product/difference
    (reference esm/esmfold/v1/misc.py:237-272)."""
    s = layer_norm(params["layernorm"], s)
    s = linear(params["proj"], s)
    q, k = jnp.split(s, 2, axis=-1)
    prod = q[:, None, :, :] * k[:, :, None, :]
    diff = q[:, None, :, :] - k[:, :, None, :]
    x = jnp.concatenate([prod, diff], axis=-1)
    return linear(params["o_proj"], x)


def pair_to_sequence(params, z: jax.Array) -> jax.Array:
    """(B, L, L, C_z) -> (B, L, L, H) attention bias
    (reference esm/esmfold/v1/misc.py:275-293)."""
    z = layer_norm(params["layernorm"], z)
    return linear(params["linear"], z)


def residue_mlp(params, x: jax.Array) -> jax.Array:
    """LN -> linear -> ReLU -> linear, residual
    (reference esm/esmfold/v1/misc.py:296-309)."""
    h = layer_norm(params["norm"], x)
    h = linear(params["fc1"], h)
    h = jax.nn.relu(h)
    h = linear(params["fc2"], h)
    return x + h


def relative_position(
    params, residue_index: jax.Array, mask: Optional[jax.Array] = None, *, bins: int = 32
) -> jax.Array:
    """Clamped relative-position pair embedding, slot 0 reserved for masked
    pairs (reference esm/esmfold/v1/trunk.py:75-107)."""
    diff = residue_index[:, None, :] - residue_index[:, :, None]
    diff = jnp.clip(diff, -bins, bins) + bins + 1
    if mask is not None:
        pair_mask = mask[:, None, :] * mask[:, :, None]
        diff = jnp.where(pair_mask.astype(bool), diff, 0)
    return jnp.take(params["embedding"]["weight"], diff, axis=0)


def triangular_self_attention_block(
    params,
    s: jax.Array,
    z: jax.Array,
    *,
    seq_heads: int,
    pair_heads: int,
    mask: Optional[jax.Array] = None,
    chunk_size: Optional[int] = None,
    use_flash_tri: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One trunk block (reference esm/esmfold/v1/tri_self_attn_block.py:106-160):
    pair->seq bias, gated seq attention, seq MLP; seq->pair outer update,
    tri-mul out/in, tri-attn start/end, pair MLP. Inference-mode (dropout=0).

    s: (B, L, C_s); z: (B, L, L, C_z); mask: (B, L).
    """
    bias = pair_to_sequence(params["pair_to_sequence"], z)

    y = layer_norm(params["layernorm_1"], s)
    y = gated_attention(
        params["seq_attention"], y, num_heads=seq_heads, mask=mask, bias=bias
    )
    s = s + y
    s = residue_mlp(params["mlp_seq"], s)

    z = z + sequence_to_pair(params["sequence_to_pair"], s)

    tri_mask = None
    if mask is not None:
        tri_mask = (mask[:, :, None] * mask[:, None, :]).astype(z.dtype)
    # Tri-mul stays on the XLA path: the fused stage kernels
    # (ops.triangle.triangle_multiplicative_update_fused) measure equal-or-worse
    # on the tunneled chip — its effective HBM bandwidth (~240 GB/s measured)
    # and per-dispatch overhead make XLA's own fusion already optimal here.
    z = z + triangle_multiplicative_update(
        params["tri_mul_out"], z, outgoing=True, mask=tri_mask
    )
    z = z + triangle_multiplicative_update(
        params["tri_mul_in"], z, outgoing=False, mask=tri_mask
    )
    z = z + triangle_attention(
        params["tri_att_start"], z, num_heads=pair_heads, starting=True,
        mask=tri_mask, chunk_size=chunk_size, use_flash=use_flash_tri,
    )
    z = z + triangle_attention(
        params["tri_att_end"], z, num_heads=pair_heads, starting=False,
        mask=tri_mask, chunk_size=chunk_size, use_flash=use_flash_tri,
    )
    z = residue_mlp(params["mlp_pair"], z)
    return s, z
