"""Seq2seq transformer for inverse folding (JAX).

Reference semantics: esm/inverse_folding/transformer_layer.py (post-attn
pre-LN encoder layer with ReLU FFN; decoder layer with causal self-attention
and static-kv cross-attention) and transformer_decoder.py (sinusoidal
positions, future mask, untied no-bias output projection).

TPU-first decode: the reference's per-step python loop with fairseq
incremental-state dicts (esm/multihead_attention.py:231-323) becomes a
lax.scan over positions with a fixed-size functional KV cache.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.common import layer_norm, linear, softmax_fp32
from ...ops.positional import sinusoidal_positional_embedding


def _heads(x, h):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _unheads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _attend(q, k, v, *, bias=None, key_padding_mask=None):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if bias is not None:
        logits = logits + bias
    if key_padding_mask is not None:
        logits = jnp.where(
            key_padding_mask[:, None, None, :], -jnp.inf, logits
        )
    probs = softmax_fp32(logits)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def attention(
    params,
    query,
    key,
    value,
    *,
    num_heads: int,
    key_padding_mask=None,
    attn_mask=None,
):
    """Projected multi-head attention (fairseq layout: q scaled pre-rotation)."""
    d = query.shape[-1]
    head_dim = d // num_heads
    q = linear(params["q_proj"], query) * head_dim ** -0.5
    k = linear(params["k_proj"], key)
    v = linear(params["v_proj"], value)
    q, k, v = _heads(q, num_heads), _heads(k, num_heads), _heads(v, num_heads)
    bias = None
    if attn_mask is not None:
        bias = attn_mask[None, None]
    out = _attend(q, k, v, bias=bias, key_padding_mask=key_padding_mask)
    return linear(params["out_proj"], _unheads(out))


def encoder_layer_apply(params, x, *, num_heads: int, padding_mask=None):
    """(reference transformer_layer.py:61-111), batch-major (B, T, C)."""
    residual = x
    h = layer_norm(params["self_attn_layer_norm"], x)
    h = attention(
        params["self_attn"], h, h, h, num_heads=num_heads,
        key_padding_mask=padding_mask,
    )
    x = residual + h
    residual = x
    h = layer_norm(params["final_layer_norm"], x)
    h = jax.nn.relu(linear(params["fc1"], h))
    h = linear(params["fc2"], h)
    return residual + h


class DecoderCache(NamedTuple):
    """Fixed-size per-layer KV cache for incremental decoding."""
    self_k: jax.Array   # (layers, B, H, T_max, Dh)
    self_v: jax.Array
    cross_k: jax.Array  # (layers, B, H, S, Dh)
    cross_v: jax.Array
    # accumulated <pad> positions in the decode prefix: the reference's
    # incremental MultiheadAttention appends each step's key_padding_mask to
    # the cached one (multihead_attention.py:306-320), so cached pad keys
    # stay masked in later steps
    pad_mask: jax.Array  # (B, T_max) bool


def decoder_layer_apply(
    params,
    x,
    enc_out,
    *,
    num_heads: int,
    enc_padding_mask=None,
    self_attn_mask=None,
    self_attn_padding_mask=None,
):
    """Teacher-forcing path (full sequence) — reference transformer_layer.py:210-304."""
    residual = x
    h = layer_norm(params["self_attn_layer_norm"], x)
    h = attention(
        params["self_attn"], h, h, h, num_heads=num_heads,
        key_padding_mask=self_attn_padding_mask, attn_mask=self_attn_mask,
    )
    x = residual + h

    residual = x
    h = layer_norm(params["encoder_attn_layer_norm"], x)
    h = attention(
        params["encoder_attn"], h, enc_out, enc_out, num_heads=num_heads,
        key_padding_mask=enc_padding_mask,
    )
    x = residual + h

    residual = x
    h = layer_norm(params["final_layer_norm"], x)
    h = jax.nn.relu(linear(params["fc1"], h))
    h = linear(params["fc2"], h)
    return residual + h


def decoder_apply(
    params,
    prev_output_tokens: jax.Array,
    enc_out: jax.Array,
    *,
    num_heads: int,
    num_layers: int,
    padding_idx: int,
    enc_padding_mask=None,
    features_only: bool = False,
):
    """Teacher-forced decoder (reference transformer_decoder.py:92-210).
    Returns logits (B, V, T) like the reference (B x C x T layout)."""
    b, t = prev_output_tokens.shape
    embed_dim = params["embed_tokens"]["weight"].shape[-1]

    positions = sinusoidal_positional_embedding(
        prev_output_tokens, embed_dim, padding_idx
    )
    x = math.sqrt(embed_dim) * jnp.take(
        params["embed_tokens"]["weight"], prev_output_tokens, axis=0
    )
    x = x + positions

    self_attn_padding_mask = prev_output_tokens == padding_idx
    future = jnp.triu(jnp.full((t, t), -jnp.inf), 1)

    for i in range(num_layers):
        x = decoder_layer_apply(
            params["layers"][i],
            x,
            enc_out,
            num_heads=num_heads,
            enc_padding_mask=enc_padding_mask,
            self_attn_mask=future,
            self_attn_padding_mask=self_attn_padding_mask,
        )

    x = layer_norm(params["layer_norm"], x)
    if features_only:
        return x
    logits = linear(params["output_projection"], x)
    return jnp.swapaxes(logits, 1, 2)  # B x V x T


def init_decode_cache(
    params, enc_out, *, num_heads: int, num_layers: int, max_len: int,
    dtype=jnp.float32,
) -> DecoderCache:
    """Precompute static cross-attention K/V and allocate self-attn cache."""
    b, s, d = enc_out.shape
    head_dim = d // num_heads
    cross_k, cross_v = [], []
    for i in range(num_layers):
        lp = params["layers"][i]["encoder_attn"]
        cross_k.append(_heads(linear(lp["k_proj"], enc_out), num_heads))
        cross_v.append(_heads(linear(lp["v_proj"], enc_out), num_heads))
    return DecoderCache(
        self_k=jnp.zeros((num_layers, b, num_heads, max_len, head_dim), dtype),
        self_v=jnp.zeros((num_layers, b, num_heads, max_len, head_dim), dtype),
        cross_k=jnp.stack(cross_k),
        cross_v=jnp.stack(cross_v),
        pad_mask=jnp.zeros((b, max_len), bool),
    )


def decoder_step(
    params,
    token: jax.Array,        # (B,) current input token
    pos: jax.Array,          # scalar int32 position (0-based)
    cache: DecoderCache,
    *,
    num_heads: int,
    num_layers: int,
    padding_idx: int,
    enc_padding_mask=None,
) -> Tuple[jax.Array, DecoderCache]:
    """One incremental decode step. Returns (logits (B, V), new cache)."""
    b = token.shape[0]
    embed_dim = params["embed_tokens"]["weight"].shape[-1]
    head_dim = embed_dim // num_heads
    max_len = cache.self_k.shape[3]

    # sinusoidal position for a non-pad token at position `pos`
    from ...ops.positional import sinusoidal_table

    table = sinusoidal_table(padding_idx + 1 + max_len, embed_dim, padding_idx)
    # <pad> inputs (e.g. non-target chains in complex sampling) take the
    # padding_idx row like the reference's make_positions
    # (esm/modules.py:278-282), not a real position
    is_pad = token == padding_idx
    position = jnp.where(
        is_pad[:, None], table[padding_idx][None], table[padding_idx + 1 + pos][None]
    )

    x = math.sqrt(embed_dim) * jnp.take(
        params["embed_tokens"]["weight"], token, axis=0
    )
    x = x + position
    x = x[:, None, :]  # (B, 1, C)

    new_self_k = cache.self_k
    new_self_v = cache.self_v
    pad_mask = cache.pad_mask.at[:, pos].set(is_pad)
    # mask cached positions > pos (not yet filled) and cached pad positions
    idx = jnp.arange(max_len)
    kp_mask = (idx[None, :] > pos) | pad_mask

    for i in range(num_layers):
        lp = params["layers"][i]
        residual = x
        h = layer_norm(lp["self_attn_layer_norm"], x)
        q = linear(lp["self_attn"]["q_proj"], h) * head_dim ** -0.5
        k_new = linear(lp["self_attn"]["k_proj"], h)
        v_new = linear(lp["self_attn"]["v_proj"], h)
        new_self_k = new_self_k.at[i, :, :, pos, :].set(
            _heads(k_new, num_heads)[:, :, 0]
        )
        new_self_v = new_self_v.at[i, :, :, pos, :].set(
            _heads(v_new, num_heads)[:, :, 0]
        )
        out = _attend(
            _heads(q, num_heads),
            new_self_k[i],
            new_self_v[i],
            key_padding_mask=jnp.broadcast_to(kp_mask, (b, max_len)),
        )
        x = residual + linear(lp["self_attn"]["out_proj"], _unheads(out))

        residual = x
        h = layer_norm(lp["encoder_attn_layer_norm"], x)
        q = linear(lp["encoder_attn"]["q_proj"], h) * head_dim ** -0.5
        out = _attend(
            _heads(q, num_heads),
            cache.cross_k[i],
            cache.cross_v[i],
            key_padding_mask=enc_padding_mask,
        )
        x = residual + linear(lp["encoder_attn"]["out_proj"], _unheads(out))

        residual = x
        h = layer_norm(lp["final_layer_norm"], x)
        h = jax.nn.relu(linear(lp["fc1"], h))
        x = residual + linear(lp["fc2"], h)

    x = layer_norm(params["layer_norm"], x)
    logits = linear(params["output_projection"], x)[:, 0]
    return logits, DecoderCache(
        new_self_k, new_self_v, cache.cross_k, cache.cross_v, pad_mask
    )
