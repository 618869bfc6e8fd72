"""MSA Transformer (TPU-native).

Reference semantics: esm/model/msa_transformer.py — 3-D B×R×C inputs, learned
per-row positional embedding, optional 1024-row MSA position embedding, 12
axial transformer layers (tied row attention + column attention + FFN, each a
pre-LN residual block — reference esm/modules.py:145-221,360-418), final LN,
tied LM head; contacts from stacked row attentions.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.alphabet import Alphabet
from ..ops.axial_attention import column_self_attention, row_self_attention
from ..ops.common import (
    gelu_erf,
    init_embedding,
    init_layer_norm,
    init_linear,
    init_linear_torch_default,
    layer_norm,
    linear,
)
from ..ops.heads import contact_head, roberta_lm_head
from ..ops.positional import learned_positional_embedding
from .lm_common import normalize_repr_layers


@dataclass(frozen=True)
class MSATransformerConfig:
    num_layers: int = 12
    embed_dim: int = 768
    ffn_embed_dim: int = 3072
    attention_heads: int = 12
    max_positions: int = 1024
    embed_positions_msa: bool = True
    # Auto-chunk the axial attentions when R*C exceeds this (reference
    # max_tokens_per_msa, esm/model/msa_transformer.py:229-238). Shapes are
    # static under jit, so chunk sizes resolve at trace time.
    max_tokens_per_msa: int = 2 ** 14
    # Alphabet-derived (msa_transformer alphabet)
    alphabet_size: int = 33
    padding_idx: int = 1
    mask_idx: int = 32
    cls_idx: int = 0
    eos_idx: int = 2
    prepend_bos: bool = True
    append_eos: bool = False
    # Execution
    compute_dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_alphabet(cls, alphabet: Alphabet, **kw) -> "MSATransformerConfig":
        return cls(
            alphabet_size=len(alphabet),
            padding_idx=alphabet.padding_idx,
            mask_idx=alphabet.mask_idx,
            cls_idx=alphabet.cls_idx,
            eos_idx=alphabet.eos_idx,
            prepend_bos=alphabet.prepend_bos,
            append_eos=alphabet.append_eos,
            **kw,
        )


def _init_axial_attn(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q_proj": init_linear_torch_default(ks[0], d, d, dtype=dtype),
        "k_proj": init_linear_torch_default(ks[1], d, d, dtype=dtype),
        "v_proj": init_linear_torch_default(ks[2], d, d, dtype=dtype),
        "out_proj": init_linear_torch_default(ks[3], d, d, dtype=dtype),
    }


def init(key: jax.Array, cfg: MSATransformerConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers + 5)
    d = cfg.embed_dim

    def init_layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "row_self_attention": {
                "layer": _init_axial_attn(k1, d, dtype),
                "layer_norm": init_layer_norm(d, dtype),
            },
            "column_self_attention": {
                "layer": _init_axial_attn(k2, d, dtype),
                "layer_norm": init_layer_norm(d, dtype),
            },
            "feed_forward_layer": {
                "layer": {
                    "fc1": init_linear_torch_default(k3, d, cfg.ffn_embed_dim, dtype=dtype),
                    "fc2": init_linear_torch_default(k4, cfg.ffn_embed_dim, d, dtype=dtype),
                },
                "layer_norm": init_layer_norm(d, dtype),
            },
        }

    layers = [init_layer(keys[i]) for i in range(cfg.num_layers)]
    params = {
        "embed_tokens": init_embedding(
            keys[-5], cfg.alphabet_size, d, padding_idx=cfg.padding_idx, dtype=dtype
        ),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers),
        "embed_positions": init_embedding(
            keys[-4], cfg.max_positions + cfg.padding_idx + 1, d,
            padding_idx=cfg.padding_idx, dtype=dtype,
        ),
        "emb_layer_norm_before": init_layer_norm(d, dtype),
        "emb_layer_norm_after": init_layer_norm(d, dtype),
        "lm_head": {
            "dense": init_linear_torch_default(keys[-3], d, d, dtype=dtype),
            "layer_norm": init_layer_norm(d, dtype),
            "bias": jnp.zeros((cfg.alphabet_size,), dtype),
        },
        "contact_head": {
            "regression": {
                "kernel": jnp.zeros((cfg.num_layers * cfg.attention_heads, 1), dtype),
                "bias": jnp.zeros((1,), dtype),
            }
        },
    }
    if cfg.embed_positions_msa:
        params["msa_position_embedding"] = 0.01 * jax.random.normal(
            keys[-2], (1024, 1, d), dtype
        )
    return params


def _axial_layer_apply(
    layer_params,
    x: jax.Array,
    *,
    num_heads: int,
    padding_mask: Optional[jax.Array],
    need_head_weights: bool,
    max_tokens_per_msa: int = 2 ** 14,
):
    """One AxialTransformerLayer: three pre-LN residual blocks
    (reference esm/modules.py:196-221,360-392)."""
    b, r, c, d = x.shape
    chunk_rows = max(1, max_tokens_per_msa // c) if r * c > max_tokens_per_msa else None
    chunk_cols = max(1, max_tokens_per_msa // r) if r * c > max_tokens_per_msa else None
    # Row attention block
    h = layer_norm(layer_params["row_self_attention"]["layer_norm"], x)
    h, row_probs = row_self_attention(
        layer_params["row_self_attention"]["layer"],
        h,
        num_heads=num_heads,
        padding_mask=padding_mask,
        max_rows_per_chunk=chunk_rows,
    )
    x = x + h
    # Column attention block
    h = layer_norm(layer_params["column_self_attention"]["layer_norm"], x)
    h, col_probs = column_self_attention(
        layer_params["column_self_attention"]["layer"],
        h,
        num_heads=num_heads,
        padding_mask=padding_mask,
        max_cols_per_chunk=chunk_cols,
    )
    x = x + h
    # FFN block
    ffn = layer_params["feed_forward_layer"]
    h = layer_norm(ffn["layer_norm"], x)
    h = gelu_erf(linear(ffn["layer"]["fc1"], h))
    h = linear(ffn["layer"]["fc2"], h)
    x = x + h
    if need_head_weights:
        return x, row_probs, col_probs
    return x, None, None


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "need_head_weights", "return_contacts", "return_representations",
        "repr_layers",
    ),
)
def apply(
    params,
    cfg: MSATransformerConfig,
    tokens: jax.Array,
    *,
    need_head_weights: bool = False,
    return_contacts: bool = False,
    return_representations: bool = False,
    repr_layers=None,
):
    """Forward pass. tokens: (B, R, C) int32.

    Returns {"logits", "representations" (L+1,B,R,C,D), "row_attentions"
    (B,L,H,C,C), "col_attentions" (B,L,H,C,R,R), "contacts"}."""
    if return_contacts:
        need_head_weights = True

    b, r, c = tokens.shape
    padding_mask = tokens == cfg.padding_idx  # (B, R, C)

    x = jnp.take(params["embed_tokens"]["weight"], tokens, axis=0)
    pos = learned_positional_embedding(
        params["embed_positions"],
        tokens.reshape(b * r, c),
        cfg.padding_idx,
        cfg.max_positions,
    ).reshape(x.shape)
    x = x + pos
    if "msa_position_embedding" in params:
        if r > 1024:
            raise ValueError(
                "Using model with MSA position embedding trained on maximum MSA "
                f"depth of 1024, but received {r} alignments."
            )
        x = x + params["msa_position_embedding"][None, :r]

    x = layer_norm(params["emb_layer_norm_before"], x)
    x = x * (1 - padding_mask[..., None].astype(x.dtype))
    x = x.astype(cfg.compute_dtype)
    h0 = x

    repr_layers = normalize_repr_layers(repr_layers, cfg.num_layers)
    mid_layers = (
        tuple(i for i in repr_layers if 1 <= i <= cfg.num_layers - 1)
        if (repr_layers is not None and not return_representations)
        else None
    )
    selective = mid_layers is not None
    if selective:
        sel = jnp.asarray(mid_layers, jnp.int32) if mid_layers else None
        buf0 = (
            jnp.zeros((len(mid_layers),) + x.shape, x.dtype) if mid_layers else None
        )
        carry0 = (x, jnp.int32(0), buf0)
    else:
        carry0 = x

    def body(carry, layer_params):
        if selective:
            h_in, li, buf = carry
        else:
            h_in = carry
        h, row_probs, col_probs = _axial_layer_apply(
            layer_params,
            h_in,
            num_heads=cfg.attention_heads,
            padding_mask=padding_mask,
            need_head_weights=need_head_weights,
            max_tokens_per_msa=cfg.max_tokens_per_msa,
        )
        ys = {}
        if return_representations:
            ys["hidden"] = h
        if need_head_weights:
            ys["row"] = row_probs
            ys["col"] = col_probs
        if selective:
            if buf is not None:
                match = sel == (li + 1)
                buf = jnp.where(match[:, None, None, None, None], h[None], buf)
            return (h, li + 1, buf), ys
        return h, ys

    out, ys = jax.lax.scan(body, carry0, params["layers"])
    if selective:
        x, _, sel_buf = out
    else:
        x = out

    x = layer_norm(params["emb_layer_norm_after"], x)

    result = {}
    if return_representations:
        hiddens = ys["hidden"]
        reps = jnp.concatenate([h0[None], hiddens[:-1], x[None].astype(hiddens.dtype)], axis=0)
        result["representations"] = reps
    elif repr_layers is not None:
        reps_dict = {lid: sel_buf[j] for j, lid in enumerate(mid_layers or ())}
        if 0 in repr_layers:
            reps_dict[0] = h0
        if cfg.num_layers in repr_layers:
            reps_dict[cfg.num_layers] = x  # post-final-LN
        result["representations"] = reps_dict

    result["logits"] = roberta_lm_head(
        params["lm_head"], x.astype(jnp.float32), params["embed_tokens"]["weight"]
    )

    if need_head_weights:
        # scan ys: row (L,B,H,C,C), col (L,B,H,C,R,R) -> batch-major stacks
        row_attentions = jnp.transpose(ys["row"], (1, 0, 2, 3, 4)).astype(jnp.float32)
        col_attentions = jnp.transpose(ys["col"], (1, 0, 2, 3, 4, 5)).astype(jnp.float32)
        result["row_attentions"] = row_attentions
        result["col_attentions"] = col_attentions
        if return_contacts:
            result["contacts"] = contact_head(
                params["contact_head"],
                tokens[:, 0, :],
                row_attentions,
                prepend_bos=cfg.prepend_bos,
                append_eos=cfg.append_eos,
                eos_idx=cfg.eos_idx,
            )
    return result


