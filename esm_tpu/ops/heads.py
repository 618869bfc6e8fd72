"""Output heads: masked-LM head and contact prediction head.

Reference semantics: esm/modules.py:298-357.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .common import apc, gelu_erf, layer_norm, linear, symmetrize


def roberta_lm_head(params, features: jax.Array, embed_weight: jax.Array) -> jax.Array:
    """dense -> GELU -> LN -> tied-weight projection + bias
    (reference RobertaLMHead, esm/modules.py:298-314).

    params: {"dense": linear, "layer_norm": LN, "bias": (vocab,)}
    embed_weight: (vocab, D) tied embedding matrix.
    """
    x = linear(params["dense"], features)
    x = gelu_erf(x)
    x = layer_norm(params["layer_norm"], x)
    x = jnp.dot(x, embed_weight.astype(x.dtype).T) + params["bias"].astype(x.dtype)
    return x


def contact_head(
    params,
    tokens: jax.Array,
    attentions: jax.Array,
    *,
    prepend_bos: bool,
    append_eos: bool,
    eos_idx: Optional[int] = None,
) -> jax.Array:
    """Logistic regression over symmetrized+APC'd attention maps
    (reference ContactPredictionHead, esm/modules.py:317-357).

    tokens: (B, T) int array.
    attentions: (B, L, H, T, T) stacked per-layer per-head attention maps.
    params: {"regression": linear with kernel (L*H, 1)}.
    Returns (B, T', T') contact probabilities with bos/eos stripped.
    """
    if append_eos:
        if eos_idx is None:
            raise ValueError("Using an alphabet with eos token, but no eos token was passed in.")
        eos_mask = (tokens != eos_idx).astype(attentions.dtype)
        eos_mask = eos_mask[:, None, :] * eos_mask[:, :, None]
        attentions = attentions * eos_mask[:, None, None, :, :]
        attentions = attentions[..., :-1, :-1]
    if prepend_bos:
        attentions = attentions[..., 1:, 1:]

    b, layers, heads, seqlen, _ = attentions.shape
    attentions = attentions.reshape(b, layers * heads, seqlen, seqlen)
    attentions = apc(symmetrize(attentions))
    attentions = attentions.transpose(0, 2, 3, 1)  # B x T x T x (L*H)
    logits = linear(params["regression"], attentions)[..., 0]
    return jax.nn.sigmoid(logits)
