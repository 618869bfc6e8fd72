"""Output heads: masked-LM head and contact prediction head.

Reference semantics: esm/modules.py:298-357.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .common import gelu_erf, layer_norm, linear, materialize_kernel


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


def weighted_apc_symmetrize(a: jax.Array, w: jax.Array) -> jax.Array:
    """Σ_k w_k·apc(symmetrize(a_k)) for an fp32 (B, K, T, T) map stack,
    restructured by linearity (same math as the reference's
    stack-transpose-regress, esm/modules.py:27-41,338-357): contract the K
    axis first, then apply apc's rank-1 correction from per-map row/col sums
    — three reads of the stack, zero full-size intermediates. The single
    source of this formula; the streaming in-scan contact path
    (models/esm2.py) accumulates one per-layer call per scan step."""
    raw = jnp.einsum("bkij,k->bij", a, w)
    row = jnp.sum(a, axis=-1)                            # (B, K, T)
    col = jnp.sum(a, axis=-2)
    r = row + col                                        # rowsum of sym
    s = 2.0 * jnp.sum(row, axis=-1)                      # total of sym
    w_over_s = jnp.where(s == 0.0, 0.0, w[None, :] / s)  # (B, K)
    corr = jnp.einsum("bk,bki,bkj->bij", w_over_s, r, r)
    return raw + jnp.swapaxes(raw, -1, -2) - corr


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
    a = attentions.reshape(b, layers * heads, seqlen, seqlen)
    w = materialize_kernel(params["regression"], jnp.float32)[:, 0]  # (L*H,)
    logits = weighted_apc_symmetrize(a.astype(jnp.float32), w)
    bias = params["regression"].get("bias")
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)[0]
    return jax.nn.sigmoid(logits)
