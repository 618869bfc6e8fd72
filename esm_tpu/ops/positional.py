"""Positional embeddings (learned and sinusoidal).

Reference semantics: esm/modules.py:224-295. Both schemes derive positions from
the token array itself, offset by padding_idx (a fairseq convention baked into
the checkpoints — position ids start at padding_idx + 1 and padded slots get
position padding_idx).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def learned_positions(tokens: jax.Array, padding_idx: int) -> jax.Array:
    """Position ids = cumsum of the non-pad mask + padding_idx; pads -> padding_idx
    (reference esm/modules.py:240-257)."""
    mask = (tokens != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def learned_positional_embedding(
    params, tokens: jax.Array, padding_idx: int, max_positions: int
) -> jax.Array:
    """params: {"weight": (max_positions + padding_idx + 1, D)}.

    The reference raises if seq_len > max_positions (esm/modules.py:242-245);
    here shapes are static under jit so we check at trace time.
    """
    if tokens.shape[1] > max_positions:
        raise ValueError(
            f"Sequence length {tokens.shape[1]} above maximum sequence length "
            f"of {max_positions}"
        )
    positions = learned_positions(tokens, padding_idx)
    return jnp.take(params["weight"], positions, axis=0)


def sinusoidal_table(num_embeddings: int, embed_dim: int, padding_idx: int) -> jax.Array:
    """Sinusoidal table with fairseq layout: [sin | cos] halves, zero row at
    padding_idx (reference esm/modules.py:284-295)."""
    half_dim = embed_dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = jnp.arange(num_embeddings, dtype=jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1).reshape(num_embeddings, -1)
    if embed_dim % 2 == 1:
        emb = jnp.concatenate([emb, jnp.zeros((num_embeddings, 1))], axis=1)
    emb = emb.at[padding_idx, :].set(0.0)
    return emb


def sinusoidal_positional_embedding(
    tokens: jax.Array, embed_dim: int, padding_idx: int
) -> jax.Array:
    """Stateless sinusoidal positional embedding (reference esm/modules.py:260-295).

    Positions are padding_idx + 1 + arange(T) for non-pad tokens, padding_idx
    at pads (reference make_positions, esm/modules.py:278-282 — note the
    reference multiplies a *range* buffer by the mask, so position ids are
    index-based, not cumsum-based, unlike the learned variant).
    """
    bsz, seq_len = tokens.shape
    max_pos = padding_idx + 1 + seq_len
    table = sinusoidal_table(max_pos, embed_dim, padding_idx)
    mask = tokens != padding_idx
    range_buf = jnp.arange(seq_len, dtype=jnp.int32)[None, :] + padding_idx + 1
    positions = jnp.where(mask, range_buf, padding_idx)
    return jnp.take(table, positions, axis=0)
