"""Rotary position embeddings (RoFormer / GPT-NeoX style).

Reference semantics: esm/rotary_embedding.py — inv_freq = 1/10000^(2i/d), the
frequency vector is concatenated with itself (cos/sin tables of width d), and
``rotate_half`` swaps the two halves of the head dim. Applied to q and k over
the full head dimension.

Here the tables are pure functions of (seq_len, dim) — under jit both are
static, so XLA constant-folds the table computation; no mutable cache needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rotary_tables(seq_len: int, dim: int, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Return (cos, sin) tables of shape (seq_len, dim)."""
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (T, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (T, dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding. x: (..., T, dim); cos/sin: (T, dim)."""
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return x * cos + rotate_half(x) * sin

