"""Axial (row/column) attention for MSA inputs.

Reference semantics: esm/axial_attention.py.
  * Row attention is *tied* across MSA rows: logits are summed over the row
    axis (einsum rinhd,rjnhd->hnij) with scaling head_dim^-0.5 / sqrt(R), and
    padded query positions are zeroed before the sum (they would otherwise
    pollute the shared map) — reference esm/axial_attention.py:36-99.
  * Column attention attends over rows independently per column
    (esm/axial_attention.py:182-222), with a degenerate 1-row shortcut.
  * Padding is excluded with an additive -10000 fill (NOT -inf; the reference
    uses -10000, and parity requires matching it: fully-padded columns then
    produce uniform rather than NaN probabilities).

Layout: batch-major (B, R, C, D) — the reference's (R, C, B, D) is a torch
broadcasting artifact. The O(R·C²) / O(C·R²) einsums here map directly onto
MXU contractions; the reference's chunked "_batched_forward" memory paths are
replaced by blockwise Pallas kernels at scale (see esm_tpu/kernels/).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .common import linear, softmax_fp32


def _heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, R, C, D) -> (B, R, C, H, Dh)."""
    b, r, c, d = x.shape
    return x.reshape(b, r, c, num_heads, d // num_heads)


def row_self_attention(
    params,
    x: jax.Array,
    *,
    num_heads: int,
    padding_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Tied row attention. x: (B, R, C, D); padding_mask: (B, R, C) bool.

    Returns (out (B,R,C,D), probs (B,H,C,C))."""
    b, r, c, d = x.shape
    head_dim = d // num_heads
    scaling = head_dim ** -0.5 / (r ** 0.5)

    q = _heads(linear(params["q_proj"], x), num_heads) * scaling
    k = _heads(linear(params["k_proj"], x), num_heads)

    if padding_mask is not None:
        q = q * (1.0 - padding_mask[..., None, None].astype(q.dtype))

    # Sum over rows AND head_dim: (B,H,C,C) shared attention map.
    w = jnp.einsum("brihd,brjhd->bhij", q, k)
    if padding_mask is not None:
        # Mask keys using the first row's padding pattern
        # (reference esm/axial_attention.py:93-97).
        w = jnp.where(padding_mask[:, 0][:, None, None, :], -10000.0, w)

    probs = softmax_fp32(w)
    v = _heads(linear(params["v_proj"], x), num_heads)
    ctx = jnp.einsum("bhij,brjhd->brihd", probs.astype(v.dtype), v)
    out = linear(params["out_proj"], ctx.reshape(b, r, c, d))
    return out, probs


def column_self_attention(
    params,
    x: jax.Array,
    *,
    num_heads: int,
    padding_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-column attention over rows. x: (B, R, C, D).

    Returns (out (B,R,C,D), probs (B,H,C,R,R))."""
    b, r, c, d = x.shape
    head_dim = d // num_heads

    if r == 1:
        # Single row: attention is identity over the row axis
        # (reference esm/axial_attention.py:189-200).
        probs = jnp.ones((b, num_heads, c, 1, 1), dtype=x.dtype)
        out = linear(params["out_proj"], linear(params["v_proj"], x))
        return out, probs

    scaling = head_dim ** -0.5
    q = _heads(linear(params["q_proj"], x), num_heads) * scaling
    k = _heads(linear(params["k_proj"], x), num_heads)
    v = _heads(linear(params["v_proj"], x), num_heads)

    # (B, H, C, R_query, R_key)
    w = jnp.einsum("bichd,bjchd->bhcij", q, k)
    if padding_mask is not None:
        keys_padded = jnp.transpose(padding_mask, (0, 2, 1))  # (B, C, R)
        w = jnp.where(keys_padded[:, None, :, None, :], -10000.0, w)

    probs = softmax_fp32(w)
    ctx = jnp.einsum("bhcij,bjchd->bichd", probs.astype(v.dtype), v)
    out = linear(params["out_proj"], ctx.reshape(b, r, c, d))
    return out, probs
