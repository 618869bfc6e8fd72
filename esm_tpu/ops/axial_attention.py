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
    max_rows_per_chunk: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Tied row attention. x: (B, R, C, D); padding_mask: (B, R, C) bool.

    ``max_rows_per_chunk`` bounds memory like the reference's chunked
    inference path (esm/axial_attention.py:40-69): the row-summed logits are
    accumulated over row blocks (numerically identical — the sum over rows
    commutes with the softmax that follows).

    Returns (out (B,R,C,D), probs (B,H,C,C))."""
    b, r, c, d = x.shape
    head_dim = d // num_heads
    scaling = head_dim ** -0.5 / (r ** 0.5)

    def chunk_logits(x_rows, mask_rows):
        q = _heads(linear(params["q_proj"], x_rows), num_heads) * scaling
        k = _heads(linear(params["k_proj"], x_rows), num_heads)
        if mask_rows is not None:
            q = q * (1.0 - mask_rows[..., None, None].astype(q.dtype))
        return jnp.einsum("brihd,brjhd->bhij", q, k)

    if max_rows_per_chunk is None or max_rows_per_chunk >= r:
        w = chunk_logits(x, padding_mask)
    else:
        ck = max_rows_per_chunk
        pad = (-r) % ck
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mp = (
            jnp.pad(padding_mask, ((0, 0), (0, pad), (0, 0)), constant_values=True)
            if padding_mask is not None
            else jnp.pad(
                jnp.zeros((b, r, c), bool), ((0, 0), (0, pad), (0, 0)),
                constant_values=True,
            )
        )
        nc = (r + pad) // ck
        xp = xp.reshape(b, nc, ck, c, d).transpose(1, 0, 2, 3, 4)
        mp = mp.reshape(b, nc, ck, c).transpose(1, 0, 2, 3)
        ws = jax.lax.map(lambda args: chunk_logits(*args), (xp, mp))
        w = jnp.sum(ws, axis=0)
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
    max_cols_per_chunk: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-column attention over rows. x: (B, R, C, D).

    ``max_cols_per_chunk`` bounds memory (columns are independent — the
    reference chunks them the same way, esm/axial_attention.py:158-180).

    Returns (out (B,R,C,D), probs (B,H,C,R,R))."""
    b, r, c, d = x.shape
    head_dim = d // num_heads

    if max_cols_per_chunk is not None and max_cols_per_chunk < c and r > 1:
        ck = max_cols_per_chunk
        pad = (-c) % ck
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mp = (
            jnp.pad(padding_mask, ((0, 0), (0, 0), (0, pad)), constant_values=True)
            if padding_mask is not None
            else None
        )
        nc = (c + pad) // ck
        xp = xp.reshape(b, r, nc, ck, d).transpose(2, 0, 1, 3, 4)
        if mp is not None:
            mp = mp.reshape(b, r, nc, ck).transpose(2, 0, 1, 3)
            outs, probs = jax.lax.map(
                lambda args: column_self_attention(
                    params, args[0], num_heads=num_heads, padding_mask=args[1]
                ),
                (xp, mp),
            )
        else:
            outs, probs = jax.lax.map(
                lambda xc: column_self_attention(params, xc, num_heads=num_heads),
                xp,
            )
        out = outs.transpose(1, 2, 0, 3, 4).reshape(b, r, c + pad, d)[:, :, :c]
        probs = probs.transpose(1, 2, 0, 3, 4, 5).reshape(
            b, num_heads, c + pad, r, r
        )[:, :, :c]
        return out, probs

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
