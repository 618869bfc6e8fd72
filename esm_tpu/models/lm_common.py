"""Shared pre-LN transformer stack for the ESM language models.

TPU-native design: per-layer parameters are stacked along a leading axis and the
stack is driven by ``lax.scan`` — one compiled layer body regardless of depth
(fast compiles, uniform sharding of the stacked weights). The reference instead
Python-loops over nn.ModuleList (esm/model/esm2.py:111-121).

Layer semantics match reference TransformerLayer (esm/modules.py:84-142):
pre-LN attention + residual, pre-LN GELU MLP + residual; optional per-head
attention maps.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import multihead_attention
from ..ops.common import (
    gelu_erf,
    init_layer_norm,
    init_linear,
    init_linear_torch_default,
    layer_norm,
    linear,
)


@dataclass(frozen=True)
class LayerStatic:
    """Static (trace-time) options of a transformer layer."""

    num_heads: int
    use_rotary: bool = True
    use_bias_kv: bool = False
    ln_eps: float = 1e-5            # ESM-1b/2 LayerNorm eps; ESM-1 uses 1e-12
    use_flash: bool = False
    # Rematerialize the layer body on the backward pass (training-memory
    # knob: activations are O(1) layers deep instead of O(num_layers);
    # matmul outputs stay saved per the dots_saveable policy).
    remat: bool = False
    # With remat: "dots" keeps matmul outputs (recompute is elementwise-only,
    # the throughput default); "full" saves NOTHING per layer — the backward
    # re-runs each layer body from its input, trading ~1/3 more FLOPs for
    # activation memory that is just the layer inputs. "full" is what lets
    # a 15B int8 frozen base fine-tune on one 16 GB chip (LoRA) and is the
    # right choice whenever weights, not compute, bound the batch.
    remat_policy: str = "dots"
    # Sequence parallelism: (Mesh, axis_name) shards the T axis over that
    # mesh axis and runs attention as a ring (parallel/ring_attention.py) —
    # the long-context mechanism replacing the reference's chunk/truncate
    # (SURVEY §5.7). Mesh is hashable, so this stays a valid static.
    ring: Optional[tuple] = None


def checkpoint_policy(name: str):
    """Map a LayerStatic.remat_policy name to a jax.checkpoint policy:
    "dots" keeps matmul outputs; "full" saves nothing (None)."""
    if name == "dots":
        return jax.checkpoint_policies.dots_saveable
    if name == "full":
        return None
    raise ValueError(f"unknown remat_policy {name!r} (use 'dots' or 'full')")


def transformer_layer_apply(
    params,
    x: jax.Array,
    *,
    static: LayerStatic,
    key_padding_mask: Optional[jax.Array] = None,
    need_head_weights: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """One pre-LN transformer block on (B, T, D) activations.

    Returns (x, attn_probs) with attn_probs (B, H, T, S) or None.
    """
    residual = x
    h = layer_norm(params["self_attn_layer_norm"], x, eps=static.ln_eps)
    attn_out, probs = multihead_attention(
        params["self_attn"],
        h,
        num_heads=static.num_heads,
        key_padding_mask=key_padding_mask,
        use_rotary=static.use_rotary,
        use_bias_kv=static.use_bias_kv,
        need_weights=need_head_weights,
        use_flash=static.use_flash,
        ring=static.ring,
    )
    x = residual + attn_out

    residual = x
    h = layer_norm(params["final_layer_norm"], x, eps=static.ln_eps)
    h = gelu_erf(linear(params["fc1"], h))
    h = linear(params["fc2"], h)
    x = residual + h
    return x, probs


def transformer_stack_apply(
    stacked_params,
    x: jax.Array,
    *,
    static: LayerStatic,
    key_padding_mask: Optional[jax.Array] = None,
    collect_hiddens: bool = False,
    collect_layer_ids: Optional[Tuple[int, ...]] = None,
    need_head_weights: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """Scan the layer body over stacked per-layer params.

    Returns (x, hiddens, attentions):
      hiddens:    (L, B, T, D) all layer outputs when collect_hiddens, or
                  (k, B, T, D) for the requested 1-based ``collect_layer_ids``
                  only (the memory-frugal path: the reference stores only the
                  repr_layers it was asked for, esm/model/esm2.py:117-118) —
                  None otherwise
      attentions: (L, B, H, T, S) per-head attention probabilities or None
    """
    selective = collect_layer_ids is not None and not collect_hiddens
    if selective:
        sel = jnp.asarray(collect_layer_ids, jnp.int32)
        buf0 = jnp.zeros((len(collect_layer_ids),) + x.shape, x.dtype)
        carry0 = (x, jnp.int32(0), buf0)
    else:
        carry0 = x

    layer_fn = partial(
        transformer_layer_apply,
        static=static,
        key_padding_mask=key_padding_mask,
        need_head_weights=need_head_weights,
    )
    if static.remat:
        # recompute the block in the backward pass instead of saving its
        # activations across the whole scan (jax.checkpoint inside lax.scan:
        # the standard TPU training-memory pattern); matmul results are kept
        # (dots_saveable) so the recompute is elementwise-only — unless
        # remat_policy="full", which saves nothing (minimum memory)
        layer_fn = jax.checkpoint(
            layer_fn, policy=checkpoint_policy(static.remat_policy)
        )

    def body(carry, layer_params):
        if selective:
            h_in, i, buf = carry
        else:
            h_in = carry
        h, probs = layer_fn(layer_params, h_in)
        ys = {}
        if collect_hiddens:
            ys["hidden"] = h
        if need_head_weights:
            ys["attn"] = probs
        if selective:
            match = sel == (i + 1)
            buf = jnp.where(match[:, None, None, None], h[None], buf)
            return (h, i + 1, buf), ys
        return h, ys

    out, ys = jax.lax.scan(body, carry0, stacked_params)
    if selective:
        x, _, buf = out
        return x, buf, ys.get("attn")
    return out, ys.get("hidden"), ys.get("attn")


def init_transformer_layer(
    key: jax.Array, embed_dim: int, ffn_dim: int, *, use_bias_kv: bool = False, dtype=jnp.float32
):
    """Init matching the reference (esm/multihead_attention.py:139-157: xavier
    with gain 1/sqrt(2) for q/k/v, xavier for out_proj; torch-default for FFN)."""
    import math

    keys = jax.random.split(key, 8)
    attn = {
        "q_proj": init_linear(keys[0], embed_dim, embed_dim, gain=1 / math.sqrt(2), dtype=dtype),
        "k_proj": init_linear(keys[1], embed_dim, embed_dim, gain=1 / math.sqrt(2), dtype=dtype),
        "v_proj": init_linear(keys[2], embed_dim, embed_dim, gain=1 / math.sqrt(2), dtype=dtype),
        "out_proj": init_linear(keys[3], embed_dim, embed_dim, dtype=dtype),
    }
    if use_bias_kv:
        attn["bias_k"] = jax.random.normal(keys[6], (embed_dim,), dtype) * (
            math.sqrt(2.0 / (embed_dim + 1))
        )
        attn["bias_v"] = jax.random.normal(keys[7], (embed_dim,), dtype) * (
            math.sqrt(2.0 / (embed_dim + 1))
        )
    return {
        "self_attn": attn,
        "self_attn_layer_norm": init_layer_norm(embed_dim, dtype),
        "fc1": init_linear_torch_default(keys[4], embed_dim, ffn_dim, dtype=dtype),
        "fc2": init_linear_torch_default(keys[5], ffn_dim, embed_dim, dtype=dtype),
        "final_layer_norm": init_layer_norm(embed_dim, dtype),
    }


def init_transformer_stack(
    key: jax.Array,
    num_layers: int,
    embed_dim: int,
    ffn_dim: int,
    *,
    use_bias_kv: bool = False,
    dtype=jnp.float32,
):
    """Stacked-layer init: each layer gets its own RNG stream, results stacked
    along axis 0 for lax.scan."""
    keys = jax.random.split(key, num_layers)
    layers = [
        init_transformer_layer(k, embed_dim, ffn_dim, use_bias_kv=use_bias_kv, dtype=dtype)
        for k in keys
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def normalize_repr_layers(repr_layers, num_layers: int):
    """Resolve negative layer indices against num_layers and dedupe/sort —
    the reference accepts e.g. ``repr_layers=[-1]`` (scripts/extract.py:87-90).
    Returns a hashable tuple usable as a static jit argument, or None."""
    if repr_layers is None:
        return None
    return tuple(sorted({
        (i if i >= 0 else num_layers + 1 + i) for i in repr_layers
    }))
