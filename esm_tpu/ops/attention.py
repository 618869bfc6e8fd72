"""Multi-head self-attention.

TPU-native redesign of the reference attention (esm/multihead_attention.py):
  * batch-major (B, T, D) layout — no fairseq T×B×D transposes;
  * two execution paths:
      - ``exact``: XLA einsum attention with fp32 softmax; can return per-head
        probabilities (required by the contact head, which consumes all
        layers×heads maps — reference esm/modules.py:338-357);
      - ``flash``: Pallas fused blockwise-softmax kernel (rotary folded in),
        used when attention maps are not needed (see esm_tpu/kernels/flash_attention.py).
  * optional bias_k/bias_v extra attendable token (ESM-1 models,
    reference esm/multihead_attention.py:115-119,263-278).

Masks: ``key_padding_mask`` is boolean (B, S), True at padding positions,
excluded via -inf before the fp32 softmax (reference esm/multihead_attention.py:368-374).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .common import softmax_fp32
from .rotary import apply_rotary, rotary_tables


class AttentionOutput(NamedTuple):
    out: jax.Array                      # (B, T, D)
    probs: Optional[jax.Array]          # (B, H, T, S) attention probabilities


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, T, D) -> (B, H, T, Dh)."""
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, T, Dh) -> (B, T, D)."""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


# Produce/consume the flash kernels' d-major HBM layout straight from the
# projection GEMMs (no relay transposes). Module-level so A/B harnesses can
# toggle it; the eligible path is the flash self-attention with d_head < 128
# (where the classic layout pays the half-lane tax). NOTE: the flag is read
# at TRACE time and is not part of any jit cache key — after a jitted
# forward has compiled, toggling it has no effect until jax.clear_caches()
# (an A/B without the clear measures the first arm twice;
# scripts_dev/tpu_dmajor_io_ab.py shows the correct discipline).
DMAJOR_IO_DEFAULT = True


def _linear_dmajor(params, x: jax.Array) -> jax.Array:
    """Projection emitting (B, E, T) from (B, T, D): the kernel is the
    dot_general's LHS so its free (output-width) dimension lands MAJOR in
    the result — XLA writes the GEMM output d-major natively instead of
    emitting (B, T, E) and relaying. int8 scales are per output channel,
    i.e. per row of the (E, T) slab."""
    k = params["kernel"]
    y = jnp.einsum("de,btd->bet", k.astype(x.dtype), x)
    if k.dtype == jnp.int8:
        y = y * params["scale"].astype(y.dtype).reshape(-1)[None, :, None]
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    a = params.get("lora_a")
    if a is not None:
        # unmerged LoRA delta, emitted d-major like the base GEMM: the rank-r
        # intermediate is (B, T, r) and the B factor is the LHS so the output
        # width lands major (esm_tpu/lora.py)
        y = y + jnp.einsum(
            "re,btr->bet",
            params["lora_b"].astype(x.dtype),
            jnp.dot(x, a.astype(x.dtype)),
        )
    return y


def _linear_from_dmajor(params, o: jax.Array) -> jax.Array:
    """out_proj consuming (B, E, T) and emitting (B, T, F): E contracts, the
    RHS kernel's free dimension is minor — again the natural dot_general
    output, no relay."""
    k = params["kernel"]
    y = jnp.einsum("bet,ef->btf", o, k.astype(o.dtype))
    if k.dtype == jnp.int8:
        y = y * params["scale"].astype(y.dtype)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    a = params.get("lora_a")
    if a is not None:
        # unmerged LoRA delta from the d-major activations (esm_tpu/lora.py)
        y = y + jnp.dot(
            jnp.einsum("bet,er->btr", o, a.astype(o.dtype)),
            params["lora_b"].astype(o.dtype),
        )
    return y


def multihead_attention(
    params,
    x: jax.Array,
    *,
    num_heads: int,
    key_padding_mask: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    use_rotary: bool = False,
    use_bias_kv: bool = False,
    need_weights: bool = False,
    use_flash: bool = False,
    ring=None,
) -> AttentionOutput:
    """Self-attention over (B, T, D) activations.

    params: {"q_proj","k_proj","v_proj","out_proj": linear params,
             optionally "bias_k","bias_v": (D,) arrays}.
    attn_mask: optional additive (T, S) mask broadcast over batch/heads.
    ring: optional (Mesh, axis_name) — sequence-parallel path: T stays
    sharded over that mesh axis and KV blocks rotate around the ring
    (parallel/ring_attention.py) instead of materializing T×T logits.
    """
    from .common import linear

    if ring is not None:
        if need_weights:
            raise ValueError("ring attention cannot return T×T attention maps")
        if attn_mask is not None or use_bias_kv:
            raise ValueError("ring attention supports key padding masks only")

    b, t, d = x.shape
    head_dim = d // num_heads
    scaling = head_dim ** -0.5

    flash_now = (
        use_flash and not need_weights and attn_mask is None and ring is None
    )
    if (
        flash_now
        and not use_bias_kv
        and head_dim < 128
        and DMAJOR_IO_DEFAULT
    ):
        # Native d-major flash path (no relay transposes anywhere): the QKV
        # projections emit (B, D, T) directly — the projection dot_general
        # puts the output width as the LHS free dimension so XLA writes the
        # GEMM result in the layout the d<128 kernel wants — and out_proj
        # consumes (B, D, T) the same way. This removes the four per-layer
        # (BH, T, d)<->(BH, d, T) relays the k_dmajor kernels otherwise pay
        # (BENCH_NOTES round-5 A/B).
        from ..kernels.flash_attention import flash_attention_dmajor

        q = _linear_dmajor(params["q_proj"], x) * scaling
        k = _linear_dmajor(params["k_proj"], x)
        v = _linear_dmajor(params["v_proj"], x)
        shape4 = (b, num_heads, head_dim, t)
        o = flash_attention_dmajor(
            q.reshape(shape4), k.reshape(shape4), v.reshape(shape4),
            key_padding_mask=key_padding_mask, rotary=use_rotary,
        )
        out = _linear_from_dmajor(params["out_proj"], o.reshape(b, d, t))
        return AttentionOutput(out, None)

    q = linear(params["q_proj"], x) * scaling
    k = linear(params["k_proj"], x)
    v = linear(params["v_proj"], x)

    if use_bias_kv:
        # One extra learned, always-attendable key/value token appended to the
        # source axis (ESM-1; reference esm/multihead_attention.py:263-278).
        bias_k = jnp.broadcast_to(params["bias_k"].astype(k.dtype), (b, 1, d))
        bias_v = jnp.broadcast_to(params["bias_v"].astype(v.dtype), (b, 1, d))
        k = jnp.concatenate([k, bias_k], axis=1)
        v = jnp.concatenate([v, bias_v], axis=1)
        if key_padding_mask is not None:
            pad_col = jnp.zeros((b, 1), dtype=key_padding_mask.dtype)
            key_padding_mask = jnp.concatenate([key_padding_mask, pad_col], axis=1)
        if attn_mask is not None:
            attn_mask = jnp.pad(attn_mask, ((0, 0), (0, 1)))

    q = _split_heads(q, num_heads)  # (B, H, T, Dh)
    k = _split_heads(k, num_heads)  # (B, H, S, Dh)
    v = _split_heads(v, num_heads)

    if ring is not None:
        # rotary runs here (global position tables; XLA shards their T axis
        # with the activations), then the ring body handles the KV rotation
        if use_rotary:
            cos, sin = rotary_tables(k.shape[2], head_dim)
            q = apply_rotary(q, cos[:t], sin[:t])
            k = apply_rotary(k, cos, sin)
        from ..parallel.ring_attention import ring_attention

        mesh, axis_name = ring
        # use_flash selects the Pallas flash kernel INSIDE each ring step
        # (differentiable: the ring body's custom_vjp runs the flash backward
        # kernels per block in a second ring)
        out = ring_attention(
            q, k, v, mesh, axis_name=axis_name,
            key_padding_mask=key_padding_mask, use_flash=use_flash,
        )
        out = _merge_heads(out)
        out = linear(params["out_proj"], out)
        return AttentionOutput(out, None)

    flash_path = use_flash and not need_weights and attn_mask is None

    if use_rotary and not flash_path:
        # Rotary tables sized to the source length; queries use the first T
        # positions (reference esm/rotary_embedding.py:16-20 slices cos/sin to
        # the q length — identical for self-attention where T == S except for
        # the appended bias-kv token, which ESM-1 never combines with rotary).
        cos, sin = rotary_tables(k.shape[2], head_dim)
        q = apply_rotary(q, cos[:t], sin[:t])
        k = apply_rotary(k, cos, sin)

    if flash_path:
        from ..kernels.flash_attention import flash_attention

        # rotary runs inside the kernel (VMEM-resident tables) — valid because
        # position ids are plain row indices here (no bias_kv with rotary)
        out = flash_attention(
            q, k, v, key_padding_mask=key_padding_mask, rotary=use_rotary
        )
        out = _merge_heads(out)
        out = linear(params["out_proj"], out)
        return AttentionOutput(out, None)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if attn_mask is not None:
        logits = logits + attn_mask[None, None].astype(logits.dtype)
    if key_padding_mask is not None:
        neg_inf = jnp.asarray(-jnp.inf, dtype=logits.dtype)
        logits = jnp.where(key_padding_mask[:, None, None, :], neg_inf, logits)

    probs = softmax_fp32(logits)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = _merge_heads(out)
    out = linear(params["out_proj"], out)
    return AttentionOutput(out, probs if need_weights else None)
