"""Shared functional building blocks: linear layers, layer norms, activations.

Param convention (chosen for JAX/TPU, not a torch translation):
  * linear:    {"kernel": (in, out) array, "bias": (out,) array (optional)}
    — kernel is stored input-major so forward is a plain ``x @ kernel`` that XLA
    maps straight onto the MXU with no transposes.
  * layernorm: {"scale": (d,), "bias": (d,)}
  * embedding: {"weight": (vocab, d)}

Numerics policy: layer norm and softmax always run in float32 regardless of the
compute dtype (the reference forces fp32 softmax, esm/multihead_attention.py:18-22,
and uses apex FusedLayerNorm in fp32, esm/modules.py:68-81).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact-erf GELU (reference esm/modules.py:17-24)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def materialize_kernel(params, dtype) -> jax.Array:
    """Kernel as a dense ``dtype`` matrix — dequantizes weight-only int8
    (esm_tpu/quantization.py) for consumers that concatenate or reshape
    kernels instead of calling :func:`linear` (e.g. fused projections).
    LoRA-patched nodes (esm_tpu/lora.py) fold their delta in here, so
    adapters act through EVERY kernel consumer, fused paths included."""
    k = params["kernel"]
    if k.dtype == jnp.int8:
        k = k.astype(dtype) * params["scale"].astype(dtype)
    else:
        k = k.astype(dtype)
    a = params.get("lora_a")
    if a is not None:
        k = k + jnp.einsum(
            "...ir,...ro->...io", a.astype(dtype), params["lora_b"].astype(dtype)
        )
    return k


def linear(params, x: jax.Array) -> jax.Array:
    k = params["kernel"]
    if k.dtype == jnp.int8:
        # weight-only int8 (esm_tpu/quantization.py): symmetric per-output-
        # channel scales applied AFTER the matmul, so the int8->bf16 convert
        # fuses into the dot and a dequantized weight matrix never exists in
        # HBM. int8 values are exact in bf16.
        y = jnp.dot(x, k.astype(x.dtype)) * params["scale"].astype(x.dtype)
    else:
        y = jnp.dot(x, k.astype(x.dtype))
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    a = params.get("lora_a")
    if a is not None:
        # unmerged LoRA adapter (esm_tpu/lora.py): two rank-r GEMMs beside
        # the frozen base matmul — the base kernel keeps its storage dtype
        # (int8 stays on the MXU; no dequantized copy in HBM)
        y = y + jnp.dot(
            jnp.dot(x, a.astype(x.dtype)), params["lora_b"].astype(x.dtype)
        )
    return y


def layer_norm(params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Standard LN, fp32 internally (reference ESM1bLayerNorm, esm/modules.py:68-81)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def esm1_layer_norm(params, x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """TF-style LN with eps inside the sqrt (reference ESM1LayerNorm,
    esm/modules.py:44-65). Same formula as :func:`layer_norm` — both put eps
    under the sqrt — but with the ESM-1 default eps. NOTE: the model paths
    reach this via ``layer_norm(..., eps=static.ln_eps)`` (lm_common.py), not
    this alias; it exists as the documented reference-name entry point."""
    return layer_norm(params, x, eps=eps)


def softmax_fp32(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax computed in float32, result cast back to the input dtype
    (reference utils_softmax, esm/multihead_attention.py:18-22)."""
    out = jax.nn.softmax(logits.astype(jnp.float32), axis=axis)
    return out.astype(logits.dtype)


def symmetrize(x: jax.Array) -> jax.Array:
    """Symmetrize the final two dims (reference esm/modules.py:27-29)."""
    return x + jnp.swapaxes(x, -1, -2)


def apc(x: jax.Array) -> jax.Array:
    """Average-product correction (reference esm/modules.py:32-41)."""
    a1 = jnp.sum(x, axis=-1, keepdims=True)
    a2 = jnp.sum(x, axis=-2, keepdims=True)
    a12 = jnp.sum(x, axis=(-1, -2), keepdims=True)
    return x - (a1 * a2) / a12


# ---------------------------------------------------------------------------
# Initializers (used for from-scratch init; checkpoint loads overwrite these).
# ---------------------------------------------------------------------------


def init_linear(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    gain: float = 1.0,
    dtype=jnp.float32,
):
    """Xavier-uniform kernel (matches the attention init in the reference,
    esm/multihead_attention.py:139-153); zero bias."""
    limit = gain * math.sqrt(6.0 / (in_dim + out_dim))
    k = jax.random.uniform(key, (in_dim, out_dim), dtype, -limit, limit)
    p = {"kernel": k}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_linear_torch_default(
    key: jax.Array, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32
):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both kernel
    and bias (used by FFN / LM-head layers in the reference)."""
    limit = 1.0 / math.sqrt(in_dim)
    kk, kb = jax.random.split(key)
    p = {"kernel": jax.random.uniform(kk, (in_dim, out_dim), dtype, -limit, limit)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype, -limit, limit)
    return p


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_embedding(
    key: jax.Array, vocab: int, dim: int, padding_idx: Optional[int] = None, dtype=jnp.float32
):
    w = jax.random.normal(key, (vocab, dim), dtype)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"weight": w}
