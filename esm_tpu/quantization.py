"""Weight-only int8 quantization.

The reference serves ESM2-15B on one GPU via fairscale FSDP **CPU offload**
(examples/esm2_infer_fairscale_fsdp_cpu_offloading.py:12-40) — parameters
stream host<->device every layer. The TPU-native answer is to keep weights
resident but half-sized: symmetric per-output-channel int8 for every linear
kernel. ``esm_tpu.ops.common.linear`` consumes the quantized layout directly
(y = (x @ W_q) * scale + b), so the int8->bf16 convert fuses into the matmul
and no dequantized weight matrix ever materializes in HBM. 15B drops from
~30 GB (bf16) to ~15 GB — inside a single v5e chip's HBM.

Embeddings, layer norms, biases, and tied LM-head weights stay in their
original dtype (they are a negligible fraction of parameters and carry the
token-dropout / output-calibration sensitivity).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def quantize_linear(p: dict) -> dict:
    """{"kernel": (..., in, out) float, "bias"?} -> int8 kernel + "scale".

    Per-output-channel symmetric: scale[..., o] = max|W[..., :, o]| / 127.
    Leading axes (e.g. the lax.scan layer axis) keep per-layer scales.
    """
    w = jnp.asarray(p["kernel"])
    # scale math in fp32: a bf16 amax/127 that rounds down would clip the
    # channel's largest weights at ±127 — exactly the elements per-channel
    # scaling exists to preserve
    amax = jnp.max(jnp.abs(w), axis=-2).astype(jnp.float32)  # (..., out)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"kernel": q, "scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def _is_linear(node: Any) -> bool:
    if not isinstance(node, dict) or "kernel" not in node:
        return False
    k = node["kernel"]  # jax or numpy array — never copy just to inspect
    return (
        hasattr(k, "ndim")
        and hasattr(k, "dtype")
        and k.ndim >= 2
        and jnp.issubdtype(k.dtype, jnp.floating)
    )


def quantize_params(
    params: Any,
    *,
    min_size: int = 1 << 16,
    predicate: Optional[Callable[[str, dict], bool]] = None,
) -> Any:
    """Quantize every linear {"kernel", ...} node in a parameter pytree.

    ``min_size``: skip kernels smaller than this many elements (tiny
    projections — contact-head regression, gates — gain nothing and lose
    accuracy). ``predicate(path, node)`` overrides the default selection.
    """

    def walk(node, path):
        if _is_linear(node):
            keep = (
                predicate(path, node)
                if predicate is not None
                else node["kernel"].size >= min_size
            )
            if keep:
                rest = {k: v for k, v in node.items() if k not in ("kernel", "bias")}
                return {**quantize_linear(node), **rest}
            return node
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v, f"{path}/{i}") for i, v in enumerate(node))
        return node

    return walk(params, "")


def param_bytes(params: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
