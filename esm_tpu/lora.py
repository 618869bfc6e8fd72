"""Parameter-efficient fine-tuning: LoRA adapters for any esm_tpu model.

The reference ships no trainer at all (SURVEY §1); ``esm_tpu.training`` adds
full-parameter MLM fine-tuning, and this module adds low-rank adaptation
(LoRA: frozen base weights + trainable rank-r factors on chosen linears), the
standard production recipe when the base model is large and the task data is
small. Two properties matter on TPU:

  * **Optimizer state shrinks from O(params) to O(adapters)** — full AdamW at
    650M costs ~2x params of fp32 moments; with LoRA the frozen base can stay
    bf16 (or weight-only int8 — the QLoRA-style configuration) and the
    moments cover only the factors, so much larger batches fit one chip.
  * **The base never leaves its storage dtype.** Adapters run UNMERGED —
    ``y += (x @ A) @ B`` next to the frozen GEMM — so an int8 base keeps
    feeding the MXU directly (esm_tpu/quantization.py) and no dequantized
    weight copy ever exists in HBM.

Design: adapters live in their OWN pytree, a sparse mirror of the model
params holding ``{"lora_a", "lora_b"}`` at each adapted linear node.
:func:`patch` returns a params tree whose adapted linear dicts carry the
factor arrays as extra keys; ``ops.common.linear`` (and the d-major
projection helpers in ``ops.attention``) consume them when present. Because
stacked per-layer kernels are driven by ``lax.scan``
(models/lm_common.py:88-152), stacked ``(num_layers, d_in, r)`` factors are
sliced per layer by the same scan with zero extra plumbing — LoRA works for
every family (ESM-2/1, MSA, ESMFold trunk, ESM-IF1) through the one hook.

Gradients: take ``jax.grad`` of a loss that patches
``jax.lax.stop_gradient(base)`` with the adapter tree (see
``training.train_step_lora``); only the factors receive gradients.
"""

from __future__ import annotations

import math
from typing import Callable, FrozenSet, Optional, Tuple, Union

import jax
import jax.numpy as jnp

# The LM-family hot linears (lm_common.init_transformer_layer). Attention
# projections + MLP: the full-coverage default (LoRA paper table 5 shows
# attention-only also works; pass targets={"q_proj","v_proj"} for that).
DEFAULT_TARGETS: FrozenSet[str] = frozenset(
    {"q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"}
)

Targets = Union[FrozenSet[str], set, Callable[[Tuple[str, ...]], bool]]


def _wants(targets: Targets, path: Tuple[str, ...]) -> bool:
    if callable(targets):
        return bool(targets(path))
    return path[-1] in targets


def _is_linear(node) -> bool:
    if not isinstance(node, dict) or "kernel" not in node:
        return False
    k = node["kernel"]
    return getattr(k, "ndim", 0) >= 2


def init_lora(
    key: jax.Array,
    params,
    *,
    rank: int,
    targets: Targets = DEFAULT_TARGETS,
    dtype=jnp.float32,
):
    """Build the adapter tree for ``params``: at every dict node that holds a
    >=2-D ``kernel`` and whose name matches ``targets`` (a name set or a
    predicate on the path tuple), create ``lora_a`` ~ N(0, 1/d_in) of shape
    ``(..., d_in, rank)`` and ``lora_b`` = 0 of shape ``(..., rank, d_out)``
    (zero B => the patched model equals the base at step 0). Leading stacked
    layer axes of the kernel are preserved on both factors. Returns the
    sparse mirror tree ({} where a subtree has no adapted nodes is pruned).
    """
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    leaves = []  # target paths in deterministic traversal order

    def collect(path, node):
        if _is_linear(node) and _wants(targets, path):
            leaves.append(path)
            return
        if isinstance(node, dict):
            for name in sorted(node):
                collect(path + (name,), node[name])
        elif isinstance(node, (list, tuple)):
            # e.g. the GVP-Transformer decoder stores its layer stack as a
            # python list of per-layer dicts
            for i, sub in enumerate(node):
                collect(path + (i,), sub)

    collect((), params)
    if not leaves:
        raise ValueError(
            "no linear nodes matched the LoRA targets "
            f"{targets if not callable(targets) else '<predicate>'}"
        )
    target_keys = dict(zip(leaves, jax.random.split(key, len(leaves))))

    def build(path, node):
        k = target_keys.get(path)
        if k is not None:
            kern = node["kernel"]
            *lead, d_in, d_out = kern.shape
            a = jax.random.normal(k, (*lead, d_in, rank), dtype) / math.sqrt(d_in)
            b = jnp.zeros((*lead, rank, d_out), dtype)
            return {"lora_a": a, "lora_b": b}
        if isinstance(node, dict):
            out = {}
            for name in node:
                sub = build(path + (name,), node[name])
                if sub is not None:
                    out[name] = sub
            return out or None
        if isinstance(node, (list, tuple)):
            subs = [build(path + (i,), v) for i, v in enumerate(node)]
            if all(s is None for s in subs):
                return None
            # keep positional alignment (non-adapted slots become {}) and
            # the container type (a tuple stack mirrors as a tuple, so the
            # adapter treedef composes with the params treedef)
            return type(node)(s if s is not None else {} for s in subs)
        return None

    return build((), params)


def patch(params, lora, *, scale: float = 1.0):
    """Return ``params`` with each adapted linear dict carrying the factor
    arrays as extra ``lora_a``/``lora_b`` keys (``lora_b`` pre-multiplied by
    ``scale`` — the LoRA alpha/rank knob, folded into the tiny B factor so
    the hot path pays nothing). Non-adapted subtrees are returned by
    reference; nothing is copied but the dicts along adapted paths."""

    def walk(p_node, l_node):
        if isinstance(l_node, (list, tuple)):
            if len(l_node) != len(p_node):
                raise ValueError("adapter list does not align with params")
            return type(p_node)(walk(pv, lv) for pv, lv in zip(p_node, l_node))
        if not isinstance(l_node, dict):
            raise TypeError(f"malformed adapter node: {type(l_node)}")
        if "lora_a" in l_node:
            if not _is_linear(p_node):
                raise ValueError("adapter node does not align with a linear")
            b = l_node["lora_b"]
            return {**p_node, "lora_a": l_node["lora_a"],
                    "lora_b": b if scale == 1.0 else b * scale}
        out = dict(p_node)
        for name, sub in l_node.items():
            if name not in p_node:
                raise KeyError(f"adapter path {name!r} not in params")
            out[name] = walk(p_node[name], sub)
        return out

    return walk(params, lora)


def merge(params, lora, *, scale: float = 1.0):
    """Fold trained adapters into the base kernels: ``kernel += scale*(A@B)``
    (fp32 accumulation, cast back to the kernel dtype). The merged tree runs
    at exactly the base model's cost — the deployment artifact after
    fine-tuning; it round-trips through io/export.py like any other params.

    Weight-only int8 kernels are refused: merging would requantize the base
    and silently change the FROZEN weights everywhere. Keep int8 bases
    unmerged (``patch`` at inference costs two rank-r GEMMs per linear), or
    materialize the base to float first (ops.common.materialize_kernel).
    """

    def walk(p_node, l_node):
        if isinstance(l_node, (list, tuple)):
            if len(l_node) != len(p_node):
                raise ValueError("adapter list does not align with params")
            return type(p_node)(walk(pv, lv) for pv, lv in zip(p_node, l_node))
        if "lora_a" in l_node:
            kern = p_node["kernel"]
            if kern.dtype == jnp.int8:
                raise ValueError(
                    "cannot merge LoRA into a weight-only int8 kernel: "
                    "requantizing would perturb the frozen base. Run patched "
                    "(unmerged), or dequantize the base to float and merge."
                )
            delta = jnp.einsum(
                "...ir,...ro->...io",
                l_node["lora_a"].astype(jnp.float32),
                l_node["lora_b"].astype(jnp.float32),
            )
            merged = kern.astype(jnp.float32) + scale * delta
            return {**p_node, "kernel": merged.astype(kern.dtype)}
        out = dict(p_node)
        for name, sub in l_node.items():
            out[name] = walk(p_node[name], sub)
        return out

    return walk(params, lora)


def num_params(lora) -> int:
    """Trainable adapter parameter count (what the optimizer state covers)."""
    return sum(int(x.size) for x in jax.tree.leaves(lora))
