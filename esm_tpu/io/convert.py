"""PyTorch checkpoint -> JAX pytree conversion.

Ingests the reference's ``.pt`` state-dict layouts (post key-upgrade — see
esm_tpu/io/registry.py for the legacy fairseq upgrade rules mirroring
esm/pretrained.py:85-183) and emits this framework's parameter pytrees:

  * torch Linear ``weight`` (out, in)  ->  ``kernel`` (in, out)  (transposed)
  * torch LayerNorm ``weight``/``bias`` -> ``scale``/``bias``
  * per-layer tensors stacked along a leading axis for lax.scan

Works on numpy arrays so torch is only required at the call site that loads the
.pt file (torch is a host-side IO dependency only, never device compute).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor or ndarray -> fp32/int numpy array."""
    if isinstance(t, np.ndarray):
        return t
    # torch tensor — avoid importing torch at module scope
    t = t.detach().cpu()
    if t.dtype.is_floating_point:
        t = t.float()
    return t.numpy()


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    p = {"kernel": np.ascontiguousarray(_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _layer_norm(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _stack(layers):
    """List of per-layer pytrees -> single pytree with leading layer axis."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)


def convert_transformer_layer(
    sd: Mapping[str, np.ndarray], prefix: str, *, bias_kv: bool = False
) -> Dict:
    attn = {
        "q_proj": _linear(sd, f"{prefix}.self_attn.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.self_attn.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.self_attn.v_proj"),
        "out_proj": _linear(sd, f"{prefix}.self_attn.out_proj"),
    }
    if bias_kv:
        # torch shape (1, 1, D) -> (D,)
        attn["bias_k"] = _np(sd[f"{prefix}.self_attn.bias_k"]).reshape(-1)
        attn["bias_v"] = _np(sd[f"{prefix}.self_attn.bias_v"]).reshape(-1)
    return {
        "self_attn": attn,
        "self_attn_layer_norm": _layer_norm(sd, f"{prefix}.self_attn_layer_norm"),
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
        "final_layer_norm": _layer_norm(sd, f"{prefix}.final_layer_norm"),
    }


def convert_lm_head(sd: Mapping[str, np.ndarray], prefix: str = "lm_head") -> Dict:
    return {
        "dense": _linear(sd, f"{prefix}.dense"),
        "layer_norm": _layer_norm(sd, f"{prefix}.layer_norm"),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def convert_contact_head(sd: Mapping[str, np.ndarray], prefix: str = "contact_head") -> Dict:
    return {"regression": _linear(sd, f"{prefix}.regression")}


def _num_layers(sd: Mapping[str, np.ndarray]) -> int:
    n = -1
    pat = re.compile(r"^layers\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            n = max(n, int(m.group(1)))
    return n + 1


def _default_contact_head(n_layers: int, n_heads: int) -> Dict:
    """Zero-init head used when regression weights are absent (ESM-1v etc.) —
    keeps predict_contacts callable; the reference warns and predicts from a
    randomly-initialized head (esm/pretrained.py:198-217)."""
    return {
        "regression": {
            "kernel": np.zeros((n_layers * n_heads, 1), np.float32),
            "bias": np.zeros((1,), np.float32),
        }
    }


def convert_esm2(sd: Mapping[str, np.ndarray], attention_heads: int = None) -> Dict:
    """ESM-2 state dict (canonical key layout, reference esm/model/esm2.py) ->
    esm_tpu.models.esm2 param pytree. ``attention_heads`` enables a zero-init
    fallback contact head when regression weights are absent (head count is
    not recoverable from the state dict)."""
    n = _num_layers(sd)
    params = {
        "embed_tokens": {"weight": _np(sd["embed_tokens.weight"])},
        "layers": _stack([convert_transformer_layer(sd, f"layers.{i}") for i in range(n)]),
        "emb_layer_norm_after": _layer_norm(sd, "emb_layer_norm_after"),
        "lm_head": convert_lm_head(sd),
    }
    if "contact_head.regression.weight" in sd:
        params["contact_head"] = convert_contact_head(sd)
    elif attention_heads is not None:
        params["contact_head"] = _default_contact_head(n, attention_heads)
    return params


def convert_esm1(
    sd: Mapping[str, np.ndarray], *, model_version: str, attention_heads: int = None
) -> Dict:
    """ESM-1/1b state dict (reference esm/model/esm1.py) -> param pytree.

    model_version: "ESM-1" (sinusoidal pos, bias_kv, untied embed_out) or
    "ESM-1b" (learned pos, tied lm_head).
    """
    n = _num_layers(sd)
    is_1b = model_version == "ESM-1b"
    params: Dict = {
        "embed_tokens": {"weight": _np(sd["embed_tokens.weight"])},
        "layers": _stack(
            [
                convert_transformer_layer(sd, f"layers.{i}", bias_kv=not is_1b)
                for i in range(n)
            ]
        ),
    }
    if "contact_head.regression.weight" in sd:
        params["contact_head"] = convert_contact_head(sd)
    elif attention_heads is not None:
        params["contact_head"] = _default_contact_head(n, attention_heads)
    if is_1b:
        params["embed_positions"] = {"weight": _np(sd["embed_positions.weight"])}
        if "emb_layer_norm_before.weight" in sd:
            params["emb_layer_norm_before"] = _layer_norm(sd, "emb_layer_norm_before")
        params["emb_layer_norm_after"] = _layer_norm(sd, "emb_layer_norm_after")
        params["lm_head"] = convert_lm_head(sd)
    else:
        # ESM-1: untied output projection, stored (V, D) like an embedding
        params["embed_out"] = {"kernel": np.ascontiguousarray(_np(sd["embed_out"]).T)}
        if "embed_out_bias" in sd:
            params["embed_out"]["bias"] = _np(sd["embed_out_bias"])
    return params


def _axial_attn(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def convert_msa_transformer(
    sd: Mapping[str, np.ndarray], attention_heads: int = None
) -> Dict:
    """MSA Transformer state dict (reference esm/model/msa_transformer.py) ->
    param pytree. Each axial layer is three NormalizedResidualBlocks whose
    inner module lives under ``.layer`` (reference esm/modules.py:360-392)."""
    n = _num_layers(sd)

    def convert_layer(i: int) -> Dict:
        p = f"layers.{i}"
        return {
            "row_self_attention": {
                "layer": _axial_attn(sd, f"{p}.row_self_attention.layer"),
                "layer_norm": _layer_norm(sd, f"{p}.row_self_attention.layer_norm"),
            },
            "column_self_attention": {
                "layer": _axial_attn(sd, f"{p}.column_self_attention.layer"),
                "layer_norm": _layer_norm(sd, f"{p}.column_self_attention.layer_norm"),
            },
            "feed_forward_layer": {
                "layer": {
                    "fc1": _linear(sd, f"{p}.feed_forward_layer.layer.fc1"),
                    "fc2": _linear(sd, f"{p}.feed_forward_layer.layer.fc2"),
                },
                "layer_norm": _layer_norm(sd, f"{p}.feed_forward_layer.layer_norm"),
            },
        }

    params = {
        "embed_tokens": {"weight": _np(sd["embed_tokens.weight"])},
        "layers": _stack([convert_layer(i) for i in range(n)]),
        "embed_positions": {"weight": _np(sd["embed_positions.weight"])},
        "emb_layer_norm_before": _layer_norm(sd, "emb_layer_norm_before"),
        "emb_layer_norm_after": _layer_norm(sd, "emb_layer_norm_after"),
        "lm_head": convert_lm_head(sd),
    }
    if "msa_position_embedding" in sd:
        # torch shape (1, 1024, 1, D) -> (1024, 1, D)
        params["msa_position_embedding"] = _np(sd["msa_position_embedding"])[0]
    if "contact_head.regression.weight" in sd:
        params["contact_head"] = convert_contact_head(sd)
    elif attention_heads is not None:
        params["contact_head"] = _default_contact_head(n, attention_heads)
    return params
