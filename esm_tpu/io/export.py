"""JAX pytree -> PyTorch reference-layout export (the converter's inverse).

io/convert.py ingests the reference's ``.pt`` checkpoints; this module emits
them, so a model fine-tuned with esm_tpu.training can be handed back to the
torch/HF ecosystem: the written files load in the reference's
``load_model_and_alphabet_local`` (/root/reference/esm/pretrained.py:65-79)
through its v2 path (:164-219) with a strict state-dict check.

Layout notes (exact inverses of io/convert.py):
  * ``kernel`` (in, out)      -> torch Linear ``weight`` (out, in), transposed
  * ``scale``/``bias`` LN     -> torch LayerNorm ``weight``/``bias``
  * scan-stacked layer leaves -> per-layer ``layers.{i}.*`` keys
  * weight-only int8 kernels (esm_tpu/quantization.py) are dequantized
  * plus the two state-dict-only entries real checkpoints carry:
    ``lm_head.weight`` (tied to the token embedding) and the analytic rotary
    ``rot_emb.inv_freq`` buffers (reference esm/rotary_embedding.py:34-36)
  * keys carry the released ``encoder.sentence_encoder.`` / ``encoder.``
    prefixes the reference's ``upgrade_state_dict`` strips
    (esm/pretrained.py:165-171)
  * the contact regression head ships as a separate co-located
    ``<name>-contact-regression.pt`` (esm/pretrained.py:46-49,65-79)

Works on numpy; torch is only required by :func:`save_esm2` (host-side IO).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _as_np(x) -> np.ndarray:
    a = np.asarray(x)
    if a.dtype != np.float32 and np.issubdtype(a.dtype, np.floating):
        a = a.astype(np.float32)
    if not a.flags.writeable:
        # jax device arrays surface as read-only views; torch.from_numpy
        # warns on (and forbids mutating) non-writable buffers
        a = a.copy()
    return a


def _kernel_np(p: Dict, idx: Optional[int] = None) -> np.ndarray:
    """Dense fp32 kernel from a (possibly int8-quantized, possibly
    scan-stacked) linear param dict; ``idx`` selects the layer slice."""
    k = p["kernel"][idx] if idx is not None else p["kernel"]
    k = np.asarray(k)
    if k.dtype == np.int8:
        s = p["scale"][idx] if idx is not None else p["scale"]
        k = k.astype(np.float32) * _as_np(s)
    return _as_np(k)


def _linear_out(sd: Dict, key: str, p: Dict, idx: Optional[int] = None) -> None:
    sd[f"{key}.weight"] = np.ascontiguousarray(_kernel_np(p, idx).T)
    if "bias" in p:
        b = p["bias"][idx] if idx is not None else p["bias"]
        sd[f"{key}.bias"] = _as_np(b)


def _ln_out(sd: Dict, key: str, p: Dict, idx: Optional[int] = None) -> None:
    for ours, theirs in (("scale", "weight"), ("bias", "bias")):
        v = p[ours][idx] if idx is not None else p[ours]
        sd[f"{key}.{theirs}"] = _as_np(v)


def rotary_inv_freq(head_dim: int) -> np.ndarray:
    """The analytic rotary buffer every released checkpoint carries
    (reference esm/rotary_embedding.py:34-36). Computed in float32 end to
    end, mirroring torch's arithmetic (a float64 pow rounds 2/32 of the
    650M entries one ulp differently)."""
    exp = np.arange(0, head_dim, 2, dtype=np.float32) / np.float32(head_dim)
    return np.float32(1.0) / np.float32(10000.0) ** exp


def export_esm2_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """ESM-2 param pytree -> the reference's canonical (prefix-free) state
    dict, bit-exact inverse of io/convert.convert_esm2 for fp32 params.
    Excludes the contact head (see :func:`export_contact_regression`)."""
    emb = _as_np(params["embed_tokens"]["weight"])
    sd: Dict[str, np.ndarray] = {"embed_tokens.weight": emb}

    layers = params["layers"]
    n = int(np.asarray(layers["fc1"]["kernel"]).shape[0])
    inv_freq = rotary_inv_freq(cfg.embed_dim // cfg.attention_heads)
    for i in range(n):
        p = f"layers.{i}"
        for name in ("k_proj", "v_proj", "q_proj", "out_proj"):
            _linear_out(sd, f"{p}.self_attn.{name}", layers["self_attn"][name], i)
        sd[f"{p}.self_attn.rot_emb.inv_freq"] = inv_freq
        _ln_out(sd, f"{p}.self_attn_layer_norm", layers["self_attn_layer_norm"], i)
        _linear_out(sd, f"{p}.fc1", layers["fc1"], i)
        _linear_out(sd, f"{p}.fc2", layers["fc2"], i)
        _ln_out(sd, f"{p}.final_layer_norm", layers["final_layer_norm"], i)

    _ln_out(sd, "emb_layer_norm_after", params["emb_layer_norm_after"])
    head = params["lm_head"]
    _linear_out(sd, "lm_head.dense", head["dense"])
    _ln_out(sd, "lm_head.layer_norm", head["layer_norm"])
    sd["lm_head.weight"] = emb  # tied projection (reference esm/modules.py:303-308)
    sd["lm_head.bias"] = _as_np(head["bias"])
    return sd


def export_contact_regression(params) -> Optional[Dict[str, np.ndarray]]:
    """The separate ``-contact-regression.pt`` payload (reference
    esm/pretrained.py:46-49), or None if the tree has no contact head."""
    ch = params.get("contact_head")
    if ch is None:
        return None
    reg = ch["regression"]
    out = {
        "contact_head.regression.weight": np.ascontiguousarray(_kernel_np(reg).T)
    }
    if "bias" in reg:
        out["contact_head.regression.bias"] = _as_np(reg["bias"])
    return out


def _v2_prefixed(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Apply the released checkpoints' key prefixes (the exact set
    upgrade_state_dict strips, reference esm/pretrained.py:165-171)."""
    return {
        (("encoder." + k) if k.startswith("lm_head") else
         ("encoder.sentence_encoder." + k)): v
        for k, v in sd.items()
    }


def save_esm2(params, cfg, path) -> Tuple[str, Optional[str]]:
    """Write ``<path>`` (+ co-located ``-contact-regression.pt``) in the
    reference's released ESM-2 format. Returns the written paths.

    ``path``'s stem should start with ``esm2`` — that is how
    ``load_model_and_alphabet_local`` selects its v2 loader
    (esm/pretrained.py:190-192)."""
    import os

    import torch

    path = os.fspath(path)
    stem = os.path.basename(path)
    if not stem.startswith("esm2"):
        raise ValueError(
            f"file name {stem!r} must start with 'esm2' — the reference "
            "routes names to loaders by prefix (esm/pretrained.py:190-192)"
        )

    import argparse

    sd = _v2_prefixed(export_esm2_state_dict(params, cfg))
    model_data = {
        "cfg": {
            # argparse.Namespace: stdlib-unpicklable anywhere (a custom class
            # would require esm_tpu installed wherever the file is loaded),
            # and the attribute surface the v2 loader reads
            # (esm/pretrained.py:173-183)
            "model": argparse.Namespace(
                encoder_layers=cfg.num_layers,
                encoder_embed_dim=cfg.embed_dim,
                encoder_attention_heads=cfg.attention_heads,
                token_dropout=cfg.token_dropout,
            )
        },
        "model": {k: torch.from_numpy(v) for k, v in sd.items()},
    }
    torch.save(model_data, path)

    reg = export_contact_regression(params)
    reg_path = None
    if reg is not None:
        root, _ = os.path.splitext(path)
        reg_path = root + "-contact-regression.pt"
        torch.save({"model": {k: torch.from_numpy(v) for k, v in reg.items()}}, reg_path)
    elif not ("270K" in stem or "500K" in stem):
        # load_model_and_alphabet_local unconditionally torch.load's the
        # co-located regression file for any other esm2* stem
        # (esm/pretrained.py:18-21, 72-77) — a checkpoint written without it
        # would FileNotFoundError at load time, so fail at SAVE time with
        # the two ways out
        raise ValueError(
            "params have no contact_head, but the reference loader requires "
            f"{os.path.basename(path).rsplit('.', 1)[0]}-contact-regression"
            ".pt for this stem; keep the contact head in the exported tree, "
            "or include '270K'/'500K' in the file name (the reference's "
            "no-regression marker, esm/pretrained.py:18-21)"
        )
    return path, reg_path


def export_esm1b_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """ESM-1b/1v param pytree -> the reference's canonical state dict
    (inverse of io/convert.convert_esm1 for model_version="ESM-1b" — the
    "roberta_large" arch that covers esm1b_t33_650M and every esm1v model).
    ESM-1 proper ("protein_bert_base": bias_kv, sinusoidal positions, untied
    embed_out) is not exported — no fine-tuning story targets it."""
    if getattr(cfg, "model_version", "ESM-1b") != "ESM-1b":
        raise ValueError(
            "only model_version='ESM-1b' (roberta_large: ESM-1b/ESM-1v) "
            "exports; ESM-1's protein_bert_base layout is not supported"
        )
    emb = _as_np(params["embed_tokens"]["weight"])
    sd: Dict[str, np.ndarray] = {
        "embed_tokens.weight": emb,
        "embed_positions.weight": _as_np(params["embed_positions"]["weight"]),
    }
    layers = params["layers"]
    n = int(np.asarray(layers["fc1"]["kernel"]).shape[0])
    for i in range(n):
        p = f"layers.{i}"
        for name in ("k_proj", "v_proj", "q_proj", "out_proj"):
            _linear_out(sd, f"{p}.self_attn.{name}", layers["self_attn"][name], i)
        _ln_out(sd, f"{p}.self_attn_layer_norm", layers["self_attn_layer_norm"], i)
        _linear_out(sd, f"{p}.fc1", layers["fc1"], i)
        _linear_out(sd, f"{p}.fc2", layers["fc2"], i)
        _ln_out(sd, f"{p}.final_layer_norm", layers["final_layer_norm"], i)
    if "emb_layer_norm_before" in params:
        _ln_out(sd, "emb_layer_norm_before", params["emb_layer_norm_before"])
    _ln_out(sd, "emb_layer_norm_after", params["emb_layer_norm_after"])
    head = params["lm_head"]
    _linear_out(sd, "lm_head.dense", head["dense"])
    _ln_out(sd, "lm_head.layer_norm", head["layer_norm"])
    sd["lm_head.weight"] = emb  # tied (reference esm/modules.py:303-308)
    sd["lm_head.bias"] = _as_np(head["bias"])
    return sd


def save_esm1b(params, cfg, path) -> Tuple[str, Optional[str]]:
    """Write ``<path>`` (+ co-located ``-contact-regression.pt``) loadable by
    the reference's v1 path (_load_model_and_alphabet_core_v1 with
    arch="roberta_large", esm/pretrained.py:85-103: the encoder-prefix strip
    lambdas are no-ops on canonical keys, the loader zeroes the mask-token
    embedding row — idempotent for weights that came from a v1 checkpoint —
    and recomputes emb_layer_norm_before from the state's key set).

    ``path``'s stem must start with ``esm1`` so load_model_and_alphabet_local
    routes it to the v1 loader (anything not starting 'esm2')."""
    import argparse
    import os

    import torch

    path = os.fspath(path)
    stem = os.path.basename(path)
    if not stem.startswith("esm1"):
        raise ValueError(
            f"file name {stem!r} must start with 'esm1' — the reference "
            "routes non-'esm2' names to the v1 loader (esm/pretrained.py:190)"
        )
    sd = export_esm1b_state_dict(params, cfg)
    model_data = {
        # the v1 loader reads args.arch for routing + the constructor's
        # surface (esm/model/esm1.py:60-105); emb_layer_norm_before is
        # recomputed from the state dict, not read from args
        "args": argparse.Namespace(
            arch="roberta_large",
            layers=cfg.num_layers,
            embed_dim=cfg.embed_dim,
            ffn_embed_dim=cfg.ffn_embed_dim,
            attention_heads=cfg.attention_heads,
            max_positions=cfg.max_positions,
            final_bias=True,
            token_dropout=getattr(cfg, "token_dropout", False),
        ),
        "model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
    }
    torch.save(model_data, path)

    reg = export_contact_regression(params)
    reg_path = None
    if reg is not None:
        root, _ = os.path.splitext(path)
        reg_path = root + "-contact-regression.pt"
        torch.save({"model": {k: torch.from_numpy(v) for k, v in reg.items()}}, reg_path)
    elif not ("270K" in stem or "500K" in stem):
        raise ValueError(
            "params have no contact_head, but the reference loader requires "
            "the co-located -contact-regression.pt for this stem "
            "(esm/pretrained.py:18-21, 72-77); keep the contact head in the "
            "exported tree"
        )
    return path, reg_path
