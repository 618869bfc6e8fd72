"""JAX pytree -> PyTorch reference-layout export (the converter's inverse).

io/convert.py ingests the reference's ``.pt`` checkpoints; this module emits
them, so a model fine-tuned with esm_tpu.training can be handed back to the
torch/HF ecosystem: the written files load in the reference's
``load_model_and_alphabet_local`` (/root/reference/esm/pretrained.py:65-79)
with a strict state-dict check. Families covered: ESM-2 (v2 path, :164-219),
ESM-1b/1v (v1 roberta_large, :90-103), ESM-1 proper (v1 protein_bert_base,
:105-112), MSA Transformer (v1 msa_transformer incl. the historical
row/column swap, :114-132) and ESM-IF1 (v1 invariant_gvp, :134-161), and
the ESMFold trunk+heads in the reference's esmfold .pt format (save_esmfold
— see its docstring for what is and is not verifiable without openfold).
Every layout the converters ingest exports back.

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


def _no_regression_stem(stem: str) -> bool:
    """Whether the reference loader skips the co-located regression file for
    this file name — the exact marker set of _has_regression_weights
    (reference esm/pretrained.py:18-21): ESM-1v, ESM-IF and the partially
    trained ESM-2 checkpoints."""
    return ("esm1v" in stem) or ("esm_if" in stem) or ("270K" in stem) or ("500K" in stem)


def _contact_regression_or_raise(params, path: str):
    """Contact-regression payload for ``params``, validated against ``path``'s
    stem BEFORE anything is written to disk: for any stem without a
    no-regression marker, load_model_and_alphabet_local unconditionally
    torch.load's ``<stem>-contact-regression.pt`` (esm/pretrained.py:18-21,
    72-77) — a main .pt written without its companion would
    FileNotFoundError at load time, so a headless tree fails at SAVE time
    (and leaves no file behind)."""
    import os

    reg = export_contact_regression(params)
    stem = os.path.basename(path)
    if reg is None and not _no_regression_stem(stem):
        raise ValueError(
            "params have no contact_head, but the reference loader requires "
            f"{stem.rsplit('.', 1)[0]}-contact-regression.pt for this stem; "
            "keep the contact head in the exported tree, or use a stem the "
            "reference treats as regression-free ('esm1v'/'esm_if'/'270K'/"
            "'500K' markers, esm/pretrained.py:18-21)"
        )
    return reg


def _save_regression(reg, path: str):
    """Write the companion ``-contact-regression.pt`` next to ``path``."""
    import os

    import torch

    if reg is None:
        return None
    root, _ = os.path.splitext(path)
    reg_path = root + "-contact-regression.pt"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in reg.items()}}, reg_path)
    return reg_path


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

    reg = _contact_regression_or_raise(params, path)
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
    return path, _save_regression(reg, path)


def export_msa_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """MSA Transformer param pytree -> the reference's CANONICAL state dict
    (post-key-upgrade names, inverse of io/convert.convert_msa_transformer) —
    directly comparable to ``MSATransformer(...).state_dict()``. The
    historical on-disk row<->column swap is applied by :func:`save_msa`, not
    here. Excludes the contact head (ships separately)."""
    emb = _as_np(params["embed_tokens"]["weight"])
    sd: Dict[str, np.ndarray] = {
        "embed_tokens.weight": emb,
        "embed_positions.weight": _as_np(params["embed_positions"]["weight"]),
    }
    if "msa_position_embedding" in params:
        # our (1024, 1, D) -> torch parameter (1, 1024, 1, D)
        # (reference esm/model/msa_transformer.py:102-107)
        sd["msa_position_embedding"] = _as_np(params["msa_position_embedding"])[None]
    layers = params["layers"]
    n = int(np.asarray(layers["feed_forward_layer"]["layer"]["fc1"]["kernel"]).shape[0])
    for i in range(n):
        p = f"layers.{i}"
        for attn in ("row_self_attention", "column_self_attention"):
            blk = layers[attn]
            for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
                _linear_out(sd, f"{p}.{attn}.layer.{name}", blk["layer"][name], i)
            _ln_out(sd, f"{p}.{attn}.layer_norm", blk["layer_norm"], i)
        ff = layers["feed_forward_layer"]
        _linear_out(sd, f"{p}.feed_forward_layer.layer.fc1", ff["layer"]["fc1"], i)
        _linear_out(sd, f"{p}.feed_forward_layer.layer.fc2", ff["layer"]["fc2"], i)
        _ln_out(sd, f"{p}.feed_forward_layer.layer_norm", ff["layer_norm"], i)
    _ln_out(sd, "emb_layer_norm_before", params["emb_layer_norm_before"])
    _ln_out(sd, "emb_layer_norm_after", params["emb_layer_norm_after"])
    head = params["lm_head"]
    _linear_out(sd, "lm_head.dense", head["dense"])
    _ln_out(sd, "lm_head.layer_norm", head["layer_norm"])
    sd["lm_head.weight"] = emb  # tied (reference esm/modules.py:303-308)
    sd["lm_head.bias"] = _as_np(head["bias"])
    return sd


def _swap_row_column(k: str) -> str:
    """The historical fairseq-era storage quirk: released msa_transformer
    checkpoints carry row/column attention keys SWAPPED; the reference's v1
    loader unswaps them (prs3, esm/pretrained.py:121-125). The swap is an
    involution, so writing with it is exactly what the loader undoes."""
    if "row" in k:
        return k.replace("row", "column")
    return k.replace("column", "row")


def save_msa(params, cfg, path) -> Tuple[str, Optional[str]]:
    """Write ``<path>`` (+ co-located ``-contact-regression.pt``) loadable by
    the reference's v1 msa_transformer path (esm/pretrained.py:114-132):
    stored keys carry the historical row<->column swap, the args Namespace
    carries the constructor surface (esm/model/msa_transformer.py:88-145,
    which reads ``args.layers``) and ``embed_positions_msa`` so the loader
    recovers the 1024-row MSA position embedding's dim from the state.

    ``path``'s stem should look like ``esm_msa*`` (must not start with
    'esm2'; 'esm_msa1b'-style names require the regression file)."""
    import argparse
    import os

    import torch

    path = os.fspath(path)
    stem = os.path.basename(path)
    if stem.startswith("esm2"):
        raise ValueError(
            f"file name {stem!r} must not start with 'esm2' — the reference "
            "routes msa_transformer files to the v1 loader (esm/pretrained.py:190)"
        )
    reg = _contact_regression_or_raise(params, path)
    sd = {
        _swap_row_column(k): torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_msa_state_dict(params, cfg).items()
    }
    model_data = {
        "args": argparse.Namespace(
            arch="msa_transformer",
            layers=cfg.num_layers,
            embed_dim=cfg.embed_dim,
            ffn_embed_dim=cfg.ffn_embed_dim,
            attention_heads=cfg.attention_heads,
            dropout=0.1,
            attention_dropout=0.1,
            activation_dropout=0.1,
            max_tokens_per_msa=cfg.max_tokens_per_msa,
            # the constructor's getattr fallback evaluates its default
            # EAGERLY (esm/model/msa_transformer.py:121), so max_tokens must
            # exist even though max_tokens_per_msa wins
            max_tokens=cfg.max_tokens_per_msa,
            max_positions=cfg.max_positions,
            embed_positions_msa=bool("msa_position_embedding" in params),
        ),
        "model": sd,
    }
    torch.save(model_data, path)
    return path, _save_regression(reg, path)


def _esm1_layers_out(sd: Dict, params, *, bias_kv: bool) -> None:
    """Shared transformer-layer emission for the ESM-1 family (scan-stacked
    layers -> per-layer keys; ESM-1 proper adds the (1, 1, D) bias_k/v)."""
    layers = params["layers"]
    n = int(np.asarray(layers["fc1"]["kernel"]).shape[0])
    for i in range(n):
        p = f"layers.{i}"
        for name in ("k_proj", "v_proj", "q_proj", "out_proj"):
            _linear_out(sd, f"{p}.self_attn.{name}", layers["self_attn"][name], i)
        if bias_kv:
            for name in ("bias_k", "bias_v"):
                sd[f"{p}.self_attn.{name}"] = _as_np(
                    layers["self_attn"][name][i]
                ).reshape(1, 1, -1)
        _ln_out(sd, f"{p}.self_attn_layer_norm", layers["self_attn_layer_norm"], i)
        _linear_out(sd, f"{p}.fc1", layers["fc1"], i)
        _linear_out(sd, f"{p}.fc2", layers["fc2"], i)
        _ln_out(sd, f"{p}.final_layer_norm", layers["final_layer_norm"], i)


def export_esm1_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """ESM-1 proper ("protein_bert_base": bias_kv attention, sinusoidal
    positions, untied (V, D) embed_out) param pytree -> the reference's
    canonical state dict (inverse of io/convert.convert_esm1 with
    model_version="ESM-1"). Includes the sinusoidal
    ``embed_positions._float_tensor`` dtype-carrier buffer."""
    if getattr(cfg, "model_version", "ESM-1b") != "ESM-1":
        raise ValueError("export_esm1_state_dict is for model_version='ESM-1'")
    sd: Dict[str, np.ndarray] = {
        "embed_tokens.weight": _as_np(params["embed_tokens"]["weight"]),
        "embed_positions._float_tensor": np.zeros(1, np.float32),
        "embed_out": np.ascontiguousarray(
            _kernel_np(params["embed_out"]).T
        ),  # stored (V, D), embedding-style (reference esm/model/esm1.py:181)
    }
    if "bias" in params["embed_out"]:
        sd["embed_out_bias"] = _as_np(params["embed_out"]["bias"])
    _esm1_layers_out(sd, params, bias_kv=True)
    return sd


def save_esm1(params, cfg, path) -> Tuple[str, Optional[str]]:
    """Write ``<path>`` (+ co-located ``-contact-regression.pt``) loadable by
    the reference's v1 protein_bert_base path (esm/pretrained.py:105-112:
    the decoder-prefix strip lambdas are no-ops on canonical keys)."""
    import argparse
    import os

    import torch

    path = os.fspath(path)
    stem = os.path.basename(path)
    if stem.startswith("esm2"):
        raise ValueError(
            f"file name {stem!r} must not start with 'esm2' (v1 routing, "
            "esm/pretrained.py:190)"
        )
    reg = _contact_regression_or_raise(params, path)
    sd = export_esm1_state_dict(params, cfg)
    model_data = {
        "args": argparse.Namespace(
            arch="protein_bert_base",
            layers=cfg.num_layers,
            embed_dim=cfg.embed_dim,
            ffn_embed_dim=cfg.ffn_embed_dim,
            attention_heads=cfg.attention_heads,
            max_positions=cfg.max_positions,
            final_bias=bool("bias" in params["embed_out"]),
        ),
        "model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
    }
    torch.save(model_data, path)
    return path, _save_regression(reg, path)


def export_esm1b_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """ESM-1b/1v param pytree -> the reference's canonical state dict
    (inverse of io/convert.convert_esm1 for model_version="ESM-1b" — the
    "roberta_large" arch that covers esm1b_t33_650M and every esm1v model).
    ESM-1 proper exports via :func:`save_esm1`."""
    if getattr(cfg, "model_version", "ESM-1b") != "ESM-1b":
        raise ValueError(
            "only model_version='ESM-1b' (roberta_large: ESM-1b/ESM-1v) "
            "exports here; use save_esm1/export_esm1_state_dict for ESM-1's "
            "protein_bert_base layout"
        )
    emb = _as_np(params["embed_tokens"]["weight"])
    sd: Dict[str, np.ndarray] = {
        "embed_tokens.weight": emb,
        "embed_positions.weight": _as_np(params["embed_positions"]["weight"]),
    }
    _esm1_layers_out(sd, params, bias_kv=False)
    if "emb_layer_norm_before" in params:
        _ln_out(sd, "emb_layer_norm_before", params["emb_layer_norm_before"])
    _ln_out(sd, "emb_layer_norm_after", params["emb_layer_norm_after"])
    head = params["lm_head"]
    _linear_out(sd, "lm_head.dense", head["dense"])
    _ln_out(sd, "lm_head.layer_norm", head["layer_norm"])
    sd["lm_head.weight"] = emb  # tied (reference esm/modules.py:303-308)
    sd["lm_head.bias"] = _as_np(head["bias"])
    return sd


def _gvp_out(sd: Dict, key: str, p: Dict) -> None:
    """One GVP perceptron (reference esm/inverse_folding/gvp_modules.py:113-188):
    wh/wv are bias-free, ws always has a bias, wg is present only with
    vector-gated output — presence mirrors the param dict (the inverse of
    convert_if._gvp)."""
    for name in ("wh", "ws", "wv", "wg"):
        if name in p:
            _linear_out(sd, f"{key}.{name}", p[name])


def _gvp_seq_out(sd: Dict, key: str, seq) -> None:
    for i, g in enumerate(seq):
        _gvp_out(sd, f"{key}.{i}", g)


def _tuple_norm_out(sd: Dict, key: str, p: Dict) -> None:
    _ln_out(sd, f"{key}.scalar_norm", p["scalar_norm"])


def export_if1_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """ESM-IF1 (GVPTransformerModel) param pytree -> the reference's canonical
    state dict (post-update_name key layout, inverse of
    io/convert_if.convert_gvp_transformer) — directly comparable to
    ``GVPTransformerModel(...).state_dict()``. Includes the two sinusoidal
    ``embed_positions._float_tensor`` dtype-carrier buffers the reference
    registers (they hold no information; the strict key check requires them)."""
    enc, dec = params["encoder"], params["decoder"]
    sd: Dict[str, np.ndarray] = {
        "encoder.embed_tokens.weight": _as_np(enc["embed_tokens"]["weight"]),
        "encoder.embed_positions._float_tensor": np.zeros(1, np.float32),
    }
    _linear_out(sd, "encoder.embed_gvp_input_features", enc["embed_gvp_input_features"])
    _linear_out(sd, "encoder.embed_confidence", enc["embed_confidence"])
    dih = enc["embed_dihedrals"]
    _linear_out(sd, "encoder.embed_dihedrals.node_embedding", dih["node_embedding"])
    sd["encoder.embed_dihedrals.norm_nodes.gain"] = _as_np(dih["norm_nodes"]["gain"])
    sd["encoder.embed_dihedrals.norm_nodes.bias"] = _as_np(dih["norm_nodes"]["bias"])

    gvp = enc["gvp_encoder"]
    g = "encoder.gvp_encoder.embed_graph"
    _gvp_out(sd, f"{g}.embed_node.0", gvp["embed_graph"]["embed_node_gvp"])
    _tuple_norm_out(sd, f"{g}.embed_node.1", gvp["embed_graph"]["embed_node_norm"])
    _gvp_out(sd, f"{g}.embed_edge.0", gvp["embed_graph"]["embed_edge_gvp"])
    _tuple_norm_out(sd, f"{g}.embed_edge.1", gvp["embed_graph"]["embed_edge_norm"])
    _linear_out(sd, f"{g}.embed_confidence", gvp["embed_graph"]["embed_confidence"])
    for i, layer in enumerate(gvp["encoder_layers"]):
        lp = f"encoder.gvp_encoder.encoder_layers.{i}"
        _gvp_seq_out(sd, f"{lp}.conv.message_func", layer["conv"]["message_func"])
        _tuple_norm_out(sd, f"{lp}.norm.0", layer["norm0"])
        _tuple_norm_out(sd, f"{lp}.norm.1", layer["norm1"])
        _gvp_seq_out(sd, f"{lp}.ff_func", layer["ff_func"])
    _linear_out(sd, "encoder.embed_gvp_output", enc["embed_gvp_output"])

    def _attn_out(key: str, p: Dict) -> None:
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear_out(sd, f"{key}.{name}", p[name])

    for i, layer in enumerate(enc["layers"]):
        p = f"encoder.layers.{i}"
        _attn_out(f"{p}.self_attn", layer["self_attn"])
        _ln_out(sd, f"{p}.self_attn_layer_norm", layer["self_attn_layer_norm"])
        _linear_out(sd, f"{p}.fc1", layer["fc1"])
        _linear_out(sd, f"{p}.fc2", layer["fc2"])
        _ln_out(sd, f"{p}.final_layer_norm", layer["final_layer_norm"])
    _ln_out(sd, "encoder.layer_norm", enc["layer_norm"])

    sd["decoder.embed_tokens.weight"] = _as_np(dec["embed_tokens"]["weight"])
    sd["decoder.embed_positions._float_tensor"] = np.zeros(1, np.float32)
    for i, layer in enumerate(dec["layers"]):
        p = f"decoder.layers.{i}"
        _attn_out(f"{p}.self_attn", layer["self_attn"])
        _ln_out(sd, f"{p}.self_attn_layer_norm", layer["self_attn_layer_norm"])
        _attn_out(f"{p}.encoder_attn", layer["encoder_attn"])
        _ln_out(sd, f"{p}.encoder_attn_layer_norm", layer["encoder_attn_layer_norm"])
        _linear_out(sd, f"{p}.fc1", layer["fc1"])
        _linear_out(sd, f"{p}.fc2", layer["fc2"])
        _ln_out(sd, f"{p}.final_layer_norm", layer["final_layer_norm"])
    _ln_out(sd, "decoder.layer_norm", dec["layer_norm"])
    _linear_out(sd, "decoder.output_projection", dec["output_projection"])
    return sd


def save_if1(params, cfg, path) -> Tuple[str, Optional[str]]:
    """Write ``<path>`` loadable by the reference's v1 invariant_gvp path
    (esm/pretrained.py:134-161): canonical open-source key names pass through
    its historical update_name renames unchanged, the args Namespace carries
    the GVPTransformerModel constructor surface (encoder/decoder dims plus
    the gvp_*-prefixed GVPEncoder args), and no regression file is needed —
    'esm_if' stems are in the reference's no-regression set
    (esm/pretrained.py:18-21), which ``path`` must therefore contain."""
    import argparse
    import os

    import torch

    path = os.fspath(path)
    stem = os.path.basename(path)
    if "esm_if" not in stem:
        raise ValueError(
            f"file name {stem!r} must contain 'esm_if' — that marker is how "
            "the reference loader knows to skip the contact-regression file "
            "(esm/pretrained.py:18-21)"
        )
    sd = export_if1_state_dict(params, cfg)
    model_data = {
        "args": argparse.Namespace(
            # 'invariant_gvp' in arch routes to the GVPTransformerModel
            # branch (esm/pretrained.py:134) and selects the invariant_gvp
            # alphabet (esm/data.py from_architecture)
            arch="vt_invariant_gvp_transformer",
            encoder_embed_dim=cfg.encoder_embed_dim,
            encoder_layers=cfg.encoder_layers,
            encoder_attention_heads=cfg.encoder_attention_heads,
            encoder_ffn_embed_dim=cfg.encoder_ffn_embed_dim,
            decoder_embed_dim=cfg.decoder_embed_dim,
            decoder_layers=cfg.decoder_layers,
            decoder_attention_heads=cfg.decoder_attention_heads,
            decoder_ffn_embed_dim=cfg.decoder_ffn_embed_dim,
            dropout=0.1,
            attention_dropout=0.1,
            gvp_top_k_neighbors=cfg.gvp_top_k_neighbors,
            gvp_node_hidden_dim_scalar=cfg.gvp_node_hidden_dim_scalar,
            gvp_node_hidden_dim_vector=cfg.gvp_node_hidden_dim_vector,
            gvp_edge_hidden_dim_scalar=cfg.gvp_edge_hidden_dim_scalar,
            gvp_edge_hidden_dim_vector=cfg.gvp_edge_hidden_dim_vector,
            gvp_num_encoder_layers=cfg.gvp_num_encoder_layers,
            gvp_dropout=0.1,
        ),
        "model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
    }
    torch.save(model_data, path)
    # (path, regression_path) like every sibling saver; IF1's regression
    # companion is always None ('esm_if' stems are in the reference's
    # no-regression set)
    return path, None


def _subtree(p: Dict, idx: Optional[int]):
    """Slice layer ``idx`` out of a scan-stacked subtree (or pass through)."""
    if idx is None:
        return p
    import jax

    return jax.tree.map(lambda x: np.asarray(x)[idx], p)


def export_esmfold_state_dict(params) -> Dict[str, np.ndarray]:
    """ESMFold param pytree -> the reference checkpoint's state dict (the
    esm/esmfold/v1/* key layout wrapping openfold module names — the exact
    inverse of io/convert_esmfold.convert_esmfold). ``esm.*`` LM keys are
    NOT emitted, mirroring the released files (the reference loader treats
    them as optional, esm/esmfold/v1/pretrained.py:25-36 — the LM ships in
    its own checkpoint, exportable via :func:`save_esm2`). The HF-vendored
    EsmFold* torch modules use the same inner names, so the trunk subtree
    strict-loads into ``transformers`` EsmFoldingTrunk as well."""
    sd: Dict[str, np.ndarray] = {"esm_s_combine": _as_np(params["esm_s_combine"])}

    def mlp3(key: str, p: Dict) -> None:
        # reference nn.Sequential(LayerNorm, Linear, ReLU, Linear) -> .{0,1,3}
        _ln_out(sd, f"{key}.0", p["norm"])
        _linear_out(sd, f"{key}.1", p["fc1"])
        _linear_out(sd, f"{key}.3", p["fc2"])

    mlp3("esm_s_mlp", params["esm_s_mlp"])
    if "esm_z_mlp" in params:
        mlp3("esm_z_mlp", params["esm_z_mlp"])
    sd["embedding.weight"] = _as_np(params["embedding"]["weight"])
    _linear_out(sd, "distogram_head", params["distogram_head"])
    _linear_out(sd, "ptm_head", params["ptm_head"])
    _linear_out(sd, "lm_head", params["lm_head"])
    lddt = params["lddt_head"]
    _ln_out(sd, "lddt_head.0", lddt["norm"])
    _linear_out(sd, "lddt_head.1", lddt["fc1"])
    _linear_out(sd, "lddt_head.2", lddt["fc2"])
    _linear_out(sd, "lddt_head.3", lddt["fc3"])

    trunk = params["trunk"]
    sd["trunk.pairwise_positional_embedding.embedding.weight"] = _as_np(
        trunk["pairwise_positional_embedding"]["embedding"]["weight"]
    )
    _ln_out(sd, "trunk.recycle_s_norm", trunk["recycle_s_norm"])
    _ln_out(sd, "trunk.recycle_z_norm", trunk["recycle_z_norm"])
    sd["trunk.recycle_disto.weight"] = _as_np(trunk["recycle_disto"]["weight"])
    _linear_out(sd, "trunk.trunk2sm_s", trunk["trunk2sm_s"])
    _linear_out(sd, "trunk.trunk2sm_z", trunk["trunk2sm_z"])

    def tri_mul(key: str, p: Dict) -> None:
        _ln_out(sd, f"{key}.layer_norm_in", p["layer_norm_in"])
        _ln_out(sd, f"{key}.layer_norm_out", p["layer_norm_out"])
        for n in ("linear_a_p", "linear_a_g", "linear_b_p", "linear_b_g",
                  "linear_g", "linear_z"):
            _linear_out(sd, f"{key}.{n}", p[n])

    def tri_att(key: str, p: Dict) -> None:
        _ln_out(sd, f"{key}.layer_norm", p["layer_norm"])
        _linear_out(sd, f"{key}.linear", p["linear"])
        for n in ("linear_q", "linear_k", "linear_v", "linear_o", "linear_g"):
            _linear_out(sd, f"{key}.mha.{n}", p["mha"][n])

    blocks = trunk["blocks"]
    n_blocks = int(np.asarray(blocks["layernorm_1"]["scale"]).shape[0])
    for i in range(n_blocks):
        b = _subtree(blocks, i)
        p = f"trunk.blocks.{i}"
        _ln_out(sd, f"{p}.layernorm_1", b["layernorm_1"])
        s2p = b["sequence_to_pair"]
        _ln_out(sd, f"{p}.sequence_to_pair.layernorm", s2p["layernorm"])
        _linear_out(sd, f"{p}.sequence_to_pair.proj", s2p["proj"])
        _linear_out(sd, f"{p}.sequence_to_pair.o_proj", s2p["o_proj"])
        p2s = b["pair_to_sequence"]
        _ln_out(sd, f"{p}.pair_to_sequence.layernorm", p2s["layernorm"])
        _linear_out(sd, f"{p}.pair_to_sequence.linear", p2s["linear"])
        att = b["seq_attention"]
        _linear_out(sd, f"{p}.seq_attention.proj", att["proj"])
        _linear_out(sd, f"{p}.seq_attention.o_proj", att["o_proj"])
        if "g_proj" in att:
            _linear_out(sd, f"{p}.seq_attention.g_proj", att["g_proj"])
        tri_mul(f"{p}.tri_mul_out", b["tri_mul_out"])
        tri_mul(f"{p}.tri_mul_in", b["tri_mul_in"])
        tri_att(f"{p}.tri_att_start", b["tri_att_start"])
        tri_att(f"{p}.tri_att_end", b["tri_att_end"])
        for mlp_name in ("mlp_seq", "mlp_pair"):
            m = b[mlp_name]
            _ln_out(sd, f"{p}.{mlp_name}.mlp.0", m["norm"])
            _linear_out(sd, f"{p}.{mlp_name}.mlp.1", m["fc1"])
            _linear_out(sd, f"{p}.{mlp_name}.mlp.3", m["fc2"])

    sm = trunk["structure_module"]
    p = "trunk.structure_module"
    _ln_out(sd, f"{p}.layer_norm_s", sm["layer_norm_s"])
    _ln_out(sd, f"{p}.layer_norm_z", sm["layer_norm_z"])
    _linear_out(sd, f"{p}.linear_in", sm["linear_in"])
    ipa = sm["ipa"]
    for n in ("linear_q", "linear_kv", "linear_q_points", "linear_kv_points",
              "linear_b", "linear_out"):
        _linear_out(sd, f"{p}.ipa.{n}", ipa[n])
    sd[f"{p}.ipa.head_weights"] = _as_np(ipa["head_weights"])
    _ln_out(sd, f"{p}.layer_norm_ipa", sm["layer_norm_ipa"])
    for i, layer in enumerate(sm["transition"]["layers"]):
        for n in ("linear_1", "linear_2", "linear_3"):
            _linear_out(sd, f"{p}.transition.layers.{i}.{n}", layer[n])
    _ln_out(sd, f"{p}.transition.layer_norm", sm["transition"]["layer_norm"])
    _linear_out(sd, f"{p}.bb_update.linear", sm["bb_update"]["linear"])
    ar = sm["angle_resnet"]
    _linear_out(sd, f"{p}.angle_resnet.linear_in", ar["linear_in"])
    _linear_out(sd, f"{p}.angle_resnet.linear_initial", ar["linear_initial"])
    for i, layer in enumerate(ar["layers"]):
        for n in ("linear_1", "linear_2"):
            _linear_out(sd, f"{p}.angle_resnet.layers.{i}.{n}", layer[n])
    _linear_out(sd, f"{p}.angle_resnet.linear_out", ar["linear_out"])
    return sd


_ESM_TYPE_BY_LAYERS = {6: "esm2_8M", 12: "esm2_35M", 30: "esm2_150M",
                       33: "esm2_650M", 36: "esm2_3B", 48: "esm2_15B"}


def save_esmfold(params, cfg, path, esm_type: Optional[str] = None) -> str:
    """Write ``<path>`` in the reference's esmfold checkpoint format
    ({cfg: {model: ...}, model: state} with esm.* keys absent — the LM rides
    its own checkpoint, reference esm/esmfold/v1/pretrained.py:13-38).

    The released files carry an OmegaConf cfg; this writes one when omegaconf
    is importable (it arrives with ``pip install "fair-esm[esmfold]"``) and
    otherwise falls back to nested argparse.Namespace — which our own
    load_esmfold accepts, but the reference's ``ESMFold(esmfold_config=cfg)``
    needs the OmegaConf form (``FoldingTrunk(**cfg.trunk)`` requires a
    mapping). The reference loader itself needs openfold installed, absent in
    this environment, so the verifiable gates here are (a) the trunk subtree
    strict-loading into the HF-vendored EsmFoldingTrunk (same key layout)
    and (b) a byte-exact load_esmfold round trip — both in
    tests/test_fullsize_conversion.py."""
    import os

    import torch

    path = os.fspath(path)
    esm_type = (
        esm_type
        or getattr(cfg, "esm_type", None)  # round-tripped by load_esmfold
        or _ESM_TYPE_BY_LAYERS.get(cfg.esm.num_layers)
    )
    if esm_type is None:
        raise ValueError(
            f"no reference esm_type for a {cfg.esm.num_layers}-layer LM; pass "
            "esm_type= explicitly (reference esm/esmfold/v1/esmfold.py:35-47)"
        )
    smc = cfg.trunk.structure_module
    cfg_dict = {
        "_name": "ESMFoldConfig",
        "esm_type": esm_type,
        "fp16_esm": True,  # the reference default (esmfold.py:62)
        "use_esm_attn_map": bool(cfg.use_esm_attn_map),
        "esm_ablate_pairwise": False,
        "esm_ablate_sequence": False,
        "esm_input_dropout": 0,
        "trunk": {
            "_name": "FoldingTrunkConfig",
            "num_blocks": cfg.trunk.num_blocks,
            "sequence_state_dim": cfg.trunk.sequence_state_dim,
            "pairwise_state_dim": cfg.trunk.pairwise_state_dim,
            "sequence_head_width": cfg.trunk.sequence_head_width,
            "pairwise_head_width": cfg.trunk.pairwise_head_width,
            "position_bins": cfg.trunk.position_bins,
            "dropout": 0,
            "layer_drop": 0,
            "cpu_grad_checkpoint": False,
            "max_recycles": cfg.trunk.max_recycles,
            "chunk_size": cfg.trunk.chunk_size,
            "structure_module": {
                "c_s": smc.c_s, "c_z": smc.c_z, "c_ipa": smc.c_ipa,
                "c_resnet": smc.c_resnet, "no_heads_ipa": smc.no_heads_ipa,
                "no_qk_points": smc.no_qk_points, "no_v_points": smc.no_v_points,
                "dropout_rate": smc.dropout_rate, "no_blocks": smc.no_blocks,
                "no_transition_layers": smc.no_transition_layers,
                "no_resnet_blocks": smc.no_resnet_blocks,
                "no_angles": smc.no_angles,
                "trans_scale_factor": smc.trans_scale_factor,
                "epsilon": smc.epsilon, "inf": smc.inf,
            },
        },
        "lddt_head_hid_dim": cfg.lddt_head_hid_dim,
    }
    try:
        from omegaconf import OmegaConf

        cfg_obj = OmegaConf.create(cfg_dict)
    except ImportError:
        import argparse

        def ns(d):
            return argparse.Namespace(
                **{k: ns(v) if isinstance(v, dict) else v for k, v in d.items()}
            )

        cfg_obj = ns(cfg_dict)
    sd = export_esmfold_state_dict(params)
    torch.save(
        {
            "cfg": {"model": cfg_obj},
            "model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        },
        path,
    )
    return path


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
    reg = _contact_regression_or_raise(params, path)
    mask_idx = getattr(cfg, "mask_idx", None)
    if mask_idx is not None and np.any(
        _as_np(params["embed_tokens"]["weight"])[mask_idx] != 0
    ):
        import warnings

        warnings.warn(
            "embed_tokens row for <mask> is nonzero; the reference v1 loader "
            "zeroes it at load time (esm/pretrained.py:100) — weights "
            "fine-tuned with token_dropout=False will NOT round-trip that row"
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
    return path, _save_regression(reg, path)
