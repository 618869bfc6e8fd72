"""ESM-IF1 (GVPTransformerModel) torch state-dict -> JAX pytree conversion.

Accepts the reference checkpoint naming (esm/inverse_folding/*, post
key-upgrade from esm/pretrained.py:128-152).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

from .convert import _layer_norm, _linear, _np


def _gvp(sd: Mapping, p: str) -> Dict:
    out = {}
    if f"{p}.wh.weight" in sd:
        out["wh"] = _linear(sd, f"{p}.wh")
    out["ws"] = _linear(sd, f"{p}.ws")
    if f"{p}.wv.weight" in sd:
        out["wv"] = _linear(sd, f"{p}.wv")
    if f"{p}.wg.weight" in sd:
        out["wg"] = _linear(sd, f"{p}.wg")
    return out


def _tuple_norm(sd: Mapping, p: str) -> Dict:
    return {"scalar_norm": _layer_norm(sd, f"{p}.scalar_norm")}


def _gvp_seq(sd: Mapping, p: str) -> list:
    out = []
    i = 0
    while f"{p}.{i}.ws.weight" in sd:
        out.append(_gvp(sd, f"{p}.{i}"))
        i += 1
    return out


def _attn(sd: Mapping, p: str) -> Dict:
    return {
        "q_proj": _linear(sd, f"{p}.q_proj"),
        "k_proj": _linear(sd, f"{p}.k_proj"),
        "v_proj": _linear(sd, f"{p}.v_proj"),
        "out_proj": _linear(sd, f"{p}.out_proj"),
    }


def _enc_layer(sd: Mapping, p: str) -> Dict:
    return {
        "self_attn": _attn(sd, f"{p}.self_attn"),
        "self_attn_layer_norm": _layer_norm(sd, f"{p}.self_attn_layer_norm"),
        "fc1": _linear(sd, f"{p}.fc1"),
        "fc2": _linear(sd, f"{p}.fc2"),
        "final_layer_norm": _layer_norm(sd, f"{p}.final_layer_norm"),
    }


def _dec_layer(sd: Mapping, p: str) -> Dict:
    out = _enc_layer(sd, p)
    out["encoder_attn"] = _attn(sd, f"{p}.encoder_attn")
    out["encoder_attn_layer_norm"] = _layer_norm(sd, f"{p}.encoder_attn_layer_norm")
    return out


def _n_layers(sd: Mapping, pat: str) -> int:
    n = 0
    rex = re.compile(pat)
    for k in sd:
        m = rex.match(k)
        if m:
            n = max(n, int(m.group(1)) + 1)
    return n


def convert_gvp_encoder(sd: Mapping, p: str) -> Dict:
    n = _n_layers(sd, rf"^{re.escape(p)}\.encoder_layers\.(\d+)\.")
    layers = []
    for i in range(n):
        lp = f"{p}.encoder_layers.{i}"
        layers.append(
            {
                "conv": {"message_func": _gvp_seq(sd, f"{lp}.conv.message_func")},
                "norm0": _tuple_norm(sd, f"{lp}.norm.0"),
                "norm1": _tuple_norm(sd, f"{lp}.norm.1"),
                "ff_func": _gvp_seq(sd, f"{lp}.ff_func"),
            }
        )
    g = f"{p}.embed_graph"
    return {
        "embed_graph": {
            "embed_node_gvp": _gvp(sd, f"{g}.embed_node.0"),
            "embed_node_norm": _tuple_norm(sd, f"{g}.embed_node.1"),
            "embed_edge_gvp": _gvp(sd, f"{g}.embed_edge.0"),
            "embed_edge_norm": _tuple_norm(sd, f"{g}.embed_edge.1"),
            "embed_confidence": _linear(sd, f"{g}.embed_confidence"),
        },
        "encoder_layers": layers,
    }


def convert_gvp_transformer(sd: Mapping) -> Dict:
    """Full GVPTransformerModel state dict -> param pytree."""
    ne = _n_layers(sd, r"^encoder\.layers\.(\d+)\.")
    nd = _n_layers(sd, r"^decoder\.layers\.(\d+)\.")
    encoder = {
        "embed_tokens": {"weight": _np(sd["encoder.embed_tokens.weight"])},
        "embed_gvp_input_features": _linear(sd, "encoder.embed_gvp_input_features"),
        "embed_confidence": _linear(sd, "encoder.embed_confidence"),
        "embed_dihedrals": {
            "node_embedding": _linear(sd, "encoder.embed_dihedrals.node_embedding"),
            "norm_nodes": {
                "gain": _np(sd["encoder.embed_dihedrals.norm_nodes.gain"]),
                "bias": _np(sd["encoder.embed_dihedrals.norm_nodes.bias"]),
            },
        },
        "gvp_encoder": convert_gvp_encoder(sd, "encoder.gvp_encoder"),
        "embed_gvp_output": _linear(sd, "encoder.embed_gvp_output"),
        "layers": [_enc_layer(sd, f"encoder.layers.{i}") for i in range(ne)],
        "layer_norm": _layer_norm(sd, "encoder.layer_norm"),
    }
    decoder = {
        "embed_tokens": {"weight": _np(sd["decoder.embed_tokens.weight"])},
        "layers": [_dec_layer(sd, f"decoder.layers.{i}") for i in range(nd)],
        "layer_norm": _layer_norm(sd, "decoder.layer_norm"),
        "output_projection": _linear(sd, "decoder.output_projection"),
    }
    return {"encoder": encoder, "decoder": decoder}
