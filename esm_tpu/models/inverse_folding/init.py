"""Random initialization for the GVP-Transformer (ESM-IF1) parameter pytree.

Emits the exact tree layout of ``esm_tpu.io.convert_if.convert_gvp_transformer``
(which ingests the reference checkpoint, esm/inverse_folding/gvp_transformer.py),
so randomly-initialized models are drop-in interchangeable with converted
checkpoints — used for from-scratch experiments, tutorials, and tests in
environments without the released weights.

GVP dimension rules follow the reference constructors
(esm/inverse_folding/gvp_modules.py:125-143,285-308,349-391 and
features.py:258-280): h_dim = max(vi, vo); wh/wv bias-free; wg ("wsv") only on
vector-gated GVPs; final GVPs of message/feed-forward MLPs are activation-free
and ungated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..esmfold.init import _KeyGen
from .model import GVPTransformerConfig


def _linear(kg, d_in: int, d_out: int, bias: bool = True):
    p = {"kernel": jax.random.normal(kg(), (d_in, d_out)) * (d_in ** -0.5)}
    if bias:
        p["bias"] = jnp.zeros((d_out,))
    return p


def _ln(dim: int):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _gvp(kg, si: int, vi: int, so: int, vo: int, gate: bool):
    h = max(vi, vo)
    p = {}
    if vi:
        p["wh"] = _linear(kg, vi, h, bias=False)
        p["ws"] = _linear(kg, h + si, so)
    else:
        p["ws"] = _linear(kg, si, so)
    if vo:
        p["wv"] = _linear(kg, h, vo, bias=False)
        if gate:
            p["wg"] = _linear(kg, so, vo)
    return p


def _gvp_conv_layer(kg, ns: int, nv: int, es: int, ev: int):
    return {
        "conv": {
            "message_func": [
                _gvp(kg, 2 * ns + es, 2 * nv + ev, ns, nv, gate=True),
                _gvp(kg, ns, nv, ns, nv, gate=True),
                _gvp(kg, ns, nv, ns, nv, gate=False),
            ]
        },
        "norm0": {"scalar_norm": _ln(ns)},
        "norm1": {"scalar_norm": _ln(ns)},
        "ff_func": [
            _gvp(kg, ns, nv, 4 * ns, 2 * nv, gate=True),
            _gvp(kg, 4 * ns, 2 * nv, ns, nv, gate=False),
        ],
    }


def _enc_layer(kg, c: int, ffn: int):
    return {
        "self_attn": {
            "q_proj": _linear(kg, c, c),
            "k_proj": _linear(kg, c, c),
            "v_proj": _linear(kg, c, c),
            "out_proj": _linear(kg, c, c),
        },
        "self_attn_layer_norm": _ln(c),
        "fc1": _linear(kg, c, ffn),
        "fc2": _linear(kg, ffn, c),
        "final_layer_norm": _ln(c),
    }


def _dec_layer(kg, c: int, c_enc: int, ffn: int):
    p = _enc_layer(kg, c, ffn)
    p["encoder_attn"] = {
        "q_proj": _linear(kg, c, c),
        "k_proj": _linear(kg, c_enc, c),
        "v_proj": _linear(kg, c_enc, c),
        "out_proj": _linear(kg, c, c),
    }
    p["encoder_attn_layer_norm"] = _ln(c)
    return p


def init(key, cfg: GVPTransformerConfig):
    """Random GVPTransformer params with the converter's tree layout."""
    kg = _KeyGen(key)
    v = cfg.alphabet_size
    ce, cd = cfg.encoder_embed_dim, cfg.decoder_embed_dim
    ns, nv = cfg.gvp_node_hidden_dim_scalar, cfg.gvp_node_hidden_dim_vector
    es, ev = cfg.gvp_edge_hidden_dim_scalar, cfg.gvp_edge_hidden_dim_vector

    encoder = {
        "embed_tokens": {"weight": jax.random.normal(kg(), (v, ce)) * (ce ** -0.5)},
        "embed_gvp_input_features": _linear(kg, 15, ce),
        "embed_confidence": _linear(kg, 16, ce),
        "embed_dihedrals": {
            "node_embedding": _linear(kg, 6, ce),
            "norm_nodes": {"gain": jnp.ones((ce,)), "bias": jnp.zeros((ce,))},
        },
        "gvp_encoder": {
            "embed_graph": {
                "embed_node_gvp": _gvp(kg, 7, 3, ns, nv, gate=False),
                "embed_node_norm": {"scalar_norm": _ln(ns)},
                "embed_edge_gvp": _gvp(kg, 34, 1, es, ev, gate=False),
                "embed_edge_norm": {"scalar_norm": _ln(es)},
                "embed_confidence": _linear(kg, 16, ns),
            },
            "encoder_layers": [
                _gvp_conv_layer(kg, ns, nv, es, ev)
                for _ in range(cfg.gvp_num_encoder_layers)
            ],
        },
        "embed_gvp_output": _linear(kg, ns + 3 * nv, ce),
        "layers": [
            _enc_layer(kg, ce, cfg.encoder_ffn_embed_dim)
            for _ in range(cfg.encoder_layers)
        ],
        "layer_norm": _ln(ce),
    }
    decoder = {
        "embed_tokens": {"weight": jax.random.normal(kg(), (v, cd)) * (cd ** -0.5)},
        "layers": [
            _dec_layer(kg, cd, ce, cfg.decoder_ffn_embed_dim)
            for _ in range(cfg.decoder_layers)
        ],
        "layer_norm": _ln(cd),
        # reference transformer_decoder.py output projection is bias-free
        "output_projection": _linear(kg, cd, v, bias=False),
    }
    return {"encoder": encoder, "decoder": decoder}
