"""ESMFold torch state-dict -> JAX pytree conversion.

Accepts the reference checkpoint naming (esm/esmfold/v1/* wrapping openfold
module names: tri_mul_out.linear_a_p, ipa.linear_q_points, ...). The
HuggingFace-vendored EsmFold* torch modules use the same inner names, so they
double as the numeric-parity oracle in tests.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .convert import _layer_norm, _linear, _np, _stack


def convert_gated_attention(sd: Mapping, p: str) -> Dict:
    out = {
        "proj": _linear(sd, f"{p}.proj"),
        "o_proj": _linear(sd, f"{p}.o_proj"),
    }
    if f"{p}.g_proj.weight" in sd:
        out["g_proj"] = _linear(sd, f"{p}.g_proj")
    return out


def convert_seq_to_pair(sd: Mapping, p: str) -> Dict:
    return {
        "layernorm": _layer_norm(sd, f"{p}.layernorm"),
        "proj": _linear(sd, f"{p}.proj"),
        "o_proj": _linear(sd, f"{p}.o_proj"),
    }


def convert_pair_to_seq(sd: Mapping, p: str) -> Dict:
    return {
        "layernorm": _layer_norm(sd, f"{p}.layernorm"),
        "linear": _linear(sd, f"{p}.linear"),
    }


def convert_residue_mlp(sd: Mapping, p: str) -> Dict:
    # reference: nn.Sequential(norm, linear, ReLU, linear, Dropout) -> mlp.{0,1,3}
    return {
        "norm": _layer_norm(sd, f"{p}.mlp.0"),
        "fc1": _linear(sd, f"{p}.mlp.1"),
        "fc2": _linear(sd, f"{p}.mlp.3"),
    }


def convert_tri_mul(sd: Mapping, p: str) -> Dict:
    return {
        "layer_norm_in": _layer_norm(sd, f"{p}.layer_norm_in"),
        "layer_norm_out": _layer_norm(sd, f"{p}.layer_norm_out"),
        "linear_a_p": _linear(sd, f"{p}.linear_a_p"),
        "linear_a_g": _linear(sd, f"{p}.linear_a_g"),
        "linear_b_p": _linear(sd, f"{p}.linear_b_p"),
        "linear_b_g": _linear(sd, f"{p}.linear_b_g"),
        "linear_g": _linear(sd, f"{p}.linear_g"),
        "linear_z": _linear(sd, f"{p}.linear_z"),
    }


def convert_tri_att(sd: Mapping, p: str) -> Dict:
    return {
        "layer_norm": _layer_norm(sd, f"{p}.layer_norm"),
        "linear": _linear(sd, f"{p}.linear"),
        "mha": {
            "linear_q": _linear(sd, f"{p}.mha.linear_q"),
            "linear_k": _linear(sd, f"{p}.mha.linear_k"),
            "linear_v": _linear(sd, f"{p}.mha.linear_v"),
            "linear_o": _linear(sd, f"{p}.mha.linear_o"),
            "linear_g": _linear(sd, f"{p}.mha.linear_g"),
        },
    }


def convert_trunk_block(sd: Mapping, p: str) -> Dict:
    return {
        "layernorm_1": _layer_norm(sd, f"{p}.layernorm_1"),
        "sequence_to_pair": convert_seq_to_pair(sd, f"{p}.sequence_to_pair"),
        "pair_to_sequence": convert_pair_to_seq(sd, f"{p}.pair_to_sequence"),
        "seq_attention": convert_gated_attention(sd, f"{p}.seq_attention"),
        "tri_mul_out": convert_tri_mul(sd, f"{p}.tri_mul_out"),
        "tri_mul_in": convert_tri_mul(sd, f"{p}.tri_mul_in"),
        "tri_att_start": convert_tri_att(sd, f"{p}.tri_att_start"),
        "tri_att_end": convert_tri_att(sd, f"{p}.tri_att_end"),
        "mlp_seq": convert_residue_mlp(sd, f"{p}.mlp_seq"),
        "mlp_pair": convert_residue_mlp(sd, f"{p}.mlp_pair"),
    }


def convert_structure_module(sd: Mapping, p: str = "structure_module") -> Dict:
    def layers(prefix: str, names) -> list:
        out = []
        i = 0
        while f"{p}.{prefix}.{i}.{names[0]}.weight" in sd:
            out.append({n: _linear(sd, f"{p}.{prefix}.{i}.{n}") for n in names})
            i += 1
        return out

    return {
        "layer_norm_s": _layer_norm(sd, f"{p}.layer_norm_s"),
        "layer_norm_z": _layer_norm(sd, f"{p}.layer_norm_z"),
        "linear_in": _linear(sd, f"{p}.linear_in"),
        "ipa": {
            "linear_q": _linear(sd, f"{p}.ipa.linear_q"),
            "linear_kv": _linear(sd, f"{p}.ipa.linear_kv"),
            "linear_q_points": _linear(sd, f"{p}.ipa.linear_q_points"),
            "linear_kv_points": _linear(sd, f"{p}.ipa.linear_kv_points"),
            "linear_b": _linear(sd, f"{p}.ipa.linear_b"),
            "head_weights": _np(sd[f"{p}.ipa.head_weights"]),
            "linear_out": _linear(sd, f"{p}.ipa.linear_out"),
        },
        "layer_norm_ipa": _layer_norm(sd, f"{p}.layer_norm_ipa"),
        "transition": {
            "layers": layers("transition.layers", ["linear_1", "linear_2", "linear_3"]),
            "layer_norm": _layer_norm(sd, f"{p}.transition.layer_norm"),
        },
        "bb_update": {"linear": _linear(sd, f"{p}.bb_update.linear")},
        "angle_resnet": {
            "linear_in": _linear(sd, f"{p}.angle_resnet.linear_in"),
            "linear_initial": _linear(sd, f"{p}.angle_resnet.linear_initial"),
            "layers": layers("angle_resnet.layers", ["linear_1", "linear_2"]),
            "linear_out": _linear(sd, f"{p}.angle_resnet.linear_out"),
        },
    }


def convert_trunk(sd: Mapping, p: str = "trunk") -> Dict:
    import re

    n = 0
    pat = re.compile(rf"^{p}\.blocks\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            n = max(n, int(m.group(1)) + 1)
    return {
        "pairwise_positional_embedding": {
            "embedding": {"weight": _np(sd[f"{p}.pairwise_positional_embedding.embedding.weight"])}
        },
        "blocks": (
            _stack([convert_trunk_block(sd, f"{p}.blocks.{i}") for i in range(n)])
            if n > 0
            else None
        ),
        "recycle_s_norm": _layer_norm(sd, f"{p}.recycle_s_norm"),
        "recycle_z_norm": _layer_norm(sd, f"{p}.recycle_z_norm"),
        "recycle_disto": {"weight": _np(sd[f"{p}.recycle_disto.weight"])},
        "structure_module": convert_structure_module(sd, f"{p}.structure_module"),
        "trunk2sm_s": _linear(sd, f"{p}.trunk2sm_s"),
        "trunk2sm_z": _linear(sd, f"{p}.trunk2sm_z"),
    }


def convert_esmfold(sd: Mapping) -> Dict:
    """Top-level ESMFold params (excluding the ESM-2 LM, which is converted
    separately via convert_esm2 from the LM checkpoint — reference
    esm/esmfold/v1/pretrained.py:25-36 tolerates absent esm.* keys)."""
    params: Dict = {
        "esm_s_combine": _np(sd["esm_s_combine"]),
        "esm_s_mlp": {
            "norm": _layer_norm(sd, "esm_s_mlp.0"),
            "fc1": _linear(sd, "esm_s_mlp.1"),
            "fc2": _linear(sd, "esm_s_mlp.3"),
        },
        "embedding": {"weight": _np(sd["embedding.weight"])},
        "trunk": convert_trunk(sd),
        "distogram_head": _linear(sd, "distogram_head"),
        "ptm_head": _linear(sd, "ptm_head"),
        "lm_head": _linear(sd, "lm_head"),
        "lddt_head": {
            "norm": _layer_norm(sd, "lddt_head.0"),
            "fc1": _linear(sd, "lddt_head.1"),
            "fc2": _linear(sd, "lddt_head.2"),
            "fc3": _linear(sd, "lddt_head.3"),
        },
    }
    if "esm_z_mlp.0.weight" in sd:
        params["esm_z_mlp"] = {
            "norm": _layer_norm(sd, "esm_z_mlp.0"),
            "fc1": _linear(sd, "esm_z_mlp.1"),
            "fc2": _linear(sd, "esm_z_mlp.3"),
        }
    return params
