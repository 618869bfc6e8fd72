"""Random initialization for ESMFold params (for testing/benchmarks; real use
loads checkpoints via io/convert_esmfold). Distributions approximate the
reference's (lecun/zero-init final layers); checkpoint loads overwrite them."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...data.alphabet import Alphabet
from ...ops.common import init_layer_norm, init_linear_torch_default
from .. import esm2
from .esmfold import ESMFoldConfig, af2_to_esm_table


class _KeyGen:
    def __init__(self, key):
        self.key = key

    def __call__(self):
        self.key, k = jax.random.split(self.key)
        return k


def _lin(kg, i, o, bias=True, zero=False, dtype=jnp.float32):
    if zero:
        p = {"kernel": jnp.zeros((i, o), dtype)}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p
    return init_linear_torch_default(kg(), i, o, bias=bias, dtype=dtype)


def init_trunk_block(kg, c_s, c_z, seq_head_width=32, pair_head_width=32, dtype=jnp.float32):
    return {
        "layernorm_1": init_layer_norm(c_s, dtype),
        "sequence_to_pair": {
            "layernorm": init_layer_norm(c_s, dtype),
            "proj": _lin(kg, c_s, c_z),
            "o_proj": _lin(kg, c_z, c_z, zero=True),
        },
        "pair_to_sequence": {
            "layernorm": init_layer_norm(c_z, dtype),
            "linear": _lin(kg, c_z, c_s // seq_head_width, bias=False, zero=True),
        },
        "seq_attention": {
            "proj": _lin(kg, c_s, 3 * c_s, bias=False),
            "o_proj": _lin(kg, c_s, c_s, zero=True),
            "g_proj": {
                "kernel": jnp.zeros((c_s, c_s), dtype),
                "bias": jnp.ones((c_s,), dtype),
            },
        },
        "tri_mul_out": _init_tri_mul(kg, c_z, dtype),
        "tri_mul_in": _init_tri_mul(kg, c_z, dtype),
        "tri_att_start": _init_tri_att(kg, c_z, c_z // pair_head_width, dtype),
        "tri_att_end": _init_tri_att(kg, c_z, c_z // pair_head_width, dtype),
        "mlp_seq": {
            "norm": init_layer_norm(c_s, dtype),
            "fc1": _lin(kg, c_s, 4 * c_s),
            "fc2": _lin(kg, 4 * c_s, c_s, zero=True),
        },
        "mlp_pair": {
            "norm": init_layer_norm(c_z, dtype),
            "fc1": _lin(kg, c_z, 4 * c_z),
            "fc2": _lin(kg, 4 * c_z, c_z, zero=True),
        },
    }


def _init_tri_mul(kg, c_z, dtype):
    return {
        "layer_norm_in": init_layer_norm(c_z, dtype),
        "layer_norm_out": init_layer_norm(c_z, dtype),
        "linear_a_p": _lin(kg, c_z, c_z),
        "linear_a_g": _lin(kg, c_z, c_z),
        "linear_b_p": _lin(kg, c_z, c_z),
        "linear_b_g": _lin(kg, c_z, c_z),
        "linear_g": _lin(kg, c_z, c_z),
        "linear_z": _lin(kg, c_z, c_z, zero=True),
    }


def _init_tri_att(kg, c_z, heads, dtype):
    return {
        "layer_norm": init_layer_norm(c_z, dtype),
        "linear": _lin(kg, c_z, heads, bias=False),
        "mha": {
            "linear_q": _lin(kg, c_z, c_z, bias=False),
            "linear_k": _lin(kg, c_z, c_z, bias=False),
            "linear_v": _lin(kg, c_z, c_z, bias=False),
            "linear_o": _lin(kg, c_z, c_z, zero=True),
            "linear_g": _lin(kg, c_z, c_z),
        },
    }


def init_structure_module(kg, cfg, dtype=jnp.float32):
    c_s, c_z, c_ipa = cfg.c_s, cfg.c_z, cfg.c_ipa
    h, pq, pv = cfg.no_heads_ipa, cfg.no_qk_points, cfg.no_v_points
    return {
        "layer_norm_s": init_layer_norm(c_s, dtype),
        "layer_norm_z": init_layer_norm(c_z, dtype),
        "linear_in": _lin(kg, c_s, c_s),
        "ipa": {
            "linear_q": _lin(kg, c_s, h * c_ipa),
            "linear_kv": _lin(kg, c_s, 2 * h * c_ipa),
            "linear_q_points": _lin(kg, c_s, h * pq * 3),
            "linear_kv_points": _lin(kg, c_s, h * (pq + pv) * 3),
            "linear_b": _lin(kg, c_z, h),
            "head_weights": jnp.zeros((h,), dtype),
            "linear_out": _lin(kg, h * (c_z + c_ipa + pv * 4), c_s, zero=True),
        },
        "layer_norm_ipa": init_layer_norm(c_s, dtype),
        "transition": {
            "layers": [
                {
                    "linear_1": _lin(kg, c_s, c_s),
                    "linear_2": _lin(kg, c_s, c_s),
                    "linear_3": _lin(kg, c_s, c_s, zero=True),
                }
                for _ in range(cfg.no_transition_layers)
            ],
            "layer_norm": init_layer_norm(c_s, dtype),
        },
        "bb_update": {"linear": _lin(kg, c_s, 6, zero=True)},
        "angle_resnet": {
            "linear_in": _lin(kg, c_s, cfg.c_resnet),
            "linear_initial": _lin(kg, c_s, cfg.c_resnet),
            "layers": [
                {
                    "linear_1": _lin(kg, cfg.c_resnet, cfg.c_resnet),
                    "linear_2": _lin(kg, cfg.c_resnet, cfg.c_resnet),
                }
                for _ in range(cfg.no_resnet_blocks)
            ],
            "linear_out": _lin(kg, cfg.c_resnet, cfg.no_angles * 2),
        },
    }


def init_esmfold(key, cfg: ESMFoldConfig, alphabet: Alphabet, dtype=jnp.float32):
    kg = _KeyGen(key)
    tc = cfg.trunk
    c_s, c_z = tc.sequence_state_dim, tc.pairwise_state_dim
    esm_params = esm2.init(kg(), cfg.esm, dtype)

    blocks = [
        init_trunk_block(
            kg, c_s, c_z, tc.sequence_head_width, tc.pairwise_head_width, dtype
        )
        for _ in range(tc.num_blocks)
    ]
    blocks_stacked = (
        jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks) if blocks else None
    )
    trunk = {
        "pairwise_positional_embedding": {
            "embedding": {
                "weight": 0.02
                * jax.random.normal(kg(), (2 * tc.position_bins + 2, c_z), dtype)
            }
        },
        "blocks": blocks_stacked,
        "recycle_s_norm": init_layer_norm(c_s, dtype),
        "recycle_z_norm": init_layer_norm(c_z, dtype),
        "recycle_disto": {
            "weight": 0.02 * jax.random.normal(kg(), (15, c_z), dtype)
        },
        "structure_module": init_structure_module(kg, tc.structure_module, dtype),
        "trunk2sm_s": _lin(kg, c_s, tc.structure_module.c_s),
        "trunk2sm_z": _lin(kg, c_z, tc.structure_module.c_z),
    }

    esm_feats = cfg.esm.embed_dim
    out = {
        "esm": esm_params,
        "af2_to_esm": jnp.asarray(af2_to_esm_table(alphabet)),
        "esm_s_combine": jnp.zeros((cfg.esm.num_layers + 1,), dtype),
        "esm_s_mlp": {
            "norm": init_layer_norm(esm_feats, dtype),
            "fc1": _lin(kg, esm_feats, c_s),
            "fc2": _lin(kg, c_s, c_s),
        },
        "embedding": {
            "weight": 0.02 * jax.random.normal(kg(), (cfg.n_tokens_embed, c_s), dtype)
        },
        "trunk": trunk,
        "distogram_head": _lin(kg, c_z, cfg.distogram_bins),
        "ptm_head": _lin(kg, c_z, cfg.distogram_bins),
        "lm_head": _lin(kg, c_s, cfg.n_tokens_embed),
        "lddt_head": {
            "norm": init_layer_norm(tc.structure_module.c_s, dtype),
            "fc1": _lin(kg, tc.structure_module.c_s, cfg.lddt_head_hid_dim),
            "fc2": _lin(kg, cfg.lddt_head_hid_dim, cfg.lddt_head_hid_dim),
            "fc3": _lin(kg, cfg.lddt_head_hid_dim, 37 * cfg.lddt_bins),
        },
    }
    if cfg.use_esm_attn_map:
        esm_attns = cfg.esm.num_layers * cfg.esm.attention_heads
        out["esm_z_mlp"] = {
            "norm": init_layer_norm(esm_attns, dtype),
            "fc1": _lin(kg, esm_attns, c_z),
            "fc2": _lin(kg, c_z, c_z),
        }
    return out
