"""ESM-1 / ESM-1b / ESM-1v protein language models (TPU-native).

Reference semantics: esm/model/esm1.py (ProteinBertModel).
  * ESM-1b (arch "roberta_large"): learned positional embedding, optional
    pre-embedding LN, final LN, tied RobertaLMHead, standard LN (eps 1e-5).
  * ESM-1 : sinusoidal positional embedding, embed_scale=sqrt(d), bias_kv
    attention token (stripped from returned attention maps), untied embed_out
    projection, TF-style LN (eps 1e-12).
ESM-1v is the ESM-1b architecture at 650M scale with token_dropout.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.alphabet import Alphabet
from ..ops.common import materialize_kernel, init_embedding, init_layer_norm, init_linear_torch_default, layer_norm
from ..ops.heads import contact_head, roberta_lm_head
from ..ops.positional import learned_positional_embedding, sinusoidal_positional_embedding
from .lm_common import normalize_repr_layers, LayerStatic, init_transformer_stack, transformer_stack_apply


@dataclass(frozen=True)
class ESM1Config:
    model_version: str = "ESM-1b"   # "ESM-1b" or "ESM-1"
    num_layers: int = 33
    embed_dim: int = 1280
    ffn_embed_dim: int = 5120
    attention_heads: int = 20
    max_positions: int = 1024
    emb_layer_norm_before: bool = True
    token_dropout: bool = False
    final_bias: bool = True          # ESM-1 only: bias on embed_out
    # Alphabet-derived; None = fill from the architecture's alphabet in
    # __post_init__ (ESM-1 and ESM-1b have different token layouts)
    alphabet_size: int = 33
    padding_idx: int = 1
    mask_idx: Optional[int] = None
    cls_idx: Optional[int] = None
    eos_idx: int = 2
    prepend_bos: bool = True
    append_eos: Optional[bool] = None
    # Execution
    compute_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    def __post_init__(self):
        from ..data.alphabet import Alphabet

        if self.mask_idx is None or self.cls_idx is None or self.append_eos is None:
            a = Alphabet.from_architecture(self.model_version)
            if self.mask_idx is None:
                object.__setattr__(self, "mask_idx", a.mask_idx)
            if self.cls_idx is None:
                object.__setattr__(self, "cls_idx", a.cls_idx)
            if self.append_eos is None:
                object.__setattr__(self, "append_eos", a.append_eos)

    @property
    def is_1b(self) -> bool:
        return self.model_version == "ESM-1b"

    @classmethod
    def from_alphabet(cls, alphabet: Alphabet, **kw) -> "ESM1Config":
        return cls(
            alphabet_size=len(alphabet),
            padding_idx=alphabet.padding_idx,
            mask_idx=alphabet.mask_idx,
            cls_idx=alphabet.cls_idx,
            eos_idx=alphabet.eos_idx,
            prepend_bos=alphabet.prepend_bos,
            append_eos=alphabet.append_eos,
            **kw,
        )

    def layer_static(self) -> LayerStatic:
        return LayerStatic(
            num_heads=self.attention_heads,
            use_rotary=False,
            use_bias_kv=not self.is_1b,
            ln_eps=1e-5 if self.is_1b else 1e-12,
            use_flash=self.use_flash,
        )


def init(key: jax.Array, cfg: ESM1Config, dtype=jnp.float32):
    k_embed, k_layers, k_head, k_pos = jax.random.split(key, 4)
    d = cfg.embed_dim
    params = {
        "embed_tokens": init_embedding(
            k_embed, cfg.alphabet_size, d, padding_idx=cfg.padding_idx, dtype=dtype
        ),
        "layers": init_transformer_stack(
            k_layers, cfg.num_layers, d, cfg.ffn_embed_dim,
            use_bias_kv=not cfg.is_1b, dtype=dtype,
        ),
        "contact_head": {
            "regression": {
                "kernel": jnp.zeros((cfg.num_layers * cfg.attention_heads, 1), dtype),
                "bias": jnp.zeros((1,), dtype),
            }
        },
    }
    if cfg.is_1b:
        params["embed_positions"] = init_embedding(
            k_pos, cfg.max_positions + cfg.padding_idx + 1, d,
            padding_idx=cfg.padding_idx, dtype=dtype,
        )
        if cfg.emb_layer_norm_before:
            params["emb_layer_norm_before"] = init_layer_norm(d, dtype)
        params["emb_layer_norm_after"] = init_layer_norm(d, dtype)
        params["lm_head"] = {
            "dense": init_linear_torch_default(k_head, d, d, dtype=dtype),
            "layer_norm": init_layer_norm(d, dtype),
            "bias": jnp.zeros((cfg.alphabet_size,), dtype),
        }
    else:
        embed_out = {"kernel": jnp.zeros((d, cfg.alphabet_size), dtype)}
        if cfg.final_bias:
            embed_out["bias"] = jnp.zeros((cfg.alphabet_size,), dtype)
        params["embed_out"] = embed_out
    return params


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "need_head_weights", "return_contacts", "return_representations",
        "repr_layers",
    ),
)
def apply(
    params,
    cfg: ESM1Config,
    tokens: jax.Array,
    *,
    need_head_weights: bool = False,
    return_contacts: bool = False,
    return_representations: bool = False,
    repr_layers=None,
):
    """Forward pass mirroring reference esm/model/esm1.py:116-196.

    As in esm2.apply, ``return_contacts=True`` without need_head_weights uses
    the streaming in-scan contact accumulation (no (B, L, H, T, T) stack)."""
    streaming_contacts = return_contacts and not need_head_weights

    padding_mask = tokens == cfg.padding_idx
    embed_scale = 1.0 if cfg.is_1b else float(cfg.embed_dim) ** 0.5
    x = embed_scale * jnp.take(params["embed_tokens"]["weight"], tokens, axis=0)

    if cfg.token_dropout:
        is_mask = tokens == cfg.mask_idx
        x = jnp.where(is_mask[..., None], 0.0, x)
        mask_ratio_train = 0.15 * 0.8
        src_lengths = jnp.sum(~padding_mask, axis=-1)
        mask_ratio_observed = jnp.sum(is_mask, axis=-1).astype(x.dtype) / src_lengths
        x = x * (1 - mask_ratio_train) / (1 - mask_ratio_observed)[:, None, None]

    if cfg.is_1b:
        x = x + learned_positional_embedding(
            params["embed_positions"], tokens, cfg.padding_idx, cfg.max_positions
        )
        if "emb_layer_norm_before" in params:
            x = layer_norm(params["emb_layer_norm_before"], x)
        x = x * (1 - padding_mask[..., None].astype(x.dtype))
    else:
        x = x + sinusoidal_positional_embedding(tokens, cfg.embed_dim, cfg.padding_idx)

    x = x.astype(cfg.compute_dtype)
    h0 = x

    repr_layers = normalize_repr_layers(repr_layers, cfg.num_layers)
    last_special = cfg.is_1b  # ESM-1b applies final LN to the last repr layer
    mid_cut = cfg.num_layers - 1 if last_special else cfg.num_layers
    mid_layers = (
        tuple(i for i in repr_layers if 1 <= i <= mid_cut)
        if (repr_layers is not None and not return_representations)
        else None
    )

    contact_acc = None
    if streaming_contacts:
        from .esm2 import _stack_with_streaming_contacts

        if mid_layers:
            raise NotImplementedError(
                "repr_layers selection with streaming contacts: pass "
                "need_head_weights=True or return_representations=True"
            )
        x, hiddens, contact_acc = _stack_with_streaming_contacts(
            params, cfg, x, tokens, padding_mask, return_representations,
            strip_last_key=not cfg.is_1b,
        )
        attn = None
    else:
        x, hiddens, attn = transformer_stack_apply(
            params["layers"],
            x,
            static=cfg.layer_static(),
            key_padding_mask=padding_mask,
            collect_hiddens=return_representations,
            collect_layer_ids=mid_layers,
            need_head_weights=need_head_weights,
        )

    result = {}
    if cfg.is_1b:
        x = layer_norm(params["emb_layer_norm_after"], x)
        if return_representations:
            reps = jnp.concatenate(
                [h0[None], hiddens[:-1], x[None].astype(hiddens.dtype)], axis=0
            )
            result["representations"] = reps
        elif repr_layers is not None:
            reps_dict = {
                lid: hiddens[j] for j, lid in enumerate(mid_layers or ())
            }
            if 0 in repr_layers:
                reps_dict[0] = h0
            if cfg.num_layers in repr_layers:
                reps_dict[cfg.num_layers] = x  # post-final-LN
            result["representations"] = reps_dict
        logits = roberta_lm_head(
            params["lm_head"], x.astype(jnp.float32), params["embed_tokens"]["weight"]
        )
    else:
        if return_representations:
            result["representations"] = jnp.concatenate([h0[None], hiddens], axis=0)
        elif repr_layers is not None:
            reps_dict = {
                lid: hiddens[j] for j, lid in enumerate(mid_layers or ())
            }
            if 0 in repr_layers:
                reps_dict[0] = h0
            result["representations"] = reps_dict
        x32 = x.astype(jnp.float32)
        logits = jnp.dot(
            x32, materialize_kernel(params["embed_out"], jnp.float32)
        )
        if "bias" in params["embed_out"]:
            logits = logits + params["embed_out"]["bias"]
    result["logits"] = logits

    if need_head_weights:
        attentions = jnp.transpose(attn, (1, 0, 2, 3, 4)).astype(jnp.float32)
        if not cfg.is_1b:
            # strip the extra bias_kv null attention column
            # (reference esm/model/esm1.py:181-183)
            attentions = attentions[..., :-1]
        keep = 1.0 - padding_mask.astype(attentions.dtype)
        pair_mask = keep[:, None, :] * keep[:, :, None]
        attentions = attentions * pair_mask[:, None, None, :, :]
        result["attentions"] = attentions
        if return_contacts:
            result["contacts"] = contact_head(
                params["contact_head"],
                tokens,
                attentions,
                prepend_bos=cfg.prepend_bos,
                append_eos=cfg.append_eos,
                eos_idx=cfg.eos_idx,
            )
    elif streaming_contacts:
        bias = params["contact_head"]["regression"].get("bias")
        logits_c = contact_acc
        if bias is not None:
            logits_c = logits_c + bias.astype(logits_c.dtype)[0]
        result["contacts"] = jax.nn.sigmoid(logits_c)
    return result


