"""ESM-2 protein language model (TPU-native).

Reference semantics: esm/model/esm2.py — token embedding with mask-token
dropout rescale, N pre-LN rotary transformer layers, final LN, tied-weight LM
head, contact head over stacked attention maps. The forward contract mirrors
the reference: ``{"logits", "representations", "attentions", "contacts"}``.

TPU-first differences:
  * layers scanned over stacked params (see lm_common.py);
  * static jit flags select what is computed (logits-only fast path never
    materializes hiddens or T×T maps);
  * optional bf16 compute with fp32 LN/softmax;
  * optional Pallas flash-attention path when maps aren't needed.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.alphabet import Alphabet
from ..ops.common import init_embedding, init_layer_norm, init_linear_torch_default, layer_norm
from ..ops.heads import contact_head, roberta_lm_head, weighted_apc_symmetrize
from .lm_common import normalize_repr_layers, LayerStatic, init_transformer_stack, transformer_stack_apply


@dataclass(frozen=True)
class ESM2Config:
    num_layers: int = 33
    embed_dim: int = 1280
    attention_heads: int = 20
    token_dropout: bool = True
    # Alphabet-derived (ESM-1b alphabet; reference esm/model/esm2.py:27-36)
    alphabet_size: int = 33
    padding_idx: int = 1
    mask_idx: int = 32
    cls_idx: int = 0
    eos_idx: int = 2
    prepend_bos: bool = True
    append_eos: bool = True
    # Execution options (not part of checkpoint identity)
    compute_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False  # rematerialize layer bodies on backward (training)
    # "dots" (keep matmul outputs) or "full" (save nothing — minimum
    # activation memory; the 15B-LoRA-on-one-chip setting)
    remat_policy: str = "dots"

    @property
    def ffn_embed_dim(self) -> int:
        return 4 * self.embed_dim

    @classmethod
    def from_alphabet(cls, alphabet: Alphabet, **kw) -> "ESM2Config":
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
            use_rotary=True,
            use_bias_kv=False,
            ln_eps=1e-5,
            use_flash=self.use_flash,
            remat=self.remat,
            remat_policy=self.remat_policy,
        )


# ESM-2 released sizes (reference README.md:475-496).
ESM2_SIZES = {
    "esm2_t6_8M_UR50D": dict(num_layers=6, embed_dim=320, attention_heads=20),
    "esm2_t12_35M_UR50D": dict(num_layers=12, embed_dim=480, attention_heads=20),
    "esm2_t30_150M_UR50D": dict(num_layers=30, embed_dim=640, attention_heads=20),
    "esm2_t33_650M_UR50D": dict(num_layers=33, embed_dim=1280, attention_heads=20),
    "esm2_t36_3B_UR50D": dict(num_layers=36, embed_dim=2560, attention_heads=40),
    "esm2_t48_15B_UR50D": dict(num_layers=48, embed_dim=5120, attention_heads=40),
}


def init(key: jax.Array, cfg: ESM2Config, dtype=jnp.float32):
    k_embed, k_layers, k_head = jax.random.split(key, 3)
    d = cfg.embed_dim
    return {
        "embed_tokens": init_embedding(
            k_embed, cfg.alphabet_size, d, padding_idx=cfg.padding_idx, dtype=dtype
        ),
        "layers": init_transformer_stack(
            k_layers, cfg.num_layers, d, cfg.ffn_embed_dim, dtype=dtype
        ),
        "emb_layer_norm_after": init_layer_norm(d, dtype),
        "lm_head": {
            "dense": init_linear_torch_default(k_head, d, d, dtype=dtype),
            "layer_norm": init_layer_norm(d, dtype),
            "bias": jnp.zeros((cfg.alphabet_size,), dtype),
        },
        "contact_head": {
            "regression": {
                "kernel": jnp.zeros((cfg.num_layers * cfg.attention_heads, 1), dtype),
                "bias": jnp.zeros((1,), dtype),
            }
        },
    }


def embed_tokens(params, cfg: ESM2Config, tokens: jax.Array) -> jax.Array:
    """Token embedding with mask-token dropout rescale
    (reference esm/model/esm2.py:84-95). Runs in fp32, returns compute dtype."""
    padding_mask = tokens == cfg.padding_idx
    x = jnp.take(params["embed_tokens"]["weight"], tokens, axis=0)

    if cfg.token_dropout:
        is_mask = tokens == cfg.mask_idx
        x = jnp.where(is_mask[..., None], 0.0, x)
        mask_ratio_train = 0.15 * 0.8
        src_lengths = jnp.sum(~padding_mask, axis=-1)
        mask_ratio_observed = jnp.sum(is_mask, axis=-1).astype(x.dtype) / src_lengths
        x = x * (1 - mask_ratio_train) / (1 - mask_ratio_observed)[:, None, None]

    x = x * (1 - padding_mask[..., None].astype(x.dtype))
    return x.astype(cfg.compute_dtype)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "need_head_weights", "return_contacts", "return_representations",
        "repr_layers", "ring",
    ),
)
def apply(
    params,
    cfg: ESM2Config,
    tokens: jax.Array,
    *,
    need_head_weights: bool = False,
    return_contacts: bool = False,
    return_representations: bool = False,
    repr_layers=None,
    ring=None,
):
    """Forward pass. tokens: (B, T) int32.

    Returns a dict:
      logits:          (B, T, V) fp32
      representations: (L+1, B, T, D) stacked hidden states (layer 0 = embedding
                       output, layer L = final-LN output) when requested
      attentions:      (B, L, H, T, T) when need_head_weights
      contacts:        (B, T', T') when return_contacts

    Memory note (TPU-first deviation from the reference): with
    ``return_contacts=True, need_head_weights=False`` the contact regression is
    accumulated *inside* the layer scan — peak memory is one (B, H, T, T) map
    instead of the reference's stacked (B, L, H, T, T)
    (esm/model/esm2.py:133-141). Pass ``need_head_weights=True`` to also get
    the full attention stack (the reference's behavior).
    """
    if ring is not None and (need_head_weights or return_contacts):
        raise ValueError(
            "sequence-parallel (ring) forward cannot materialize T×T "
            "attention maps; request representations/logits only"
        )
    streaming_contacts = return_contacts and not need_head_weights
    repr_layers = normalize_repr_layers(repr_layers, cfg.num_layers)
    # 1-based mid-stack layer ids collected selectively inside the scan
    mid_layers = (
        tuple(i for i in repr_layers if 1 <= i <= cfg.num_layers - 1)
        if (repr_layers is not None and not return_representations)
        else None
    )

    padding_mask = tokens == cfg.padding_idx
    x = embed_tokens(params, cfg, tokens)
    h0 = x

    contact_acc = None
    if streaming_contacts:
        x, hiddens, contact_acc = _stack_with_streaming_contacts(
            params, cfg, x, tokens, padding_mask, return_representations
        )
        attn = None
        if mid_layers:
            raise NotImplementedError(
                "repr_layers selection with streaming contacts: pass "
                "need_head_weights=True or return_representations=True"
            )
    else:
        static = cfg.layer_static()
        if ring is not None:
            import dataclasses

            static = dataclasses.replace(static, ring=ring)
        x, hiddens, attn = transformer_stack_apply(
            params["layers"],
            x,
            static=static,
            key_padding_mask=padding_mask,
            collect_hiddens=return_representations,
            collect_layer_ids=mid_layers,
            need_head_weights=need_head_weights,
        )

    x = layer_norm(params["emb_layer_norm_after"], x)

    result = {}
    if return_representations:
        # (L+1, B, T, D): embedding output, then per-layer outputs; the final
        # layer's entry is the post-LN value (reference esm/model/esm2.py:123-128).
        reps = jnp.concatenate([h0[None], hiddens[:-1], x[None].astype(hiddens.dtype)], axis=0)
        result["representations"] = reps
    elif repr_layers is not None:
        # memory-frugal path: only the requested layers were kept
        reps_dict = {}
        for j, layer_id in enumerate(mid_layers or ()):
            reps_dict[layer_id] = hiddens[j]
        if 0 in repr_layers:
            reps_dict[0] = h0
        if cfg.num_layers in repr_layers:
            reps_dict[cfg.num_layers] = x  # x is already post-final-LN here
        result["representations"] = reps_dict

    logits = roberta_lm_head(
        params["lm_head"], x.astype(jnp.float32), params["embed_tokens"]["weight"]
    )
    result["logits"] = logits

    if need_head_weights:
        # (L, B, H, T, T) -> (B, L, H, T, T); zero maps at padded query/key
        # positions (reference esm/model/esm2.py:133-138).
        attentions = jnp.transpose(attn, (1, 0, 2, 3, 4)).astype(jnp.float32)
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


def apply_seq_sharded(
    params, cfg: ESM2Config, tokens: jax.Array, *, mesh, seq_axis: str = "tp", **kw
):
    """Sequence-parallel forward: the T axis is sharded over ``seq_axis`` and
    every attention runs as a ring with KV blocks rotating via ppermute
    (parallel/ring_attention.py) — activations and attention state stay
    O(T/N) per chip, the long-context mechanism SURVEY §5.7 plans in place of
    the reference's chunk/truncate (esm/axial_attention.py:40-69,
    scripts/extract.py:52-57). T must divide the ``seq_axis`` size. Returns
    the usual result dict minus attentions/contacts (they materialize T×T)."""
    return apply(params, cfg, tokens, ring=(mesh, seq_axis), **kw)


@partial(jax.jit, static_argnames=("cfg", "mesh", "num_microbatches"))
def apply_pipelined(
    params,
    cfg: ESM2Config,
    tokens: jax.Array,
    *,
    mesh,
    num_microbatches: int,
):
    """Logits-only forward with the layer stack pipelined over the mesh's
    ``pp`` axis (GPipe microbatching — parallel/pipeline.py; the reference
    has no pipeline parallelism, SURVEY §2.5). The embedding, final LN and
    LM head run replicated over pp (they are O(1) layers deep); tp/fsdp
    shardings compose inside each stage via automatic SPMD.
    """
    from ..parallel.pipeline import pipeline_transformer_stack

    padding_mask = tokens == cfg.padding_idx
    x = embed_tokens(params, cfg, tokens)
    x = pipeline_transformer_stack(
        params["layers"],
        x,
        static=cfg.layer_static(),
        mesh=mesh,
        num_microbatches=num_microbatches,
        key_padding_mask=padding_mask,
    )
    x = layer_norm(params["emb_layer_norm_after"], x)
    logits = roberta_lm_head(
        params["lm_head"], x.astype(jnp.float32), params["embed_tokens"]["weight"]
    )
    return {"logits": logits}


def _stack_with_streaming_contacts(
    params, cfg, x, tokens, padding_mask, collect_hiddens: bool,
    strip_last_key: bool = False,
):
    """Layer scan that folds the contact-head regression into the loop:
    each layer's (B, H, T, S) attention map is masked, bos/eos-stripped,
    symmetrized+APC'd and contracted with that layer's regression weights,
    accumulating a (B, T', T') sum — equivalent to the reference's
    stack-then-regress (esm/modules.py:317-357) without materializing the
    (B, L, H, T, T) stack. ``strip_last_key`` removes the bias_kv null
    attention column first (ESM-1, reference esm/model/esm1.py:181-183)."""
    from ..ops.common import materialize_kernel
    from .lm_common import transformer_layer_apply

    static = cfg.layer_static()
    keep = 1.0 - padding_mask.astype(jnp.float32)
    pair_mask = keep[:, None, :] * keep[:, :, None]              # (B, T, T)
    if cfg.append_eos:
        eos_keep = (tokens != cfg.eos_idx).astype(jnp.float32)
        eos_pair = eos_keep[:, None, :] * eos_keep[:, :, None]
    reg_w = materialize_kernel(
        params["contact_head"]["regression"], jnp.float32
    ).reshape(cfg.num_layers, cfg.attention_heads)

    b, t = tokens.shape
    t_out = t - int(cfg.append_eos) - int(cfg.prepend_bos)

    def body(carry, xs):
        h, acc = carry
        layer_params, w_l = xs
        h, probs = transformer_layer_apply(
            layer_params,
            h,
            static=static,
            key_padding_mask=padding_mask,
            need_head_weights=True,
        )
        a = probs.astype(jnp.float32)
        if strip_last_key:
            a = a[..., :-1]
        a = a * pair_mask[:, None]
        if cfg.append_eos:
            a = a * eos_pair[:, None]
            a = a[..., :-1, :-1]
        if cfg.prepend_bos:
            a = a[..., 1:, 1:]
        # accumulate this layer's heads' weighted-APC contribution (shared
        # restructured formula — ops/heads.weighted_apc_symmetrize)
        acc = acc + weighted_apc_symmetrize(a, w_l)
        ys = {"hidden": h} if collect_hiddens else {}
        return (h, acc), ys

    acc0 = jnp.zeros((b, t_out, t_out), jnp.float32)
    (x, acc), ys = jax.lax.scan(body, (x, acc0), (params["layers"], reg_w))
    return x, ys.get("hidden"), acc


