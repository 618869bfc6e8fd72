"""GVP-Transformer inverse folding model (ESM-IF1), JAX.

Reference semantics: esm/inverse_folding/gvp_transformer.py and
gvp_transformer_encoder.py — encoder embedding is the sum of scaled mask-token
embed, dihedral embed, local-frame-rotated GVP encoder output, confidence RBF
embed and raw GVP input features; then sinusoidal positions and N transformer
encoder layers. Decoder is autoregressive with '<cath>' begin token.

The reference's serial python sampling loop (gvp_transformer.py:126-137)
becomes a lax.scan with a functional KV cache (transformer.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...data.alphabet import Alphabet
from ...ops.common import layer_norm, linear
from ...ops.positional import sinusoidal_positional_embedding
from .features import dihedral_features, node_features
from .gvp import gvp_encoder_apply
from .transformer import (
    decoder_apply,
    decoder_step,
    encoder_layer_apply,
    init_decode_cache,
)
from .util import CoordBatchConverter, get_rotation_frames, nan_to_num, rbf, rotate


@dataclass(frozen=True)
class GVPTransformerConfig:
    encoder_embed_dim: int = 512
    encoder_layers: int = 8
    encoder_attention_heads: int = 8
    encoder_ffn_embed_dim: int = 2048
    decoder_embed_dim: int = 512
    decoder_layers: int = 8
    decoder_attention_heads: int = 8
    decoder_ffn_embed_dim: int = 2048
    # GVP encoder
    gvp_top_k_neighbors: int = 30
    gvp_node_hidden_dim_scalar: int = 1024
    gvp_node_hidden_dim_vector: int = 256
    gvp_edge_hidden_dim_scalar: int = 32
    gvp_edge_hidden_dim_vector: int = 1
    gvp_num_encoder_layers: int = 4
    # alphabet (invariant_gvp: 31 prepend+std tokens padded to 32 with <null_1>,
    # then <mask>=32, <cath>=33, <af2>=34)
    alphabet_size: int = 35
    padding_idx: int = 1
    mask_idx: int = 32
    cath_idx: int = 33

    @classmethod
    def from_alphabet(cls, alphabet: Alphabet, **kw) -> "GVPTransformerConfig":
        return cls(
            alphabet_size=len(alphabet),
            padding_idx=alphabet.padding_idx,
            mask_idx=alphabet.mask_idx,
            cath_idx=alphabet.get_idx("<cath>"),
            **kw,
        )


def encoder_embedding(params, cfg: GVPTransformerConfig, coords, padding_mask, confidence):
    """forward_embedding (reference gvp_transformer_encoder.py:73-121)."""
    coord_mask = jnp.all(jnp.all(jnp.isfinite(coords), axis=-1), axis=-1)
    coords = nan_to_num(coords)
    mask_tokens = jnp.where(padding_mask, cfg.padding_idx, cfg.mask_idx)

    embed_scale = math.sqrt(cfg.encoder_embed_dim)
    components = {}
    components["tokens"] = (
        jnp.take(params["embed_tokens"]["weight"], mask_tokens, axis=0) * embed_scale
    )
    components["diherals"] = dihedral_features(params["embed_dihedrals"], coords)

    gvp_s, gvp_v = gvp_encoder_apply(
        params["gvp_encoder"],
        coords,
        coord_mask,
        padding_mask,
        confidence,
        top_k=cfg.gvp_top_k_neighbors,
        num_layers=cfg.gvp_num_encoder_layers,
    )
    r = get_rotation_frames(coords)
    gvp_feats = jnp.concatenate(
        [
            gvp_s,
            rotate(gvp_v, jnp.swapaxes(r, -2, -1)).reshape(*gvp_v.shape[:-2], -1),
        ],
        axis=-1,
    )
    components["gvp_out"] = linear(params["embed_gvp_output"], gvp_feats)
    components["confidence"] = linear(
        params["embed_confidence"], rbf(confidence, 0.0, 1.0)
    )

    scalar_f, vector_f = node_features(coords, coord_mask, with_coord_mask=False)
    features = jnp.concatenate(
        [
            scalar_f,
            rotate(vector_f, jnp.swapaxes(r, -2, -1)).reshape(*vector_f.shape[:-2], -1),
        ],
        axis=-1,
    )
    components["gvp_input_features"] = linear(
        params["embed_gvp_input_features"], features
    )

    embed = sum(components.values())
    x = embed + sinusoidal_positional_embedding(
        mask_tokens, cfg.encoder_embed_dim, cfg.padding_idx
    )
    return x


def encoder_apply(params, cfg: GVPTransformerConfig, coords, padding_mask, confidence):
    """GVPTransformerEncoder.forward (reference gvp_transformer_encoder.py:123-184).
    Returns (B, T, C) encoder output."""
    x = encoder_embedding(params, cfg, coords, padding_mask, confidence)
    x = x * (1 - padding_mask[..., None].astype(x.dtype))
    for i in range(cfg.encoder_layers):
        x = encoder_layer_apply(
            params["layers"][i],
            x,
            num_heads=cfg.encoder_attention_heads,
            padding_mask=padding_mask,
        )
    return layer_norm(params["layer_norm"], x)


@partial(jax.jit, static_argnames=("cfg", "features_only"))
def apply(
    params,
    cfg: GVPTransformerConfig,
    coords: jax.Array,
    padding_mask: jax.Array,
    confidence: jax.Array,
    prev_output_tokens: jax.Array,
    features_only: bool = False,
):
    """Teacher-forced forward. Returns logits (B, V, T) (reference layout)."""
    enc = encoder_apply(params["encoder"], cfg, coords, padding_mask, confidence)
    return decoder_apply(
        params["decoder"],
        prev_output_tokens,
        enc,
        num_heads=cfg.decoder_attention_heads,
        num_layers=cfg.decoder_layers,
        padding_idx=cfg.padding_idx,
        enc_padding_mask=padding_mask,
        features_only=features_only,
    )


def get_sequence_loss(params, cfg, alphabet: Alphabet, coords, seq):
    """Per-position cross entropy (reference esm/inverse_folding/util.py:106-121).
    Returns (loss (T-1,), target_padding_mask (T-1,))."""
    converter = CoordBatchConverter(alphabet)
    batch_coords, conf, _, tokens, padding_mask = converter([(coords, None, seq)])
    prev_output_tokens = jnp.asarray(tokens[:, :-1])
    target = np.asarray(tokens[:, 1:])
    logits = apply(
        params,
        cfg,
        jnp.asarray(batch_coords),
        jnp.asarray(padding_mask),
        jnp.asarray(conf),
        prev_output_tokens,
    )  # (B, V, T)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=1))
    loss = -logp[0][target[0], np.arange(target.shape[1])]
    return loss, target[0] == alphabet.padding_idx


def score_sequence(params, cfg, alphabet: Alphabet, coords, seq):
    """Average log-likelihood (full seq / coord-containing positions)
    (reference esm/inverse_folding/util.py:123-130)."""
    loss, target_padding_mask = get_sequence_loss(params, cfg, alphabet, coords, seq)
    ll_fullseq = -np.sum(loss * ~target_padding_mask) / np.sum(~target_padding_mask)
    coord_mask = np.all(np.isfinite(np.asarray(coords, np.float32)), axis=(-1, -2))
    ll_withcoord = -np.sum(loss * coord_mask) / np.sum(coord_mask)
    return float(ll_fullseq), float(ll_withcoord)


@partial(jax.jit, static_argnames=("cfg", "max_len"))
def _sample_tokens(
    params,
    cfg: GVPTransformerConfig,
    coords,
    padding_mask,
    confidence,
    init_tokens,       # (B, 1+L) pre-filled with <cath> + mask/partial tokens
    rng,
    temperature: float,
    max_len: int,
):
    enc = encoder_apply(params["encoder"], cfg, coords, padding_mask, confidence)
    cache = init_decode_cache(
        params["decoder"],
        enc,
        num_heads=cfg.decoder_attention_heads,
        num_layers=cfg.decoder_layers,
        max_len=max_len,
    )

    def step(carry, i):
        tokens, cache, rng = carry
        rng, sub = jax.random.split(rng)
        logits, cache = decoder_step(
            params["decoder"],
            tokens[:, i - 1],
            i - 1,
            cache,
            num_heads=cfg.decoder_attention_heads,
            num_layers=cfg.decoder_layers,
            padding_idx=cfg.padding_idx,
            enc_padding_mask=padding_mask,
        )
        sampled = jax.random.categorical(sub, logits / temperature, axis=-1)
        keep = tokens[:, i] != cfg.mask_idx
        new_tok = jnp.where(keep, tokens[:, i], sampled.astype(tokens.dtype))
        tokens = tokens.at[:, i].set(new_tok)
        return (tokens, cache, rng), None

    (tokens, _, _), _ = jax.lax.scan(
        step, (init_tokens, cache, rng), jnp.arange(1, max_len + 1)
    )
    return tokens


def sample(
    params,
    cfg: GVPTransformerConfig,
    alphabet: Alphabet,
    coords,
    *,
    partial_seq: Optional[str] = None,
    temperature: float = 1.0,
    confidence=None,
    seed: int = 0,
    return_tokens: bool = False,
    num_samples: int = 1,
    pad_to_multiple: Optional[int] = None,
):
    """Autoregressive sequence design (reference gvp_transformer.py:88-140).

    ``num_samples > 1`` draws N independent sequences in ONE batched decode
    (one encoder run + one scan dispatch; one PRNG stream drives the whole
    batch) and returns a list. ``pad_to_multiple`` NaN-pads the backbone to
    a length bucket so diverse-length workloads share compiled programs
    (NaN rows are the batch converter's padding convention, so the sampled
    prefix is identical to the unpadded call — tested); the padded tail is
    stripped from the result."""
    coords = np.asarray(coords, np.float32)
    L = len(coords)
    if pad_to_multiple:
        padn = (-L) % int(pad_to_multiple)
        if padn:
            coords = np.concatenate(
                [coords, np.full((padn, 3, 3), np.nan, np.float32)]
            )
    lp = len(coords)
    converter = CoordBatchConverter(alphabet)
    batch_coords, conf, _, _, padding_mask = converter([(coords, confidence, None)])

    tokens = np.full((1, 1 + lp), cfg.mask_idx, np.int32)
    tokens[0, 0] = cfg.cath_idx
    if partial_seq is not None:
        for i, c in enumerate(partial_seq):
            tokens[0, i + 1] = alphabet.get_idx(c)

    n = max(int(num_samples), 1)

    def tile(x):
        return jnp.broadcast_to(jnp.asarray(x), (n,) + tuple(np.shape(x))[1:])

    out = _sample_tokens(
        params,
        cfg,
        tile(batch_coords),
        tile(padding_mask),
        tile(conf),
        tile(tokens),
        jax.random.PRNGKey(seed),
        temperature,
        lp,
    )
    out = np.asarray(out)[:, 1 : 1 + L]  # strip <cath> and any padded tail
    if return_tokens:
        return out if num_samples > 1 else out[0]
    seqs = [
        "".join(alphabet.get_tok(int(a)) for a in row) for row in out
    ]
    return seqs if num_samples > 1 else seqs[0]


def get_encoder_output(params, cfg, alphabet: Alphabet, coords):
    """Encoder representations for a backbone, bos/eos stripped
    (reference esm/inverse_folding/util.py:133-143). Returns (L, C)."""
    converter = CoordBatchConverter(alphabet)
    batch_coords, conf, _, _, padding_mask = converter([(coords, None, None)])
    enc = encoder_apply(
        params["encoder"], cfg, jnp.asarray(batch_coords),
        jnp.asarray(padding_mask), jnp.asarray(conf),
    )
    return enc[0, 1:-1]
