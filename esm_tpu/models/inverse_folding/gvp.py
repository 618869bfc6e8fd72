"""Geometric Vector Perceptron stack (JAX).

Reference semantics: esm/inverse_folding/gvp_modules.py (Jing et al. GVP with
vector gating, tuple LayerNorm, GVPConv message passing, GVPConvLayer) and
gvp_encoder.py / features.py GVPGraphEmbedding.

TPU-first message passing: instead of torch_geometric's batch-1 flattened
graph + scatter (gvp_utils.py:9-47), edges stay dense (B, E) and aggregation
is a fixed-shape segment-sum over destination indices — fully jit/vmap
compatible, no dynamic shapes.

Features (s, V) are tuples: s (..., ns), V (..., nv, 3).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.common import linear
from .features import edge_features, node_features
from .util import rbf


def _norm_no_nan(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    # reference gvp_modules.py:79-88 ADDS eps ("clamp is slow"), it does not
    # clamp — near-zero vector channels (zero-padded orientation vectors at
    # chain termini) must give ~0, not sqrt(eps)
    out = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims) + eps
    return jnp.sqrt(out) if sqrt else out


def gvp_apply(
    params,
    s: jax.Array,
    v: Optional[jax.Array],
    *,
    vector_gate: bool = False,
    scalar_act: bool = True,
    vector_act: bool = True,
    eps: float = 1e-8,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """One GVP (reference gvp_modules.py:113-188).

    params: {"wh": (vi, h) no-bias, "ws": (h+si, so), "wv": (h, vo) no-bias,
             "wg": (so, vo)} — wv/wg optional.
    """
    if v is not None:
        vt = jnp.swapaxes(v, -1, -2)                    # (..., 3, vi)
        vh = linear(params["wh"], vt)                   # (..., 3, h)
        vn = _norm_no_nan(vh, axis=-2, eps=eps)         # (..., h)
        s = linear(params["ws"], jnp.concatenate([s, vn], -1))
        if scalar_act:
            s = jax.nn.relu(s)
        if "wv" in params:
            v_out = jnp.swapaxes(linear(params["wv"], vh), -1, -2)  # (..., vo, 3)
            if vector_gate:
                g = linear(params["wg"], s)[..., None]
            else:
                g = _norm_no_nan(v_out, axis=-1, keepdims=True, eps=eps)
            if vector_act:
                g = jax.nn.sigmoid(g)
                v_out = v_out * g
            return s, v_out
        return s, None
    s = linear(params["ws"], s)
    if scalar_act:
        s = jax.nn.relu(s)
    if "wv" in params:
        vo = params["wv"]["kernel"].shape[-1]
        return s, jnp.zeros(s.shape[:-1] + (vo, 3), s.dtype)
    return s, None


def tuple_layer_norm(params, s, v, eps: float = 1e-8):
    """Combined LayerNorm for (s, V) tuples (reference gvp_modules.py:256-281):
    scalar LN on s; vectors scaled by the rms norm over *nonzero* channels."""
    from ...ops.common import layer_norm

    s = layer_norm(params["scalar_norm"], s)
    if v is None:
        return s, None
    vn = _norm_no_nan(v, axis=-1, keepdims=True, sqrt=False, eps=eps)
    nonzero = (vn > 2 * eps).astype(v.dtype)
    vn = jnp.sum(vn * nonzero, axis=-2, keepdims=True) / (
        eps + jnp.sum(nonzero, axis=-2, keepdims=True)
    )
    vn = jnp.sqrt(vn + eps)
    v = nonzero * (v / vn)
    return s, v


def _gather_nodes(s, v, idx):
    """Gather per-edge node features: s (B,L,ns) + idx (B,E) -> (B,E,ns)."""
    gs = jnp.take_along_axis(s, idx[..., None], axis=1)
    gv = jnp.take_along_axis(v, idx[..., None, None], axis=1)
    return gs, gv


def gvp_conv_apply(
    params,
    specs,
    s: jax.Array,
    v: jax.Array,
    edge_s: jax.Array,
    edge_v: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    edge_valid: jax.Array,
    *,
    aggr: str = "mean",
    eps: float = 1e-8,
):
    """GVPConv (reference gvp_modules.py:267-330): message per edge =
    GVP-MLP(cat(source feats, edge feats, target feats)) aggregated into the
    DESTINATION node (pyg source_to_target flow: source = center residue
    ``src``, target = neighbor ``dst``)."""
    b, l = s.shape[:2]

    s_src, v_src = _gather_nodes(s, v, src)   # _j (source)
    s_dst, v_dst = _gather_nodes(s, v, dst)   # _i (target)

    msg_s = jnp.concatenate([s_src, edge_s, s_dst], axis=-1)
    msg_v = jnp.concatenate([v_src, edge_v, v_dst], axis=-2)
    ms, mv = msg_s, msg_v
    for p, sp in zip(params["message_func"], specs):
        ms, mv = gvp_apply(p, ms, mv, eps=eps, **sp)

    valid = edge_valid[..., None].astype(ms.dtype)
    ms = ms * valid
    mv = mv * valid[..., None]

    # segment aggregation into destination nodes, batched via flat indices
    flat_dst = (dst + jnp.arange(b)[:, None] * l).reshape(-1)
    flat_dst = jnp.where(edge_valid.reshape(-1), flat_dst, b * l)  # dump slot
    sum_s = jax.ops.segment_sum(
        ms.reshape(-1, ms.shape[-1]), flat_dst, num_segments=b * l + 1
    )[:-1].reshape(b, l, -1)
    sum_v = jax.ops.segment_sum(
        mv.reshape(-1, mv.shape[-2] * 3), flat_dst, num_segments=b * l + 1
    )[:-1].reshape(b, l, -1, 3)
    if aggr == "mean":
        count = jax.ops.segment_sum(
            edge_valid.reshape(-1).astype(s.dtype), flat_dst, num_segments=b * l + 1
        )[:-1].reshape(b, l, 1)
        count = jnp.maximum(count, 1.0)
        sum_s = sum_s / count
        sum_v = sum_v / count[..., None]
    return sum_s, sum_v


def _gvp_specs(n_layers: int, vector_gate: bool):
    """Static per-GVP kwargs for a GVP MLP (message or feed-forward — both use
    the same activation layout: activation-free final GVP; reference
    gvp_modules.py:293-308, 373-382)."""
    if n_layers == 1:
        return [dict(scalar_act=False, vector_act=False)]
    specs = [dict(vector_gate=vector_gate) for _ in range(n_layers - 1)]
    specs.append(dict(scalar_act=False, vector_act=False))
    return specs


_message_specs = _gvp_specs
_ff_specs = _gvp_specs


def gvp_conv_layer_apply(
    params,
    s,
    v,
    edge_s,
    edge_v,
    src,
    dst,
    edge_valid,
    *,
    n_message: int = 3,
    n_feedforward: int = 2,
    vector_gate: bool = True,
    eps: float = 1e-4,
):
    """GVPConvLayer (reference gvp_modules.py:331-475, inference mode):
    residual conv + GVP feed-forward, each followed by tuple LayerNorm."""
    # the encoder's eps=1e-4 reaches ONLY the LayerNorms in the reference:
    # GVPConv stores its eps without passing it to the message GVPs, and the
    # ff GVPs are built with the default — both run at 1e-8
    # (gvp_modules.py:293-307,373-381 vs :367)
    dh_s, dh_v = gvp_conv_apply(
        params["conv"],
        _message_specs(n_message, vector_gate),
        s, v, edge_s, edge_v, src, dst, edge_valid,
        aggr="mean", eps=1e-8,
    )
    s, v = tuple_layer_norm(params["norm0"], s + dh_s, v + dh_v, eps=eps)

    fs, fv = s, v
    for p, sp in zip(params["ff_func"], _ff_specs(n_feedforward, vector_gate)):
        fs, fv = gvp_apply(p, fs, fv, eps=1e-8, **sp)
    s, v = tuple_layer_norm(params["norm1"], s + fs, v + fv, eps=eps)
    return s, v


def gvp_graph_embedding_apply(
    params, coords, coord_mask, padding_mask, confidence, *, top_k: int
):
    """GVPGraphEmbedding (reference features.py:260-298): embed node/edge
    features with activation-free GVPs + tuple LN; add confidence RBF embed."""
    ns, nv = node_features(coords, coord_mask)
    (edge_s, edge_v), src, dst, edge_valid = edge_features(
        coords, coord_mask, padding_mask, top_k=top_k
    )
    ns, nv = jax.lax.stop_gradient((ns, nv))
    edge_s, edge_v = jax.lax.stop_gradient((edge_s, edge_v))

    s, v = gvp_apply(
        params["embed_node_gvp"], ns, nv, scalar_act=False, vector_act=False
    )
    s, v = tuple_layer_norm(params["embed_node_norm"], s, v, eps=1e-4)
    es, ev = gvp_apply(
        params["embed_edge_gvp"], edge_s, edge_v, scalar_act=False, vector_act=False
    )
    es, ev = tuple_layer_norm(params["embed_edge_norm"], es, ev, eps=1e-4)

    s = s + linear(params["embed_confidence"], rbf(confidence, 0.0, 1.0))
    return (s, v), (es, ev), src, dst, edge_valid


def gvp_encoder_apply(
    params,
    coords,
    coord_mask,
    padding_mask,
    confidence,
    *,
    top_k: int,
    num_layers: int,
):
    """GVPEncoder (reference gvp_encoder.py:18-56)."""
    (s, v), (es, ev), src, dst, edge_valid = gvp_graph_embedding_apply(
        params["embed_graph"], coords, coord_mask, padding_mask, confidence,
        top_k=top_k,
    )
    for i in range(num_layers):
        s, v = gvp_conv_layer_apply(
            params["encoder_layers"][i], s, v, es, ev, src, dst, edge_valid
        )
    return s, v
