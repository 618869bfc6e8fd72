"""Input featurization for inverse folding (JAX).

Reference semantics: esm/inverse_folding/features.py — dihedral sin/cos node
scalars, forward/backward orientations + sidechain pseudo-vector node vectors,
masked kNN graph over CA with the reference's exact tie-breaking
(features.py:156-185), distance-RBF + sinusoidal relpos edge features.

TPU-first: the graph stays DENSE and batched — (B, L, K) neighbor indices and
(B, L·K, ·) edge features; message passing uses segment ops (see gvp.py)
instead of torch_geometric's flattened CSR-style graph.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.common import linear
from .util import nan_to_num, norm, normalize, rbf


def dihedrals(coords: jax.Array, eps: float = 1e-7) -> jax.Array:
    """(B, L, 3+, 3) backbone -> (B, L, 6) cos/sin of phi/psi/omega
    (reference features.py:111-134)."""
    b = coords.shape[0]
    x = coords[:, :, :3].reshape(b, -1, 3)
    dx = x[:, 1:] - x[:, :-1]
    u = normalize(dx, axis=-1)
    u_2, u_1, u_0 = u[:, :-2], u[:, 1:-1], u[:, 2:]
    n_2 = normalize(jnp.cross(u_2, u_1), axis=-1)
    n_1 = normalize(jnp.cross(u_1, u_0), axis=-1)
    cos_d = jnp.clip(jnp.sum(n_2 * n_1, -1), -1 + eps, 1 - eps)
    d = jnp.sign(jnp.sum(u_2 * n_1, -1)) * jnp.arccos(cos_d)
    d = jnp.pad(d, ((0, 0), (1, 2)))
    d = d.reshape(b, -1, 3)
    return jnp.concatenate([jnp.cos(d), jnp.sin(d)], axis=-1)


def orientations(x_ca: jax.Array) -> jax.Array:
    """(B, L, 3) -> (B, L, 2, 3) forward/backward unit vectors."""
    fwd = normalize(x_ca[:, 1:] - x_ca[:, :-1])
    bwd = normalize(x_ca[:, :-1] - x_ca[:, 1:])
    fwd = jnp.pad(fwd, ((0, 0), (0, 1), (0, 0)))
    bwd = jnp.pad(bwd, ((0, 0), (1, 0), (0, 0)))
    return jnp.concatenate([fwd[:, :, None], bwd[:, :, None]], axis=-2)


def sidechains(coords: jax.Array) -> jax.Array:
    """(B, L, 3, 3) -> (B, L, 3) idealized CB direction."""
    n, origin, c = coords[:, :, 0], coords[:, :, 1], coords[:, :, 2]
    c = normalize(c - origin)
    n = normalize(n - origin)
    bisector = normalize(c + n)
    perp = normalize(jnp.cross(c, n))
    return -bisector * math.sqrt(1 / 3) - perp * math.sqrt(2 / 3)


def node_features(
    coords: jax.Array, coord_mask: jax.Array, with_coord_mask: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """-> (scalars (B,L,6|7), vectors (B,L,3,3))."""
    scalars = dihedrals(coords)
    if with_coord_mask:
        scalars = jnp.concatenate(
            [scalars, coord_mask.astype(jnp.float32)[..., None]], axis=-1
        )
    x_ca = coords[:, :, 1]
    vec = jnp.concatenate(
        [orientations(x_ca), sidechains(coords)[:, :, None]], axis=-2
    )
    return scalars, vec


def knn_graph(
    x_ca: jax.Array,
    coord_mask: jax.Array,
    padding_mask: jax.Array,
    top_k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """kNN over CA with the reference's masked tie-break sorting
    (features.py:156-185). Returns (D_neighbors, E_idx, coord_mask_neighbors,
    residue_mask_neighbors), each (B, L, K)."""
    b, l = x_ca.shape[:2]
    cm2 = coord_mask[:, :, None] * coord_mask[:, None, :]
    rm = ~padding_mask
    rm2 = rm[:, :, None] * rm[:, None, :]
    dx = x_ca[:, :, None] - x_ca[:, None, :]
    d = cm2 * norm(dx, axis=-1)

    seqpos = jnp.arange(l)
    dseq = jnp.abs(seqpos[:, None] - seqpos[None, :])[None]
    d_adjust = (
        nan_to_num(d)
        + (~cm2) * (1e8 + dseq * 1e6)
        + (~rm2) * 1e10
    )
    k = min(top_k, l)
    neg_d, e_idx = jax.lax.top_k(-d_adjust, k)
    d_neighbors = -neg_d
    return d_neighbors, e_idx, d_neighbors < 5e7, d_neighbors < 5e9


def positional_embeddings(offsets: jax.Array, num_embeddings: int = 16) -> jax.Array:
    """Sinusoidal relative-position features over src-dst offsets
    (reference features.py:139-155)."""
    freq = jnp.exp(
        jnp.arange(0, num_embeddings, 2, dtype=jnp.float32)
        * -(math.log(10000.0) / num_embeddings)
    )
    angles = offsets[..., None] * freq
    return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)


def edge_features(
    coords: jax.Array,
    coord_mask: jax.Array,
    padding_mask: jax.Array,
    *,
    top_k: int,
    num_pos_embeddings: int = 16,
    remove_edges_without_coords: bool = True,
):
    """Dense edge featurization (reference features.py:300-352).

    Returns ((edge_s (B,E,34), edge_v (B,E,1,3)), src (B,E), dst (B,E),
    edge_valid (B,E)) with E = L*K. ``src`` is the center residue, ``dst`` its
    neighbor; invalid edges flagged in edge_valid (reference sets index -1)."""
    x_ca = coords[:, :, 1]
    d_nb, e_idx, e_coord_mask, e_residue_mask = knn_graph(
        x_ca, coord_mask, padding_mask, top_k
    )
    b, l, k = e_idx.shape
    src = jnp.broadcast_to(jnp.arange(l)[None, :, None], (b, l, k)).reshape(b, -1)
    dst = e_idx.reshape(b, -1)
    e_dist = d_nb.reshape(b, -1)
    e_coord_mask = e_coord_mask.reshape(b, -1)[..., None]
    e_residue_mask = e_residue_mask.reshape(b, -1)

    pos_emb = positional_embeddings(
        (src - dst).astype(jnp.float32), num_pos_embeddings
    )
    d_rbf = rbf(e_dist, 0.0, 20.0)

    x_src = jnp.take_along_axis(x_ca, src[..., None], axis=1)
    x_dst = jnp.take_along_axis(x_ca, dst[..., None], axis=1)
    cm_src = jnp.take_along_axis(coord_mask, src, axis=1)
    cm_dst = jnp.take_along_axis(coord_mask, dst, axis=1)

    e_vec = x_src - x_dst
    e_mean = jnp.sum(e_vec * e_coord_mask, axis=1, keepdims=True) / jnp.sum(
        e_coord_mask, axis=1, keepdims=True
    )
    e_vec = jnp.where(e_coord_mask, e_vec, e_mean)

    edge_s = jnp.concatenate([d_rbf, pos_emb], axis=-1)
    edge_v = normalize(e_vec)[..., None, :]
    edge_s = nan_to_num(edge_s)
    edge_v = nan_to_num(edge_v)
    edge_s = jnp.concatenate(
        [
            edge_s,
            (~cm_src).astype(jnp.float32)[..., None],
            (~cm_dst).astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )
    edge_valid = e_residue_mask
    if remove_edges_without_coords:
        edge_valid = edge_valid & e_coord_mask[..., 0]
    return (edge_s, edge_v), src, dst, edge_valid


def dihedral_features(params, coords: jax.Array) -> jax.Array:
    """DihedralFeatures embed (reference features.py:209-256): linear embed of
    the 6 dihedral features + Normalize (non-standard LN with sigma = sqrt(var+eps)
    and an extra +eps in the denominator)."""
    v = dihedrals(coords)
    v = linear(params["node_embedding"], v)
    eps = 1e-6
    mu = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.var(v, axis=-1, keepdims=True, ddof=1)
    sigma = jnp.sqrt(var + eps)
    gain = params["norm_nodes"]["gain"]
    bias = params["norm_nodes"]["bias"]
    return gain * (v - mu) / (sigma + eps) + bias
