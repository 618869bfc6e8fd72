"""AF2-style structure module in pure JAX (from scratch — no openfold).

Reference consumes openfold's StructureModule (esm/esmfold/v1/trunk.py:11,
144,203-207). Semantics follow AF2 Algorithms 20-23 as instantiated by the
ESMFold checkpoints: invariant point attention, shared-weight iteration over
num_blocks, quaternion backbone updates, angle resnet, torsion->rigid-group
frames->atom14 coordinates via the literature tables in
esm_tpu/data/residue_constants.npz.

Config (reference esm/esmfold/v1/trunk.py:16-32): c_s=384, c_z=128, c_ipa=16,
12 IPA heads, 4 qk / 8 v points, 8 blocks, 7 angles, trans_scale_factor=10.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...data import residue_constants as rc
from ...ops import rigid as rg
from ...ops.common import layer_norm, linear, softmax_fp32


@dataclass(frozen=True)
class StructureModuleConfig:
    c_s: int = 384
    c_z: int = 128
    c_ipa: int = 16
    c_resnet: int = 128
    no_heads_ipa: int = 12
    no_qk_points: int = 4
    no_v_points: int = 8
    dropout_rate: float = 0.1
    no_blocks: int = 8
    no_transition_layers: int = 1
    no_resnet_blocks: int = 2
    no_angles: int = 7
    trans_scale_factor: int = 10
    epsilon: float = 1e-8
    inf: float = 1e5


def invariant_point_attention(
    params,
    cfg: StructureModuleConfig,
    s: jax.Array,
    z: jax.Array,
    r: rg.Rigid,
    mask: jax.Array,
) -> jax.Array:
    """IPA (AF2 Alg. 22). s: (B, L, c_s); z: (B, L, L, c_z); r over (B, L);
    mask: (B, L). Returns the s update (B, L, c_s)."""
    b_dim, l, _ = s.shape
    h, c = cfg.no_heads_ipa, cfg.c_ipa
    pq, pv = cfg.no_qk_points, cfg.no_v_points

    q = linear(params["linear_q"], s).reshape(b_dim, l, h, c)
    kv = linear(params["linear_kv"], s).reshape(b_dim, l, h, 2 * c)
    k, v = jnp.split(kv, 2, axis=-1)

    def to_points(t, n_pts):
        # layout: first h*n_pts values are x coords, then y, then z
        # (matches openfold's split/stack construction)
        xyz = jnp.stack(jnp.split(t, 3, axis=-1), axis=-1)  # (B, L, h*p, 3)
        xyz = rg.apply(rg.Rigid(r.rots[..., None, :, :], r.trans[..., None, :]), xyz)
        return xyz.reshape(b_dim, l, h, n_pts, 3)

    q_pts = to_points(linear(params["linear_q_points"], s), pq)
    kv_pts_flat = linear(params["linear_kv_points"], s)
    kv_pts = jnp.stack(jnp.split(kv_pts_flat, 3, axis=-1), axis=-1)
    kv_pts = rg.apply(rg.Rigid(r.rots[..., None, :, :], r.trans[..., None, :]), kv_pts)
    kv_pts = kv_pts.reshape(b_dim, l, h, pq + pv, 3)
    k_pts, v_pts = jnp.split(kv_pts, [pq], axis=-2)

    bias = linear(params["linear_b"], z)  # (B, L, L, H)

    a = jnp.einsum("bihc,bjhc->bhij", q, k)
    a = a * math.sqrt(1.0 / (3 * c))
    a = a + math.sqrt(1.0 / 3) * jnp.transpose(bias, (0, 3, 1, 2))

    # point attention: summed squared distances between global-frame points.
    # Expanded as Σ_p|q-k|² = Σ_p|q|² + Σ_p|k|² − 2 Σ_p q·k so the cross term
    # is one MXU einsum with an O(L²·H) output — the direct broadcast form
    # materializes an O(L²·H·P·3) difference tensor (2.4 GB at L=2048).
    head_w = jax.nn.softplus(params["head_weights"])  # (H,)
    head_w = head_w * math.sqrt(1.0 / (3 * (pq * 9.0 / 2)))
    qq = jnp.sum(q_pts * q_pts, axis=(-1, -2))        # (B, L, H)
    kk = jnp.sum(k_pts * k_pts, axis=(-1, -2))        # (B, L, H)
    # HIGHEST: TPU matmuls round inputs through bf16 by default, and the
    # q²+k²−2qk cancellation (global-frame coords reach O(10) units, so
    # qq/kk ≫ d2) amplifies that rounding into O(1) logit errors.
    qk = jnp.einsum(
        "bihpx,bjhpx->bhij", q_pts, k_pts, precision=jax.lax.Precision.HIGHEST
    )
    d2 = (
        jnp.transpose(qq, (0, 2, 1))[..., :, None]
        + jnp.transpose(kk, (0, 2, 1))[..., None, :]
        - 2.0 * qk
    )                                                  # (B, H, Li, Lj)
    a = a + d2 * (head_w[None, :, None, None] * -0.5)

    square_mask = mask[:, :, None] * mask[:, None, :]
    a = a + (cfg.inf * (square_mask - 1.0))[:, None]
    a = softmax_fp32(a)

    o = jnp.einsum("bhij,bjhc->bihc", a, v).reshape(b_dim, l, h * c)

    o_pt = jnp.einsum("bhij,bjhpx->bihpx", a, v_pts)  # (B, L, H, Pv, 3)
    o_pt = rg.invert_apply(
        rg.Rigid(r.rots[..., None, None, :, :], r.trans[..., None, None, :]), o_pt
    )
    o_pt_norm = jnp.sqrt(jnp.sum(o_pt ** 2, axis=-1) + cfg.epsilon).reshape(
        b_dim, l, h * pv
    )
    o_pt_flat = o_pt.reshape(b_dim, l, h * pv, 3)

    o_pair = jnp.einsum("bhij,bijc->bihc", a, z).reshape(b_dim, l, h * cfg.c_z)

    # concat order matches openfold: scalar out, pt x, pt y, pt z, pt norms, pair
    cat = jnp.concatenate(
        [o, o_pt_flat[..., 0], o_pt_flat[..., 1], o_pt_flat[..., 2], o_pt_norm, o_pair],
        axis=-1,
    )
    return linear(params["linear_out"], cat)


def angle_resnet(params, cfg: StructureModuleConfig, s, s_initial):
    """AF2 Alg. 20 lines 11-14. Returns (unnormalized, normalized) (..., 7, 2)."""
    s_initial = linear(params["linear_initial"], jax.nn.relu(s_initial))
    s = linear(params["linear_in"], jax.nn.relu(s))
    s = s + s_initial
    for layer in params["layers"]:
        a = linear(layer["linear_1"], jax.nn.relu(s))
        a = linear(layer["linear_2"], jax.nn.relu(a))
        s = s + a
    s = linear(params["linear_out"], jax.nn.relu(s))
    s = s.reshape(s.shape[:-1] + (cfg.no_angles, 2))
    unnormalized = s
    denom = jnp.sqrt(
        jnp.maximum(jnp.sum(s ** 2, axis=-1, keepdims=True), cfg.epsilon)
    )
    return unnormalized, s / denom


def transition(params, s):
    for layer in params["layers"]:
        h = linear(layer["linear_1"], s)
        h = linear(layer["linear_2"], jax.nn.relu(h))
        h = linear(layer["linear_3"], jax.nn.relu(h))
        s = s + h
    return layer_norm(params["layer_norm"], s)


def torsion_angles_to_frames(
    r: rg.Rigid, alpha: jax.Array, aatype: jax.Array
) -> rg.Rigid:
    """AF2 Alg. 24 steps: default frames composed with x-axis torsion rotations,
    chi chaining, mapped to global (openfold feats.torsion_angles_to_frames)."""
    default_4x4 = jnp.asarray(np.asarray(rc.restype_rigid_group_default_frame))[aatype]
    default_r = rg.from_tensor_4x4(default_4x4)  # (..., 8)

    bb_rot = jnp.zeros(alpha.shape[:-2] + (1, 2), alpha.dtype).at[..., 1].set(1.0)
    alpha = jnp.concatenate([bb_rot, alpha], axis=-2)  # (..., 8, 2)

    sin_a, cos_a = alpha[..., 0], alpha[..., 1]
    zeros = jnp.zeros_like(sin_a)
    ones = jnp.ones_like(sin_a)
    all_rots = jnp.stack(
        [
            ones, zeros, zeros,
            zeros, cos_a, -sin_a,
            zeros, sin_a, cos_a,
        ],
        axis=-1,
    ).reshape(sin_a.shape + (3, 3))

    all_frames = rg.compose(default_r, rg.Rigid(all_rots, jnp.zeros_like(default_r.trans)))

    chi1 = all_frames[..., 4]
    chi2 = rg.compose(chi1, all_frames[..., 5])
    chi3 = rg.compose(chi2, all_frames[..., 6])
    chi4 = rg.compose(chi3, all_frames[..., 7])

    def cat(*parts):
        rots = jnp.concatenate([p.rots for p in parts], axis=-3)
        trans = jnp.concatenate([p.trans for p in parts], axis=-2)
        return rg.Rigid(rots, trans)

    def unsq(x: rg.Rigid) -> rg.Rigid:
        return rg.Rigid(x.rots[..., None, :, :], x.trans[..., None, :])

    all_frames_to_bb = cat(
        rg.Rigid(all_frames.rots[..., :5, :, :], all_frames.trans[..., :5, :]),
        unsq(chi2), unsq(chi3), unsq(chi4),
    )
    return rg.compose(unsq(r), all_frames_to_bb)


def frames_to_atom14(frames: rg.Rigid, aatype: jax.Array) -> jax.Array:
    """Literature positions placed by per-atom rigid-group frames
    (openfold feats.frames_and_literature_positions_to_atom14_pos)."""
    group_idx = jnp.asarray(np.asarray(rc.restype_atom14_to_rigid_group))[aatype]
    group_mask = jax.nn.one_hot(group_idx, 8, dtype=frames.rots.dtype)  # (..., 14, 8)
    # select each atom's frame
    rots = jnp.einsum("...gij,...ag->...aij", frames.rots, group_mask)
    trans = jnp.einsum("...gi,...ag->...ai", frames.trans, group_mask)
    atom_frames = rg.Rigid(rots, trans)

    lit = jnp.asarray(np.asarray(rc.restype_atom14_rigid_group_positions))[aatype]
    pred = rg.apply(atom_frames, lit)
    mask = jnp.asarray(np.asarray(rc.restype_atom14_mask))[aatype]
    return pred * mask[..., None]


def structure_module_apply(
    params,
    cfg: StructureModuleConfig,
    s: jax.Array,
    z: jax.Array,
    aatype: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Full structure module (AF2 Alg. 20). Returns dict with per-block stacks:
    frames (K,B,L,7), sidechain_frames (K,B,L,8,4,4), unnormalized_angles,
    angles (K,B,L,7,2), positions (K,B,L,14,3), states (K,B,L,c_s), single."""
    if mask is None:
        mask = jnp.ones(s.shape[:-1], s.dtype)

    s = layer_norm(params["layer_norm_s"], s)
    z = layer_norm(params["layer_norm_z"], z)
    s_initial = s
    s = linear(params["linear_in"], s)

    rigids = rg.identity(s.shape[:-1], s.dtype)
    outputs = []
    for _ in range(cfg.no_blocks):  # shared weights across blocks (AF2)
        s = s + invariant_point_attention(params["ipa"], cfg, s, z, rigids, mask)
        s = layer_norm(params["layer_norm_ipa"], s)
        s = transition(params["transition"], s)

        update = linear(params["bb_update"]["linear"], s)
        rigids = rg.compose_q_update_vec(rigids, update)

        backb_to_global = rg.scale_translation(rigids, cfg.trans_scale_factor)
        unnormalized_angles, angles = angle_resnet(
            params["angle_resnet"], cfg, s, s_initial
        )
        all_frames = torsion_angles_to_frames(backb_to_global, angles, aatype)
        pred_xyz = frames_to_atom14(all_frames, aatype)
        scaled = rg.scale_translation(rigids, cfg.trans_scale_factor)

        outputs.append(
            {
                "frames": rg.to_tensor_7(scaled),
                "sidechain_frames": rg.to_tensor_4x4(all_frames),
                "unnormalized_angles": unnormalized_angles,
                "angles": angles,
                "positions": pred_xyz,
                "states": s,
            }
        )
        rigids = rg.stop_rot_gradient(rigids)

    out = {k: jnp.stack([o[k] for o in outputs], axis=0) for k in outputs[0]}
    out["single"] = s
    return out
