"""Rigid-frame (rotation + translation) math in pure JAX.

From-scratch equivalents of the openfold Rigid/Rotation utilities the
reference's structure module depends on (esm/esmfold/v1/trunk.py:11,144).
Rotations are stored as (..., 3, 3) matrices; quaternions appear only in the
backbone update (compose_q_update_vec) and in the 7-tensor frame output.

A rigid is a pytree tuple (rots, trans): rots (..., 3, 3), trans (..., 3).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Rigid(NamedTuple):
    rots: jax.Array    # (..., 3, 3)
    trans: jax.Array   # (..., 3)

    @property
    def shape(self):
        return self.trans.shape[:-1]

    def __getitem__(self, idx) -> "Rigid":
        """Index batch dims only (the trailing (3,3)/(3,) dims are preserved)."""
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Rigid(
            self.rots[idx + (slice(None), slice(None))],
            self.trans[idx + (slice(None),)],
        )


def identity(shape: Tuple[int, ...], dtype=jnp.float32) -> Rigid:
    rots = jnp.broadcast_to(jnp.eye(3, dtype=dtype), shape + (3, 3))
    trans = jnp.zeros(shape + (3,), dtype)
    return Rigid(rots, trans)


def apply(r: Rigid, pts: jax.Array) -> jax.Array:
    """Apply rigid to points (..., 3): R @ p + t."""
    return jnp.einsum("...ij,...j->...i", r.rots, pts) + r.trans


def invert_apply(r: Rigid, pts: jax.Array) -> jax.Array:
    """Apply the inverse rigid: R^T (p - t)."""
    return jnp.einsum("...ji,...j->...i", r.rots, pts - r.trans)


def compose(a: Rigid, b: Rigid) -> Rigid:
    """a then-applied-to b: (Ra@Rb, Ra@tb + ta)."""
    rots = jnp.einsum("...ij,...jk->...ik", a.rots, b.rots)
    trans = jnp.einsum("...ij,...j->...i", a.rots, b.trans) + a.trans
    return Rigid(rots, trans)


def scale_translation(r: Rigid, factor: float) -> Rigid:
    return Rigid(r.rots, r.trans * factor)


def stop_rot_gradient(r: Rigid) -> Rigid:
    return Rigid(jax.lax.stop_gradient(r.rots), r.trans)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Normalized quaternion (..., 4) [w, x, y, z] -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0
    rot = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return rot.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(rot: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) [w, x, y, z].

    Uses the eigen-decomposition-free branch method (numerically matches
    openfold's implementation used for the to_tensor_7 frame output)."""
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate computations, each stable in a different region
    q_w = jnp.stack(
        [1.0 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1
    )
    q_x = jnp.stack(
        [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1
    )
    q_y = jnp.stack(
        [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1
    )
    q_z = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1
    )

    trace = m00 + m11 + m22
    cond = jnp.stack(
        [trace, m00, m11, m22], -1
    )
    case = jnp.argmax(
        jnp.stack([trace, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1),
        axis=-1,
    )
    case = case[..., None]
    q = jnp.select(
        [case == 0, case == 1, case == 2, case == 3],
        [q_w, q_x, q_y, q_z],
    )
    del cond
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def compose_q_update_vec(r: Rigid, update: jax.Array) -> Rigid:
    """Backbone update (AF2 Alg. 23): update (..., 6) = (b, c, d, tx, ty, tz).
    Quaternion (1, b, c, d) normalized -> rotation; compose on the right;
    translation applied in the current frame."""
    q_vec = update[..., :3]
    t_vec = update[..., 3:]
    ones = jnp.ones(q_vec.shape[:-1] + (1,), q_vec.dtype)
    quat = jnp.concatenate([ones, q_vec], axis=-1)
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    rot_update = quat_to_rot(quat)
    new_rots = jnp.einsum("...ij,...jk->...ik", r.rots, rot_update)
    new_trans = jnp.einsum("...ij,...j->...i", r.rots, t_vec) + r.trans
    return Rigid(new_rots, new_trans)


def to_tensor_7(r: Rigid) -> jax.Array:
    """(..., 7): quaternion (w,x,y,z) + translation."""
    return jnp.concatenate([rot_to_quat(r.rots), r.trans], axis=-1)


def to_tensor_4x4(r: Rigid) -> jax.Array:
    """Homogeneous (..., 4, 4) transform."""
    out = jnp.zeros(r.trans.shape[:-1] + (4, 4), r.trans.dtype)
    out = out.at[..., :3, :3].set(r.rots)
    out = out.at[..., :3, 3].set(r.trans)
    out = out.at[..., 3, 3].set(1.0)
    return out


def from_tensor_4x4(t: jax.Array) -> Rigid:
    return Rigid(t[..., :3, :3], t[..., :3, 3])
