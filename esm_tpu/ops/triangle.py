"""Triangle multiplicative updates and triangle attention (Evoformer pair ops).

From-scratch JAX equivalents of the openfold modules the reference consumes
(esm/esmfold/v1/tri_self_attn_block.py:6-13,58-77). Semantics follow AF2
Algorithms 11-14 exactly (gated projections, -inf→-1e9 masking, per-row
triangle bias):

  * outgoing multiplication:  x[i,j] = Σ_k a[i,k] ⊙ b[j,k]
  * incoming multiplication:  x[i,j] = Σ_k a[k,i] ⊙ b[k,j]
  * starting-node attention:  rows attend over j with bias from z
  * ending-node attention:    transpose, same, transpose back

All einsums are MXU contractions over L; fp32 softmax. The O(L³·c) triangle
multiplications dominate ESMFold trunk FLOPs — XLA maps the batched einsum
directly to the MXU; a Pallas blockwise variant slots in here when the L×L
pair tensor is sequence-sharded (see esm_tpu/parallel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .common import layer_norm, linear, materialize_kernel, softmax_fp32


def triangle_multiplicative_update(
    params,
    z: jax.Array,
    *,
    outgoing: bool,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """z: (B, I, J, C); mask: (B, I, J). Returns the residual update."""
    if mask is None:
        mask = jnp.ones(z.shape[:-1], z.dtype)
    mask = mask[..., None].astype(z.dtype)

    zn = layer_norm(params["layer_norm_in"], z)
    # One fused projection GEMM for [a_g | a_p | b_g | b_p | g]: zn is an
    # O(L^2 * C) HBM tensor, so five separate 128-wide linears re-read it five
    # times; column-wise the concatenated GEMM is numerically identical.
    c = zn.shape[-1]
    names = ("linear_a_g", "linear_a_p", "linear_b_g", "linear_b_p", "linear_g")
    kern = jnp.concatenate(
        [materialize_kernel(params[n], zn.dtype) for n in names], axis=1
    )
    bias = jnp.concatenate([params[n]["bias"] for n in names])
    p = jnp.dot(zn, kern) + bias.astype(zn.dtype)
    a_g, a_p, b_g, b_p, g_l = (p[..., k * c:(k + 1) * c] for k in range(5))
    a = mask * jax.nn.sigmoid(a_g) * a_p
    b = mask * jax.nn.sigmoid(b_g) * b_p

    if outgoing:
        x = jnp.einsum("bikc,bjkc->bijc", a, b)
    else:
        x = jnp.einsum("bkic,bkjc->bijc", a, b)

    x = layer_norm(params["layer_norm_out"], x)
    x = linear(params["linear_z"], x)
    return x * jax.nn.sigmoid(g_l)


def triangle_multiplicative_update_fused(
    params,
    z: jax.Array,
    *,
    outgoing: bool,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused-kernel variant: returns ``z + update`` (the residual add is folded
    into the epilogue kernel). The O(L^3*C) einsum stays in XLA (it maps onto
    the MXU directly); the surrounding LN/gating/projection pipelines run as
    two Pallas kernels so the O(L^2*C) pair tensor crosses HBM once per stage
    (see esm_tpu/kernels/triangle_mul.py). Same math as
    :func:`triangle_multiplicative_update`.
    """
    from ..kernels.triangle_mul import tri_mul_epilogue, tri_mul_stage1

    # mask=None propagates: stage 1 then runs without a mask stream (the
    # lane-padded (rows, 1) mask otherwise costs as much HBM traffic as z
    # itself at C=128)
    a, b = tri_mul_stage1(z, mask, params)
    if outgoing:
        x = jnp.einsum("bikc,bjkc->bijc", a, b)
    else:
        x = jnp.einsum("bkic,bkjc->bijc", a, b)
    return tri_mul_epilogue(x, z, params)


def triangle_attention(
    params,
    z: jax.Array,
    *,
    num_heads: int,
    starting: bool,
    mask: Optional[jax.Array] = None,
    inf: float = 1e9,
    chunk_size: Optional[int] = None,
    use_flash: bool = False,
) -> jax.Array:
    """z: (B, I, J, C); mask: (B, I, J). Gated MHA over the J axis per row
    (starting) or over I per column (ending). Returns the residual update.

    ``chunk_size``: process this many rows at a time via lax.map — the naive
    logits tensor is O(I·H·J²) = O(L³·H), so chunking over rows is the memory
    lever (reference: openfold chunk_layer plumbed through
    esm/esmfold/v1/esmfold.py:354-360 set_chunk_size)."""
    if mask is None:
        mask = jnp.ones(z.shape[:-1], z.dtype)

    if not starting:
        z = jnp.swapaxes(z, -2, -3)
        mask = jnp.swapaxes(mask, -1, -2)

    zn = layer_norm(params["layer_norm"], z)

    # additive biases: mask (B, I, 1, 1, J) + triangle (B, 1, H, Jq, Jk)
    mask_bias = (inf * (mask - 1.0))[..., :, None, None, :]
    tri = linear(params["linear"], zn)  # (B, I, J, H)
    tri_bias = jnp.transpose(tri, (0, 3, 1, 2))[:, None]  # (B, 1, H, I, J)

    b, i, j, c = zn.shape
    head_dim = c // num_heads

    def attend_rows(zr, mb):
        """zr: (B, ci, J, C) rows; mb: (B, ci, 1, 1, J). Row-local attention."""
        ci = zr.shape[1]

        def heads(t):
            return t.reshape(b, ci, j, num_heads, head_dim).transpose(0, 1, 3, 2, 4)

        q = heads(linear(params["mha"]["linear_q"], zr)) / (head_dim ** 0.5)
        k = heads(linear(params["mha"]["linear_k"], zr))
        v = heads(linear(params["mha"]["linear_v"], zr))

        a = jnp.einsum("bihqd,bihkd->bihqk", q, k)  # (B, ci, H, Jq, Jk)
        a = a + mb
        a = a + tri_bias
        a = softmax_fp32(a)
        o = jnp.einsum("bihqk,bihkd->bihqd", a, v)
        o = o.transpose(0, 1, 3, 2, 4).reshape(b, ci, j, c)
        g = jax.nn.sigmoid(linear(params["mha"]["linear_g"], zr))
        return linear(params["mha"]["linear_o"], o * g)

    if use_flash:
        # Fused Pallas path: nothing bigger than one (J, J) tile materializes
        # (see esm_tpu/kernels/triangle_attention.py); for J > 1024 the kernel
        # switches to q-strip blocking so VMEM stays bounded at any length.
        # Measured (L=1000, v5e): separate q/k/v projections beat a fused
        # 3C-wide GEMM — XLA fuses each head-layout transpose into its GEMM
        # epilogue, while the fused variant materializes the 6-D transpose.
        from ..kernels.triangle_attention import NEG_INF, triangle_attention_fused

        def heads_dj(t):
            # (B, I, H, d, J): J on the lane axis — the (..., J, d) layout
            # would pad d=32 lanes to 128 (4x HBM) on every operand.
            return t.reshape(b, i, j, num_heads, head_dim).transpose(0, 1, 3, 4, 2)

        q = heads_dj(linear(params["mha"]["linear_q"], zn)) / (head_dim ** 0.5)
        k = heads_dj(linear(params["mha"]["linear_k"], zn))
        v = heads_dj(linear(params["mha"]["linear_v"], zn))
        tri_b = jnp.transpose(tri, (0, 3, 1, 2)).astype(jnp.float32)  # (B,H,J,J)
        key_bias = jnp.where(mask > 0, 0.0, NEG_INF).astype(jnp.float32)  # (B,I,J)
        o = triangle_attention_fused(q, k, v, tri_b, key_bias)  # (B,I,H,d,J)
        o = o.transpose(0, 1, 4, 2, 3).reshape(b, i, j, c)
        g = jax.nn.sigmoid(linear(params["mha"]["linear_g"], zn))
        o = linear(params["mha"]["linear_o"], o * g)
    elif chunk_size is None or chunk_size >= i:
        o = attend_rows(zn, mask_bias)
    else:
        pad = (-i) % chunk_size
        znp = jnp.pad(zn, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mbp = jnp.pad(mask_bias, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        nc = (i + pad) // chunk_size
        znp = znp.reshape(b, nc, chunk_size, j, c).transpose(1, 0, 2, 3, 4)
        mbp = mbp.reshape(b, nc, chunk_size, 1, 1, j).transpose(1, 0, 2, 3, 4, 5)
        o = jax.lax.map(lambda args: attend_rows(*args), (znp, mbp))
        o = o.transpose(1, 0, 2, 3, 4).reshape(b, i + pad, j, c)[:, :i]

    if not starting:
        o = jnp.swapaxes(o, -2, -3)
    return o
