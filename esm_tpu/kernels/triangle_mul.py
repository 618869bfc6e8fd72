"""Fused triangle-multiplication stage kernels (Pallas).

The triangular multiplicative update (reference: openfold
TriangleMultiplicationOutgoing/Incoming consumed at
esm/esmfold/v1/tri_self_attn_block.py:58-65) is

    a = mask * sig(zn @ Wag) * (zn @ Wap)        zn = LN(z)
    b = mask * sig(zn @ Wbg) * (zn @ Wbp)
    x = einsum(a, b)                             (outgoing or incoming)
    out = sig(zn @ Wg) * (LN(x) @ Wz + bz)

The O(L^3 * C) einsum maps straight onto the MXU as a batched GEMM and is
left to XLA. Everything around it is HBM-bound elementwise/LN/small-GEMM
work over O(L^2 * C) tensors; unfused, each op is a full HBM round trip.
These two kernels fuse the pre-einsum ("stage 1": LN + gating projections)
and post-einsum ("epilogue": out-LN + output projection + gate + residual)
pipelines so the pair tensor crosses HBM once per stage. Measured at
L=1000/C=128 (v5e): 15.4 ms -> ~9 ms per update.

Both kernels view the pair tensor as flattened rows (B*I*J, C); LayerNorm
runs over the lane (channel) axis in fp32, matching ops/common.layer_norm.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.common import materialize_kernel


def _ln_rows(x32, scale, bias, eps=1e-5):
    """fp32 LayerNorm over the last (lane) axis. x32: (rows, C)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def _stage1_impl(z_ref, m_ref, w_ref, b_ref, lns_ref, lnb_ref, a_ref, bb_ref):
    """rows-block of: zn = LN(z); p = zn @ W4 + b4; a/b = [m*]sig(g)*p.

    z: (rows, C); m: (rows, 1) int8 or None (all-valid); W4: (C, 4C) =
    [a_g|a_p|b_g|b_p]; outputs a, b: (rows, C) in z's dtype. The mask stream
    is int8 and optional because the T(8,128) tiling pads its minor dim to
    128 lanes — at C=128 a bf16 (rows, 1) mask would cost as much HBM
    traffic as z itself for one logical bit per row.
    """
    z = z_ref[...]
    c = z.shape[-1]
    zn32 = _ln_rows(z.astype(jnp.float32), lns_ref[0][None, :], lnb_ref[0][None, :])
    zn = zn32.astype(z.dtype)
    p = jax.lax.dot_general(
        zn, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # gating math in fp32 (Mosaic mis-lowers bf16 sigmoid broadcasts)
    p = p + b_ref[0][None, :].astype(jnp.float32)
    a = jax.nn.sigmoid(p[:, :c]) * p[:, c : 2 * c]
    bb = jax.nn.sigmoid(p[:, 2 * c : 3 * c]) * p[:, 3 * c :]
    if m_ref is not None:
        m = m_ref[...].astype(jnp.float32)  # (rows, 1)
        a = m * a
        bb = m * bb
    a_ref[...] = a.astype(a_ref.dtype)
    bb_ref[...] = bb.astype(bb_ref.dtype)


def _stage1_kernel(z_ref, m_ref, w_ref, b_ref, lns_ref, lnb_ref, a_ref, bb_ref):
    _stage1_impl(z_ref, m_ref, w_ref, b_ref, lns_ref, lnb_ref, a_ref, bb_ref)


def _stage1_kernel_nomask(z_ref, w_ref, b_ref, lns_ref, lnb_ref, a_ref, bb_ref):
    _stage1_impl(z_ref, None, w_ref, b_ref, lns_ref, lnb_ref, a_ref, bb_ref)


def _epilogue_kernel(
    x_ref, z_ref, wg_ref, bg_ref, wz_ref, bz_ref,
    lnis_ref, lnib_ref, lnos_ref, lnob_ref, o_ref,
):
    """rows-block of: out = z + sig(LN_in(z) @ Wg + bg) * (LN_out(x) @ Wz + bz).

    Recomputes zn = LN_in(z) (cheaper than a third stage-1 output tensor);
    fuses the block's residual add.
    """
    z = z_ref[...]
    x = x_ref[...]
    zn = _ln_rows(
        z.astype(jnp.float32), lnis_ref[0][None, :], lnib_ref[0][None, :]
    ).astype(z.dtype)
    g = jax.lax.dot_general(
        zn, wg_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    g = jax.nn.sigmoid(g + bg_ref[0][None, :].astype(jnp.float32))
    xn = _ln_rows(
        x.astype(jnp.float32), lnos_ref[0][None, :], lnob_ref[0][None, :]
    ).astype(z.dtype)
    u = jax.lax.dot_general(
        xn, wz_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    u = u + bz_ref[0][None, :].astype(jnp.float32)
    o_ref[...] = z + (g * u).astype(z.dtype)


def _rows_call(kernel, arrays, weights, out_num, rows, c, dtype, interpret, block_rows=4096):
    """Launch a rows-blocked kernel: `arrays` are (rows, C)/(rows, 1) tensors,
    `weights` replicated (index_map -> origin). Returns `out_num` (rows, C)."""
    pad = (-rows) % block_rows
    if pad:
        arrays = [jnp.pad(t, ((0, pad), (0, 0))) for t in arrays]
    rp = rows + pad
    grid = (rp // block_rows,)
    in_specs = [
        pl.BlockSpec((block_rows, t.shape[1]), lambda i: (i, 0)) for t in arrays
    ] + [
        # bind the rank NOW — a late-binding `w.shape` would make every
        # index_map use the LAST weight's rank
        pl.BlockSpec(w.shape, lambda i, r=len(w.shape): (0,) * r) for w in weights
    ]
    out_specs = [pl.BlockSpec((block_rows, c), lambda i: (i, 0))] * out_num
    out_shape = [jax.ShapeDtypeStruct((rp, c), dtype)] * out_num
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if out_num > 1 else out_specs[0],
        out_shape=out_shape if out_num > 1 else out_shape[0],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*arrays, *weights)
    if out_num == 1:
        outs = (outs,)
    if pad:
        outs = tuple(o[:rows] for o in outs)
    return outs


def _as2d(v):
    return v[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def tri_mul_stage1(z, mask, params, interpret: Optional[bool] = None):
    """z: (B, I, J, C); mask: (B, I, J) or None (all valid — skips the mask
    stream entirely). Returns gated a, b (B, I, J, C)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, c = z.shape
    rows = 1
    for d in lead:
        rows *= d
    zf = z.reshape(rows, c)
    # int8 stream: the lane-padded (rows, 1) tile costs bytes-per-row equal
    # to 128·itemsize regardless of the logical width
    mf = None if mask is None else mask.reshape(rows, 1).astype(jnp.int8)
    w4 = jnp.concatenate(
        [materialize_kernel(params[n], z.dtype)
         for n in ("linear_a_g", "linear_a_p", "linear_b_g", "linear_b_p")],
        axis=1,
    )
    b4 = _as2d(
        jnp.concatenate(
            [params[n]["bias"] for n in ("linear_a_g", "linear_a_p", "linear_b_g", "linear_b_p")]
        )
    ).astype(z.dtype)
    lns = _as2d(params["layer_norm_in"]["scale"]).astype(jnp.float32)
    lnb = _as2d(params["layer_norm_in"]["bias"]).astype(jnp.float32)
    if mf is None:
        a, b = _rows_call(
            _stage1_kernel_nomask, [zf], [w4, b4, lns, lnb], 2, rows, c,
            z.dtype, interpret,
        )
    else:
        a, b = _rows_call(
            _stage1_kernel, [zf, mf], [w4, b4, lns, lnb], 2, rows, c,
            z.dtype, interpret,
        )
    return a.reshape(z.shape), b.reshape(z.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tri_mul_epilogue(x, z, params, interpret: Optional[bool] = None):
    """Returns z + sig(LN_in(z)@Wg+bg) * (LN_out(x)@Wz+bz); shapes (B,I,J,C)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, c = z.shape
    rows = 1
    for d in lead:
        rows *= d
    xf = x.reshape(rows, c).astype(z.dtype)
    zf = z.reshape(rows, c)
    weights = [
        materialize_kernel(params["linear_g"], z.dtype),
        _as2d(params["linear_g"]["bias"]).astype(z.dtype),
        materialize_kernel(params["linear_z"], z.dtype),
        _as2d(params["linear_z"]["bias"]).astype(z.dtype),
        _as2d(params["layer_norm_in"]["scale"]).astype(jnp.float32),
        _as2d(params["layer_norm_in"]["bias"]).astype(jnp.float32),
        _as2d(params["layer_norm_out"]["scale"]).astype(jnp.float32),
        _as2d(params["layer_norm_out"]["bias"]).astype(jnp.float32),
    ]
    (o,) = _rows_call(_epilogue_kernel, [xf, zf], weights, 1, rows, c, z.dtype, interpret)
    return o.reshape(z.shape)
