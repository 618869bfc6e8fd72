"""Ring attention: sequence-sharded self-attention over a mesh axis.

The reference's only long-context strategy is chunking/truncation
(esm/axial_attention.py:40-69, scripts/extract.py:52-57 — SURVEY §5.7). Here
the sequence axis is sharded across chips and KV blocks rotate around the ring
via ppermute while each chip computes flash attention on the block in front of
it — communication overlaps compute, total traffic equals one all-gather but
pipelined (jax-ml scaling-book recipe; guide: ring collectives).

Semantics match ops/attention.multihead_attention for bidirectional (ESM-style)
attention with a key-padding mask: each chip maintains online-softmax state
(m, l, acc) across ring steps — the cross-chip softmax combine is exact.
Rows whose keys are ALL padded return zeros (the dense path's -inf softmax
gives NaN there; callers never consume fully-padded rows either way).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

NEG_INF = -1e30


def _local_attend(q, k, v, bias):
    """One block attention: q (B,H,Tq,d), k/v (B,H,Tk,d), bias (B,Tk).
    Returns (out_unnormalized, m, l) in fp32."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    s = s + bias[:, None, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    # Exact zeros at padded keys. In a mixed block masked entries already
    # underflow to 0 (raw - 1e30 - m), but in a fully-masked block m itself
    # is ~-1e30 and the additive bias cancels, leaving softmax(raw) — the
    # explicit zeroing makes l hit exactly 0 there so fully-padded rows come
    # out as zeros below instead of a garbage value mix.
    p = p * (bias > 0.5 * NEG_INF)[:, None, None, :]
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(jnp.float32)
    return acc, m, l


def _ring_flash_scan(q, k, v, bias, axis_name: str):
    """Forward flash ring: each step runs the Pallas flash kernel on the
    resident KV block and combines the normalized partials exactly via their
    log-sum-exp: out = Σ_i out_i · exp(lse_i − lse*) / Σ_i exp(lse_i − lse*).
    Returns (out in q's dtype, global lse)."""
    from ..kernels.flash_attention import flash_attention_with_lse

    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, step_idx):
        k_blk, v_blk, b_blk, out, lse = carry
        blk_out, blk_lse = flash_attention_with_lse(
            q, k_blk, v_blk, key_padding_mask=b_blk < 0.5 * NEG_INF
        )
        new_lse = jnp.logaddexp(lse, blk_lse)
        w_old = jnp.exp(lse - new_lse)
        w_new = jnp.exp(blk_lse - new_lse)
        out = out * w_old[..., None] + blk_out.astype(jnp.float32) * w_new[..., None]

        def rotate(blks):
            return tuple(jax.lax.ppermute(x, axis_name, perm) for x in blks)

        k_blk, v_blk, b_blk = jax.lax.cond(
            step_idx < n - 1, rotate, lambda blks: blks, (k_blk, v_blk, b_blk)
        )
        return (k_blk, v_blk, b_blk, out, new_lse), None

    b_, h_, tq, d = q.shape
    lse0 = jnp.full((b_, h_, tq), NEG_INF, jnp.float32)
    out0 = jnp.zeros((b_, h_, tq, d), jnp.float32)
    # (this body runs under check_vma=False — pallas_call outputs carry no
    # varying-axis typing — so no pcast is needed on the carries)
    (k, v, bias, out, lse), _ = jax.lax.scan(
        step, (k, v, bias, out0, lse0), jnp.arange(n)
    )
    # fully-padded rows: every block's lse is ~NEG_INF, so the combine passed
    # kernel garbage through with weight 1 — zero them explicitly
    out = jnp.where((lse <= 0.5 * NEG_INF)[..., None], 0.0, out)
    return out.astype(q.dtype), lse


def _ring_flash_bwd_scan(q, k, v, bias, out, lse, do, axis_name: str):
    """Backward flash ring: P_ij = exp(q_i·k_j − lse_i) with the GLOBAL lse
    makes each chip's per-block (dq, dk, dv) exact partials. dq accumulates
    locally; each KV block's dk/dv travel WITH the block around the ring
    (n rotations → home chip) while every chip adds its q's contribution."""
    from ..kernels.flash_attention import flash_attention_block_bwd

    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    # the forward zeroes fully-masked rows (lse ~ NEG_INF) with a `where`,
    # whose true gradient blocks their cotangent — mirror that here, or those
    # rows' upstream do would leak spurious softmax(s)-weighted grads into
    # q/k/v (p = exp(s + bias - lse) degenerates to softmax(s) when bias and
    # lse are both ~NEG_INF)
    do = jnp.where((lse <= 0.5 * NEG_INF)[..., None], 0.0, do)

    def step(carry, _):
        k_blk, v_blk, b_blk, dk_blk, dv_blk, dq = carry
        dq_p, dk_p, dv_p = flash_attention_block_bwd(
            q, k_blk, v_blk, out, lse, do,
            key_padding_mask=b_blk < 0.5 * NEG_INF,
        )
        dq = dq + dq_p.astype(jnp.float32)
        dk_blk = dk_blk + dk_p.astype(jnp.float32)
        dv_blk = dv_blk + dv_p.astype(jnp.float32)
        # rotate the block AND its accumulated grads every step: after n
        # rotations each (k, dk, dv) is back on its home chip
        k_blk, v_blk, b_blk, dk_blk, dv_blk = (
            jax.lax.ppermute(x, axis_name, perm)
            for x in (k_blk, v_blk, b_blk, dk_blk, dv_blk)
        )
        return (k_blk, v_blk, b_blk, dk_blk, dv_blk, dq), None

    (k_h, v_h, _, dk, dv, dq), _ = jax.lax.scan(
        step,
        (k, v, bias, jnp.zeros(k.shape, jnp.float32),
         jnp.zeros(v.shape, jnp.float32), jnp.zeros(q.shape, jnp.float32)),
        None,
        length=n,
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _ring_flash_body(q, k, v, bias, axis_name: str):
    """Differentiable flash ring (custom_vjp): forward = flash kernel per
    ring step with exact lse combination; backward = a second ring where the
    flash backward kernels run per block against the saved (out, lse)."""

    @jax.custom_vjp
    def core(q, k, v, bias):
        out, _ = _ring_flash_scan(q, k, v, bias, axis_name)
        return out

    def fwd(q, k, v, bias):
        out, lse = _ring_flash_scan(q, k, v, bias, axis_name)
        return out, (q, k, v, bias, out, lse)

    def bwd(res, do):
        q, k, v, bias, out, lse = res
        dq, dk, dv = _ring_flash_bwd_scan(q, k, v, bias, out, lse, do, axis_name)
        return dq, dk, dv, jnp.zeros_like(bias)

    core.defvjp(fwd, bwd)
    return core(q, k, v, bias)


def _ring_body(q, k, v, bias, axis_name: str):
    """shard_map body: q/k/v (B, H, T/N, d) local shards; bias (B, T/N)."""
    n = jax.lax.psum(1, axis_name)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, step_idx):
        k_blk, v_blk, b_blk, m, l, acc = carry
        blk_acc, blk_m, blk_l = _local_attend(q, k_blk, v_blk, b_blk)
        m_new = jnp.maximum(m, blk_m)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(blk_m - m_new)
        acc = acc * alpha + blk_acc * beta
        l = l * alpha + blk_l * beta
        m = m_new

        def rotate(blks):
            return tuple(jax.lax.ppermute(x, axis_name, perm) for x in blks)

        # the final step's rotation would be discarded — skip the ICI traffic
        k_blk, v_blk, b_blk = jax.lax.cond(
            step_idx < n - 1, rotate, lambda blks: blks, (k_blk, v_blk, b_blk)
        )
        return (k_blk, v_blk, b_blk, m, l, acc), None

    # recompute each block's attention in the backward pass instead of saving
    # the (B, H, Tq/N, Tk/N) probabilities of every ring step. NOTE: scan
    # still saves every step's carry (the rotated k/v blocks), so backward
    # residuals here are n · O(T/N · d) = O(T · d) per chip — the full
    # unsharded KV, like dense attention. The flash path's custom_vjp
    # (_ring_flash_body: a second backward ring) is the one that keeps
    # residuals O(T/N · d); prefer use_flash=True for training.
    step = jax.checkpoint(step)

    b_, h_, tq, d = q.shape
    m0 = jnp.full((b_, h_, tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b_, h_, tq, 1), jnp.float32)
    acc0 = jnp.zeros((b_, h_, tq, d), jnp.float32)
    # mark the init state as device-varying over the ring axis (shard_map typing)
    m0, l0, acc0 = jax.lax.pcast((m0, l0, acc0), (axis_name,), to="varying")

    (k, v, bias, m, l, acc), _ = jax.lax.scan(
        step, (k, v, bias, m0, l0, acc0), jnp.arange(n)
    )
    out = acc / jnp.where(l == 0.0, 1.0, l)
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "tp",
    key_padding_mask: Optional[jax.Array] = None,
    use_flash: bool = False,
) -> jax.Array:
    """Sequence-sharded attention. q/k/v: (B, H, T, d) with T divisible by the
    ring size; key_padding_mask: (B, T) bool True=pad. q must be pre-scaled.
    ``use_flash`` runs each ring step's block attention through the Pallas
    flash kernel (O(block) memory, MXU-pipelined) and combines partials via
    log-sum-exp; it is fully differentiable via a second backward ring
    (custom_vjp) and keeps backward residuals O(T/N · d) per chip — the
    training configuration. The exact path (use_flash=False) differentiates
    too, but its scan saves every ring step's rotated KV carry: backward
    residuals O(T · d) per chip, like unsharded attention."""
    b, h, t, d = q.shape
    ring_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis_name)
    if ring_size is None:
        raise ValueError(f"mesh has no axis {axis_name!r}: {mesh.axis_names}")
    if t % ring_size:
        raise ValueError(
            f"ring attention: T={t} must be divisible by the {axis_name!r} "
            f"axis size {ring_size} (pad the sequence, e.g. pad_to_multiple)"
        )
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, t), jnp.float32)

    seq_spec = PS(None, None, axis_name, None)
    bias_spec = PS(None, axis_name)

    body = _ring_flash_body if use_flash else _ring_body
    fn = jax.shard_map(
        functools.partial(body, axis_name=axis_name),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, bias_spec),
        out_specs=seq_spec,
        # pallas_call outputs carry no varying-axis (vma) typing
        check_vma=not use_flash,
    )
    return fn(q, k, v, bias)
