"""Fused blockwise-softmax (flash) attention kernel for TPU (Pallas).

Replaces the reference's materialized B·H×T×T attention
(esm/multihead_attention.py:357-388, and the fused
F.multi_head_attention_forward fast path at :196-230) with an online-softmax
kernel that never writes the T×T matrix to HBM.

Structure (production TPU tiling):
  * grid (B·H, num_q_blocks, num_kv_blocks) — KV is a *grid* dimension so
    Pallas pipelines the HBM→VMEM block loads against compute; softmax state
    (m, l) and the unnormalized output accumulator persist in VMEM scratch
    across the sequential kv steps;
  * (B·H, q) marked "parallel" for megacore partitioning, kv "arbitrary"
    (it is the online-softmax reduction);
  * all softmax statistics fp32 (the reference forces fp32 softmax);
    q·kᵀ and p·v hit the MXU with fp32 accumulation;
  * key padding enters as an additive fp32 bias row (0 / -1e30 — large finite
    instead of -inf so fully-masked rows stay NaN-free).

The contact-prediction path needs the full attention probabilities
(esm/modules.py:338-357) and uses the exact XLA path in ops/attention.py
instead — this kernel is the no-weights fast path.

Training-grade: the kernel carries a custom_vjp (FlashAttention-2-style
backward). The differentiated forward additionally stores the per-row
log-sum-exp; the backward recomputes probabilities blockwise in two passes
(a dq pass gridded over q blocks and a dk/dv pass gridded over kv blocks,
δ = rowsum(dO⊙O) precomputed by XLA) so activations stay O(T) — the exact
path would otherwise save the (B, H, T, T) probabilities for the backward.
In-kernel rotary is handled by re-rotating q/k in the backward and pulling
dq/dk through the transposed rotation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128
# Whole-source single-pass blocks beat the online-softmax path while k/v and
# the (bq, S) fp32 score tile fit VMEM: measured +20% at S=2048 (the roofline
# decomposition in BENCH_NOTES — the m/l bookkeeping and second pass cost more
# than the bigger tile). Above this, blockwise online softmax takes over.
_SINGLE_PASS_MAX_S = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block_k(block_k: Optional[int], s: int) -> int:
    """block_k=None (the default) widens to the whole padded source while the
    single-pass path fits (S <= _SINGLE_PASS_MAX_S), else 1024 blockwise;
    an explicit block_k is honored (capped at the padded source)."""
    sp = _round_up(s, 128)
    if block_k is None:
        return sp if sp <= _SINGLE_PASS_MAX_S else 1024
    return min(block_k, sp)


def _pick_block_h(h: int, block_q: int, sp: int, d: int) -> int:
    """Heads per grid step on the single-pass path. One head's (block_q, sp)
    tile at small T is ~0.1 ms of MXU work, so per-step grid/DMA fixed costs
    dominate (T=512 measured 79% of its roofline ceiling, BENCH_NOTES) —
    batch heads of the same batch row until a step carries ~0.5 GFLOP, capped
    by ~5 MB of fp32 score tiles (VMEM headroom for Mosaic to pipeline two
    heads' tiles; the T=512 sweep measured bh=5 > bh=4 > bh=1,
    scripts_dev/tpu_t512_sweep.py). Must divide h so the per-block key bias
    is one batch row."""
    flops = 4 * block_q * sp * d
    best = 1
    for c in range(1, h + 1):
        if h % c:
            continue
        if c * block_q * sp * 4 > 5 * 1024 * 1024:
            break
        best = c
        if c * flops >= 512e6:
            break
    return best


def _pick_block_q(block_q: int, t: int) -> int:
    """Query block: prefer a lane-aligned divisor of the padded query length
    in [block_q/2, block_q] so q pads only to the 128-lane boundary — with a
    flat min(block_q, ...) choice, t=1280 padded to tp=2048 and computed 60%
    wasted query rows in every pass (t=1280 -> 640, t=1536 -> 768). Falls
    back to the requested block (and block-multiple padding) when no such
    divisor exists (e.g. t=1408 = 128·11)."""
    tq = _round_up(t, _LANES)
    if tq <= block_q:
        return tq
    for b in range(block_q, block_q // 2 - 1, -_LANES):
        if tq % b == 0:
            return b
    return block_q


def _prep_qkv(q, k, v, key_padding_mask, block_q: int, block_k: int):
    """Shared kernel prologue: flatten (B, H, ·, d) to (BH, ·, d), build the
    (B, 1, S) fp32 key bias from the padding mask, and pad query/key rows to
    block multiples (padded keys get NEG_INF bias; padded query rows produce
    garbage the callers slice off). Returns (qf, kf, vf, bias, tp, sp)."""
    b, h, t, d = q.shape
    s = k.shape[2]
    tp = _round_up(t, block_q)
    sp = _round_up(s, block_k)

    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)

    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, s), jnp.float32)
    bias = bias[:, None, :]  # (B, 1, S) — heads share it via the index map

    if tp != t:
        qf = jnp.pad(qf, ((0, 0), (0, tp - t), (0, 0)))
    if sp != s:
        kf = jnp.pad(kf, ((0, 0), (0, sp - s), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, sp - s), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, sp - s)), constant_values=NEG_INF)
    return qf, kf, vf, bias, tp, sp


def _bwd_block_k(block_k: int, s_len: int) -> int:
    """Backward-pass block_k: the forward's single-pass widening (up to
    S=2048 tiles) does NOT transfer to the backward kernels — _dq/_dkv hold
    two to three (block_q, block_k) fp32 intermediates simultaneously, so a
    2048-wide tile doubles their live VMEM past budget. Re-split to the
    largest lane-aligned divisor of the padded source <= 1024 (divisibility
    keeps the grid exact; 128 always divides s_len)."""
    if block_k <= 1024:
        return block_k
    for b in range(1024, 0, -_LANES):
        if s_len % b == 0:
            return b
    raise AssertionError(f"s_len {s_len} not lane-aligned")


def _rotated_qk(q_ref, k_ref, cos_ref, sin_ref, ki, qi=None):
    """Apply GPT-NeoX rotary to the current q/k blocks from VMEM-resident
    tables (saves the two HBM round trips of a separate rotary pass —
    reference applies rotary as its own op, esm/rotary_embedding.py:63-69).
    Positions are plain row indices; the table covers max(Tq, S) rows.
    ``ki``/``qi``: this step's kv / q block indices (qi defaults to grid
    axis 1, the forward layout). Returns (q, k, (cq, sq, ck, sk)) — the
    sliced tables, so backward kernels can reuse them for the unrotation."""
    from ..ops.rotary import rotate_half

    if qi is None:
        qi = pl.program_id(1)
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]
    q = q_ref[0]
    k = k_ref[0]
    cq = cos_ref[pl.dslice(qi * bq, bq), :]
    sq = sin_ref[pl.dslice(qi * bq, bq), :]
    ck = cos_ref[pl.dslice(ki * bk, bk), :]
    sk = sin_ref[pl.dslice(ki * bk, bk), :]
    q = q * cq + rotate_half(q) * sq
    k = k * ck + rotate_half(k) * sk
    return q, k, (cq, sq, ck, sk)


def _rot0(x):
    """rotate_half along axis 0 — the d axis of a d-major (d, X) tile."""
    half = x.shape[0] // 2
    return jnp.concatenate([-x[half:], x[:half]], axis=0)


def _rotated_qk_dmajor(q_ref, k_ref, cos_ref, sin_ref, ki, qi=None):
    """d-major twin of :func:`_rotated_qk`: (1, d, X) blocks, (d, L) tables.
    Returns (q, k, (cqT, sqT, ckT, skT))."""
    if qi is None:
        qi = pl.program_id(1)
    bq = q_ref.shape[2]
    bk = k_ref.shape[2]
    cqT = cos_ref[:, pl.dslice(qi * bq, bq)]
    sqT = sin_ref[:, pl.dslice(qi * bq, bq)]
    ckT = cos_ref[:, pl.dslice(ki * bk, bk)]
    skT = sin_ref[:, pl.dslice(ki * bk, bk)]
    q = q_ref[0] * cqT + _rot0(q_ref[0]) * sqT
    k = k_ref[0] * ckT + _rot0(k_ref[0]) * skT
    return q, k, (cqT, sqT, ckT, skT)


def _unrotate0(y, cosT, sinT):
    """d-major twin of :func:`_unrotate` (same adjoint identity, axis 0)."""
    return y * cosT - _rot0(y) * sinT


def _unrotate(x, cos, sin):
    """Transpose of the rotary map: rot(x) = cos⊙x + sin⊙rotate_half(x) is
    orthogonal, and because both halves of the cos/sin tables are equal the
    adjoint is simply cos⊙y - sin⊙rotate_half(y) (used to pull gradient
    cotangents back through the in-kernel rotation)."""
    from ..ops.rotary import rotate_half

    return x * cos - rotate_half(x) * sin


def _flash_kernel(
    *refs, use_rotary: bool, with_lse: bool = False, k_dmajor: bool = False,
):
    """One (bh, qi, ki) grid step of the blockwise online-softmax reduction.

    q_ref: (1, bq, d); k_ref/v_ref: (1, bk, d); bias_ref: (1, 1, bk);
    o_ref: (1, bq, d). Scratch: m/l (bq, LANES) fp32, acc (bq, d) fp32.
    With ``use_rotary`` the cos/sin table refs follow bias_ref and rotary is
    applied to q/k in VMEM. With ``with_lse`` a (1, bq) log-sum-exp output
    follows o_ref (the flash-backward residual).

    ``k_dmajor``: q/k/v/o and the acc scratch all travel (d, X) — the same
    lane-dense layouts as the single-pass kernel (see there; tables (d, L)).
    """
    lse_ref = None
    if use_rotary:
        q_ref, k_ref, v_ref, bias_ref, cos_ref, sin_ref, *outs = refs
    else:
        q_ref, k_ref, v_ref, bias_ref, *outs = refs
    if with_lse:
        o_ref, lse_ref, m_ref, l_ref, acc_ref = outs
    else:
        o_ref, m_ref, l_ref, acc_ref = outs
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if use_rotary:
        if k_dmajor:
            q, k, _ = _rotated_qk_dmajor(q_ref, k_ref, cos_ref, sin_ref, ki)
        else:
            q, k, _ = _rotated_qk(q_ref, k_ref, cos_ref, sin_ref, ki)
    else:
        q = q_ref[0]
        k = k_ref[0]
    v = v_ref[0]
    b = bias_ref[0, 0]                                    # (bk,)

    s = jax.lax.dot_general(
        q, k,
        (((0 if k_dmajor else 1,), (0 if k_dmajor else 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # (bq, bk) fp32
    s = s + b[None, :]

    m_prev = m_ref[:, :1]                                 # (bq, 1)
    l_prev = l_ref[:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    p = jnp.exp(s - m_next)                               # (bq, bk) fp32
    alpha = jnp.exp(m_prev - m_next)                      # (bq, 1)
    l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    if k_dmajor:
        pv = jax.lax.dot_general(
            v, p.astype(v.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # (d, bq)
        acc_ref[...] = acc_ref[...] * alpha.reshape(1, -1) + pv
    else:
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(ki == nk - 1)
    def _store():
        l_final = l_ref[:, :1]
        inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        if k_dmajor:
            o_ref[0] = (acc_ref[...] * inv.reshape(1, -1)).astype(o_ref.dtype)
        else:
            o_ref[0] = (acc_ref[...] * inv).astype(o_ref.dtype)
        if with_lse:
            lse = m_ref[:, 0] + jnp.log(jnp.maximum(l_ref[:, 0], 1e-37))
            # (1, 8, bq) block: sublane dim broadcast to satisfy the TPU
            # (8, 128) minimum tile on the stored residual
            lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def _single_pass_kernel(
    *refs, use_rotary: bool, with_lse: bool = False, block_h: int = 1,
    has_bias: bool = True, k_dmajor: bool = False,
):
    """One (bh/block_h, qi) step with the WHOLE source in VMEM: plain fused
    softmax-attention — no online-softmax state, no scratch. ~11% faster than
    the blockwise path when S fits one block (the common ESM case, S ≤ 1024).

    ``block_h`` > 1 processes several heads of the SAME batch row per grid
    step (unrolled loop): at small T a single head's (bq, S) tile is ~0.1 ms
    of MXU work and per-step grid/DMA fixed costs dominate — batching heads
    amortizes them (the T=512 roofline residual, BENCH_NOTES). ``has_bias``
    False removes the key-bias stream + add entirely (mask-free calls).

    ``k_dmajor``: Q, K, V AND the output all travel (d, X) — minor dim T/S
    fills all 128 lanes where the (X, d=64) layout half-fills every (8, 128)
    tile, on the q/o sides the GEMM operands/results are lane-dense too, and
    the p·v product is emitted (d, bq) wide instead of (bq, 64) narrow.
    Measured at the chip's full LM-GEMM rate: 98/96 TF/s marginal at
    T=512/1024 vs 30/47 classic (BENCH_NOTES "T=512 structure
    falsification"). The layouts must exist in HBM (an in-VMEM transpose
    costs what it gains), so rotary uses PRE-TRANSPOSED (d, L) tables and
    the wrapper re-lays q/k/v and un-lays the output in the same graph.
    """
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    cos_ref = sin_ref = None
    if use_rotary:
        cos_ref, sin_ref = next(it), next(it)  # (d, L) tables when k_dmajor
    outs = list(it)
    o_ref = outs[0]
    for j in range(block_h):
        if use_rotary:
            from ..ops.rotary import rotate_half

            qi = pl.program_id(1)
            if k_dmajor:
                bq = q_ref.shape[2]
                bk = k_ref.shape[2]
                cqT = cos_ref[:, pl.dslice(qi * bq, bq)]
                sqT = sin_ref[:, pl.dslice(qi * bq, bq)]
                ckT = cos_ref[:, pl.dslice(0, bk)]
                skT = sin_ref[:, pl.dslice(0, bk)]
                q = q_ref[j] * cqT + _rot0(q_ref[j]) * sqT
                k = k_ref[j] * ckT + _rot0(k_ref[j]) * skT
            else:
                bq = q_ref.shape[1]
                bk = k_ref.shape[1]
                cq = cos_ref[pl.dslice(qi * bq, bq), :]
                sq = sin_ref[pl.dslice(qi * bq, bq), :]
                ck = cos_ref[pl.dslice(0, bk), :]
                sk = sin_ref[pl.dslice(0, bk), :]
                q = q_ref[j] * cq + rotate_half(q_ref[j]) * sq
                k = k_ref[j] * ck + rotate_half(k_ref[j]) * sk
        else:
            q = q_ref[j]
            k = k_ref[j]
        v = v_ref[j]
        s = jax.lax.dot_general(
            q, k,
            (((0 if k_dmajor else 1,), (0 if k_dmajor else 1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bias:
            s = s + bias_ref[0, 0][None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if k_dmajor:
            pv = jax.lax.dot_general(
                v, p.astype(v.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, bq) — lane-dense output
            scale = jnp.where(l == 0.0, 1.0, l).reshape(1, -1)
        else:
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scale = jnp.where(l == 0.0, 1.0, l)
        o_ref[j] = (pv / scale).astype(o_ref.dtype)
        if with_lse:
            lse = m[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-37))
            outs[1][j] = jnp.broadcast_to(lse[None, :], outs[1].shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "block_q", "block_k", "interpret", "use_rotary", "with_lse",
        "block_h", "has_bias", "k_dmajor", "io_dmajor",
    ),
)
def _flash_padded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    cos: Optional[jax.Array] = None,
    sin: Optional[jax.Array] = None,
    *,
    num_heads: int,
    block_q: int,
    block_k: int,
    interpret: bool,
    use_rotary: bool = False,
    with_lse: bool = False,
    block_h: int = 1,
    has_bias: bool = True,
    k_dmajor: bool = False,
    io_dmajor: bool = False,
):
    """q: (BH, Tq, d), k/v: (BH, S, d), bias: (B, 1, S) fp32 — shared across
    the ``num_heads`` heads of each batch row via the index map (no H-fold
    replication in HBM); shapes already padded to block multiples.
    cos/sin: (max(Tq, S), d) rotary tables. With ``with_lse`` also returns
    the per-row log-sum-exp (BH, Tq) fp32 (flash-backward residual).
    ``block_h``/``has_bias`` apply to the single-pass path only;
    ``k_dmajor`` applies to both forward paths and relays q/k/v/o through
    HBM as (BH, d, X) — the transposes happen HERE, inside the jitted
    graph, and take the GEMM pair to the chip's LM-GEMM rate (BENCH_NOTES
    "T=512 structure falsification"). With ``io_dmajor`` (implies
    ``k_dmajor``) q/k/v arrive ALREADY (BH, d, X) and the output stays
    (BH, d, Tq) — no relays at all; the caller produced the layout
    upstream (e.g. straight out of the QKV projection GEMMs)."""
    if io_dmajor:
        k_dmajor = True
        bh, d, tq = q.shape
        s_len = k.shape[2]
    else:
        bh, tq, d = q.shape
        s_len = k.shape[1]
    h = num_heads

    rot_in = [cos, sin] if use_rotary else []
    table_len = cos.shape[0] if use_rotary else 0
    cost = pl.CostEstimate(
        flops=4 * bh * tq * s_len * d,
        bytes_accessed=(2 * bh * tq * d + 2 * bh * s_len * d) * q.dtype.itemsize,
        transcendentals=bh * tq * s_len,
    )
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    # 8 broadcast sublanes: (1, block_q) blocks violate the TPU (8, 128)
    # minimum tile; (1, 8, block_q) is the cheapest compliant layout
    lse_shape = jax.ShapeDtypeStruct((bh, 8, tq), jnp.float32)

    if s_len == block_k:
        bhb = block_h if (block_h > 1 and h % block_h == 0) else 1
        q_in, k_in, v_in = q, k, v
        q_spec = pl.BlockSpec((bhb, block_q, d), lambda b, i: (b, i, 0))
        k_spec = pl.BlockSpec((bhb, s_len, d), lambda b, i: (b, 0, 0))
        v_spec = pl.BlockSpec((bhb, s_len, d), lambda b, i: (b, 0, 0))
        o_spec = pl.BlockSpec((bhb, block_q, d), lambda b, i: (b, i, 0))
        o_shape = out_shape
        if k_dmajor:
            # relay Q, K, V (and emit O) as (BH, d, X) in HBM: X fills all
            # 128 lanes where (X, d=64) half-fills every (8, 128) tile, and
            # the p·v product writes (d, bq) wide — attention then runs at
            # the chip's LM-GEMM rate (96-98 TF/s vs 30-47 classic,
            # BENCH_NOTES). The transposes live in this same jitted graph —
            # unless io_dmajor, in which case the operands arrived laid out.
            if not io_dmajor:
                q_in = jnp.swapaxes(q, 1, 2)
                k_in = jnp.swapaxes(k, 1, 2)
                v_in = jnp.swapaxes(v, 1, 2)
            q_spec = pl.BlockSpec((bhb, d, block_q), lambda b, i: (b, 0, i))
            k_spec = pl.BlockSpec((bhb, d, s_len), lambda b, i: (b, 0, 0))
            v_spec = pl.BlockSpec((bhb, d, s_len), lambda b, i: (b, 0, 0))
            o_spec = pl.BlockSpec((bhb, d, block_q), lambda b, i: (b, 0, i))
            o_shape = jax.ShapeDtypeStruct((bh, d, tq), q.dtype)
            if use_rotary:
                rot_in = [jnp.swapaxes(cos, 0, 1), jnp.swapaxes(sin, 0, 1)]
        rot_specs = (
            [
                pl.BlockSpec(
                    (d, table_len) if k_dmajor else (table_len, d),
                    lambda b, i: (0, 0),
                )
            ]
            * 2
            if use_rotary
            else []
        )
        bias_specs = (
            [pl.BlockSpec((1, 1, s_len), lambda b, i: ((b * bhb) // h, 0, 0))]
            if has_bias
            else []
        )
        bias_in = [bias] if has_bias else []
        lse_spec = pl.BlockSpec((bhb, 8, block_q), lambda b, i: (b, 0, i))
        res = pl.pallas_call(
            functools.partial(
                _single_pass_kernel, use_rotary=use_rotary, with_lse=with_lse,
                block_h=bhb, has_bias=has_bias, k_dmajor=k_dmajor,
            ),
            grid=(bh // bhb, tq // block_q),
            in_specs=[
                q_spec,
                k_spec,
                v_spec,
            ]
            + bias_specs
            + rot_specs,
            out_specs=[o_spec, lse_spec] if with_lse else o_spec,
            out_shape=[o_shape, lse_shape] if with_lse else o_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
            cost_estimate=cost,
        )(q_in, k_in, v_in, *bias_in, *rot_in)
        if k_dmajor and not io_dmajor:  # back to the (BH, Tq, d) contract
            if with_lse:
                res = (jnp.swapaxes(res[0], 1, 2), res[1])
            else:
                res = jnp.swapaxes(res, 1, 2)
        return res

    grid = (bh, tq // block_q, s_len // block_k)
    q_in, k_in, v_in = q, k, v
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    v_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    o_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    o_shape = out_shape
    acc_shape = (block_q, d)
    if k_dmajor:
        # same lane-dense (d, X) relays as the single-pass path, with the
        # fp32 accumulator scratch (d, bq) so partial p·v products add in
        # their wide layout
        if not io_dmajor:
            q_in = jnp.swapaxes(q, 1, 2)
            k_in = jnp.swapaxes(k, 1, 2)
            v_in = jnp.swapaxes(v, 1, 2)
        q_spec = pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i))
        k_spec = pl.BlockSpec((1, d, block_k), lambda b, i, j: (b, 0, j))
        v_spec = pl.BlockSpec((1, d, block_k), lambda b, i, j: (b, 0, j))
        o_spec = pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i))
        o_shape = jax.ShapeDtypeStruct((bh, d, tq), q.dtype)
        acc_shape = (d, block_q)
        if use_rotary:
            rot_in = [jnp.swapaxes(cos, 0, 1), jnp.swapaxes(sin, 0, 1)]
    rot_specs = (
        [
            pl.BlockSpec(
                (d, table_len) if k_dmajor else (table_len, d),
                lambda b, i, j: (0, 0),
            )
        ]
        * 2
        if use_rotary
        else []
    )
    lse_spec = pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i))

    res = pl.pallas_call(
        functools.partial(
            _flash_kernel, use_rotary=use_rotary, with_lse=with_lse,
            k_dmajor=k_dmajor,
        ),
        grid=grid,
        in_specs=[
            q_spec,
            k_spec,
            v_spec,
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // h, 0, j)),
        ]
        + rot_specs,
        out_specs=[o_spec, lse_spec] if with_lse else o_spec,
        out_shape=[o_shape, lse_shape] if with_lse else o_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM(acc_shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=cost,
    )(q_in, k_in, v_in, bias, *rot_in)
    if k_dmajor and not io_dmajor:  # back to the (BH, Tq, d) contract
        if with_lse:
            res = (jnp.swapaxes(res[0], 1, 2), res[1])
        else:
            res = jnp.swapaxes(res, 1, 2)
    return res


def _dq_kernel(*refs, use_rotary: bool, k_dmajor: bool = False):
    """Flash backward, dq pass. Grid (bh, qi, ki): each q block accumulates
    dq = Σ_k [p ⊙ (do·vᵀ - δ)]·k over the kv steps in fp32 scratch, where
    p = exp(s - lse) is recomputed from the forward residual (never stored).
    With ``k_dmajor`` q/k/v/do and the dq output/scratch travel (d, X) —
    the same lane-dense layouts as the forward kernels.
    """
    if use_rotary:
        (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
         cos_ref, sin_ref, dq_ref, acc_ref) = refs
    else:
        (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
         dq_ref, acc_ref) = refs
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if use_rotary:
        rot = _rotated_qk_dmajor if k_dmajor else _rotated_qk
        q, kk, (cq, sq, _, _) = rot(q_ref, k_ref, cos_ref, sin_ref, ki, qi=qi)
    else:
        q = q_ref[0]
        kk = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    b = bias_ref[0, 0]

    cdim = 0 if k_dmajor else 1
    s = jax.lax.dot_general(
        q, kk, (((cdim,), (cdim,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + b[None, :]
    p = jnp.exp(s - lse_ref[0, 0][:, None])                # (bq, bk) fp32
    dov = jax.lax.dot_general(
        do, v, (((cdim,), (cdim,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dov - delta_ref[0, 0][:, None])
    if k_dmajor:
        acc_ref[...] += jax.lax.dot_general(
            kk, ds.astype(kk.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (d, bq)
    else:
        acc_ref[...] += jax.lax.dot_general(
            ds.astype(kk.dtype), kk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk - 1)
    def _store():
        dq = acc_ref[...]
        if use_rotary:
            dq = _unrotate0(dq, cq, sq) if k_dmajor else _unrotate(dq, cq, sq)
        dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(*refs, use_rotary: bool, k_dmajor: bool = False):
    """Flash backward, dk/dv pass. Grid (bh, ki, qi): each kv block
    accumulates dv = Σ_q pᵀ·do and dk = Σ_q dsᵀ·q across the q steps.
    ``k_dmajor`` as in :func:`_dq_kernel` (dk/dv emitted (d, bk))."""
    if use_rotary:
        (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
         cos_ref, sin_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    if use_rotary:
        rot = _rotated_qk_dmajor if k_dmajor else _rotated_qk
        q, kk, (_, _, ck, sk) = rot(q_ref, k_ref, cos_ref, sin_ref, ki, qi=qi)
    else:
        q = q_ref[0]
        kk = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    b = bias_ref[0, 0]

    cdim = 0 if k_dmajor else 1
    s = jax.lax.dot_general(
        q, kk, (((cdim,), (cdim,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + b[None, :]
    p = jnp.exp(s - lse_ref[0, 0][:, None])                # (bq, bk) fp32
    if k_dmajor:
        dv_acc[...] += jax.lax.dot_general(
            do, p.astype(do.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (d, bk)
    else:
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dov = jax.lax.dot_general(
        do, v, (((cdim,), (cdim,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dov - delta_ref[0, 0][:, None])
    if k_dmajor:
        dk_acc[...] += jax.lax.dot_general(
            q, ds.astype(q.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (d, bk)
    else:
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == nq - 1)
    def _store():
        dk = dk_acc[...]
        if use_rotary:
            dk = _unrotate0(dk, ck, sk) if k_dmajor else _unrotate(dk, ck, sk)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "block_q", "block_k", "interpret", "use_rotary",
        "k_dmajor", "io_dmajor",
    ),
)
def _flash_bwd_padded(
    q, k, v, bias, cos, sin, out, lse, do,
    *,
    num_heads: int,
    block_q: int,
    block_k: int,
    interpret: bool,
    use_rotary: bool,
    k_dmajor: bool = False,
    io_dmajor: bool = False,
):
    """dq/dk/dv for the padded flash core. δ = rowsum(do ⊙ out) is a cheap
    fused XLA reduction; the T×T probabilities are recomputed blockwise from
    (q, k, bias, lse) in both passes — nothing quadratic ever hits HBM.
    ``k_dmajor`` relays q/k/v/do and emits dq/dk/dv as (BH, d, X) inside this
    graph (the interface stays (BH, X, d)) — the lane-dense layouts of the
    forward, applied to the recompute GEMMs. With ``io_dmajor`` (implies
    ``k_dmajor``) q/k/v/out/do arrive (BH, d, X) and the grads are returned
    (BH, d, X) un-relayed."""
    if io_dmajor:
        k_dmajor = True
        bh, d, tq = q.shape
        s_len = k.shape[2]
        delta = jnp.sum(
            do.astype(jnp.float32) * out.astype(jnp.float32), axis=1
        )                                                  # (BH, Tq)
    else:
        bh, tq, d = q.shape
        s_len = k.shape[1]
        delta = jnp.sum(
            do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
        )                                                  # (BH, Tq)
    h = num_heads
    block_k = _bwd_block_k(block_k, s_len)
    nq = tq // block_q
    nk = s_len // block_k

    delta = jnp.broadcast_to(delta[:, None, :], lse.shape)  # 8-sublane layout

    rot_in = [cos, sin] if use_rotary else []
    table_len = cos.shape[0] if use_rotary else 0
    if k_dmajor:
        if not io_dmajor:
            q = jnp.swapaxes(q, 1, 2)
            k = jnp.swapaxes(k, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
            do = jnp.swapaxes(do, 1, 2)
        if use_rotary:
            rot_in = [jnp.swapaxes(cos, 0, 1), jnp.swapaxes(sin, 0, 1)]

    def xd_spec(block, index_map):
        """(1, block, d) classic / (1, d, block) d-major spec; the index
        map receives the block position on the X axis."""
        if k_dmajor:
            return pl.BlockSpec(
                (1, d, block), lambda b, i, j, _m=index_map: _swap_xd(_m(b, i, j))
            )
        return pl.BlockSpec((1, block, d), index_map)

    def _swap_xd(idx):
        return (idx[0], idx[2], idx[1])

    def rot_specs(index_map):
        return (
            [
                pl.BlockSpec(
                    (d, table_len) if k_dmajor else (table_len, d), index_map
                )
            ]
            * 2
            if use_rotary
            else []
        )

    cost = pl.CostEstimate(
        flops=10 * bh * tq * s_len * d,
        bytes_accessed=(5 * bh * tq * d + 4 * bh * s_len * d) * q.dtype.itemsize,
        transcendentals=2 * bh * tq * s_len,
    )

    dq_shape = (
        jax.ShapeDtypeStruct((bh, d, tq), q.dtype)
        if k_dmajor
        else jax.ShapeDtypeStruct((bh, tq, d), q.dtype)
    )
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, use_rotary=use_rotary, k_dmajor=k_dmajor),
        grid=(bh, nq, nk),
        in_specs=[
            xd_spec(block_q, lambda b, i, j: (b, i, 0)),
            xd_spec(block_k, lambda b, i, j: (b, j, 0)),
            xd_spec(block_k, lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // h, 0, j)),
            xd_spec(block_q, lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, i)),
        ]
        + rot_specs(lambda b, i, j: (0, 0)),
        out_specs=xd_spec(block_q, lambda b, i, j: (b, i, 0)),
        out_shape=dq_shape,
        scratch_shapes=[
            pltpu.VMEM((d, block_q) if k_dmajor else (block_q, d), jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=cost,
    )(q, k, v, bias, do, lse, delta, *rot_in)

    dkv_shape = (
        jax.ShapeDtypeStruct((bh, d, s_len), k.dtype)
        if k_dmajor
        else jax.ShapeDtypeStruct((bh, s_len, d), k.dtype)
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, use_rotary=use_rotary, k_dmajor=k_dmajor
        ),
        grid=(bh, nk, nq),
        in_specs=[
            xd_spec(block_q, lambda b, i, j: (b, j, 0)),
            xd_spec(block_k, lambda b, i, j: (b, i, 0)),
            xd_spec(block_k, lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // h, 0, i)),
            xd_spec(block_q, lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, 0, j)),
        ]
        + rot_specs(lambda b, i, j: (0, 0)),
        out_specs=[
            xd_spec(block_k, lambda b, i, j: (b, i, 0)),
            xd_spec(block_k, lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[dkv_shape, dkv_shape],
        scratch_shapes=[
            pltpu.VMEM((d, block_k) if k_dmajor else (block_k, d), jnp.float32),
            pltpu.VMEM((d, block_k) if k_dmajor else (block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=cost,
    )(q, k, v, bias, do, lse, delta, *rot_in)

    if k_dmajor and not io_dmajor:  # back to the (BH, X, d) contract
        dq = jnp.swapaxes(dq, 1, 2)
        dk = jnp.swapaxes(dk, 1, 2)
        dv = jnp.swapaxes(dv, 1, 2)
    return dq, dk, dv


@functools.lru_cache(maxsize=None)
def _flash_core(
    num_heads: int, block_q: int, block_k: int, interpret: bool,
    use_rotary: bool, block_h: int = 1, has_bias: bool = True,
    k_dmajor: bool = False, io_dmajor: bool = False,
):
    """custom_vjp-wrapped padded flash core for one static configuration.

    The primal path (inference) runs the plain kernel with no residuals; only
    under differentiation does the forward switch to the lse-saving variant
    and the backward run the two-pass recompute kernels — so the training
    path pays one extra (BH, T) fp32 write and the inference path nothing.
    ``block_h``/``has_bias`` shape the single-pass forward only; the backward
    kernels always stream the bias (zeros when maskless) at block_h=1.
    ``k_dmajor`` re-lays q/k/v/o (and the backward's recompute operands and
    emitted grads) as (BH, d, X) inside the respective jitted graphs — the
    core's INTERFACE, the saved residuals, and the returned grads all stay
    (BH, X, d). With ``io_dmajor`` the interface ITSELF is (BH, d, X) end to
    end — q/k/v arrive laid out from the projections, the output, residuals
    and grads stay d-major, and no relay transposes exist anywhere.
    """
    statics = dict(
        num_heads=num_heads, block_q=block_q, block_k=block_k,
        interpret=interpret, use_rotary=use_rotary,
    )

    @jax.custom_vjp
    def core(q, k, v, bias, cos, sin):
        return _flash_padded(
            q, k, v, bias, cos, sin, block_h=block_h, has_bias=has_bias,
            k_dmajor=k_dmajor, io_dmajor=io_dmajor, **statics,
        )

    def fwd(q, k, v, bias, cos, sin):
        out, lse = _flash_padded(
            q, k, v, bias, cos, sin, with_lse=True, block_h=block_h,
            has_bias=has_bias, k_dmajor=k_dmajor, io_dmajor=io_dmajor,
            **statics,
        )
        return out, (q, k, v, bias, cos, sin, out, lse)

    def bwd(res, do):
        q, k, v, bias, cos, sin, out, lse = res
        dq, dk, dv = _flash_bwd_padded(
            q, k, v, bias, cos, sin, out, lse, do, k_dmajor=k_dmajor,
            io_dmajor=io_dmajor, **statics,
        )
        dcos = None if cos is None else jnp.zeros_like(cos)
        dsin = None if sin is None else jnp.zeros_like(sin)
        return dq, dk, dv, jnp.zeros_like(bias), dcos, dsin

    core.defvjp(fwd, bwd)
    return core


def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    key_padding_mask: Optional[jax.Array] = None,
    block_q: int = 1024,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """flash_attention that ALSO returns the per-row log-sum-exp (B, H, T)
    fp32 — the residual that lets partial attention over key shards combine
    exactly (parallel/ring_attention.py's cross-chip online softmax).
    Inference-only (no custom backward on this entry point). Rows whose keys
    are all masked return lse ~ NEG_INF; callers zero them on combine."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    b, h, t, d = q.shape
    s = k.shape[2]
    block_q = _pick_block_q(block_q, t)
    block_k = _pick_block_k(block_k, s)
    qf, kf, vf, bias, tp, sp = _prep_qkv(q, k, v, key_padding_mask, block_q, block_k)

    block_h = _pick_block_h(h, block_q, sp, d) if sp == block_k else 1
    out, lse = _flash_padded(
        qf, kf, vf, bias, None, None,
        num_heads=h, block_q=block_q, block_k=block_k,
        interpret=interpret, use_rotary=False, with_lse=True, block_h=block_h,
        k_dmajor=d < 128,
    )
    return (
        out[:, :t].reshape(b, h, t, d),
        lse[:, 0, :t].reshape(b, h, t),
    )


def flash_attention_block_bwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    lse: jax.Array,
    do: jax.Array,
    *,
    key_padding_mask: Optional[jax.Array] = None,
    block_q: int = 1024,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Exact (dq, dk, dv) of attention against a KEY BLOCK (k/v may hold only
    a slice of the keys) given the GLOBAL normalized ``out`` and per-row
    ``lse`` from :func:`flash_attention_with_lse`: P_ij = exp(q_i·k_j − lse_i)
    makes per-block backwards exact partials that sum over blocks — the
    ring-attention backward primitive (each chip computes its q's
    contribution to the visiting block's dk/dv, plus its own partial dq).
    q/out/do: (B, H, Tq, d); k/v: (B, H, S, d); lse: (B, H, Tq) fp32."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    b, h, t, d = q.shape
    s = k.shape[2]
    block_q = _pick_block_q(block_q, t)
    block_k = _pick_block_k(block_k, s)
    qf, kf, vf, bias, tp, sp = _prep_qkv(q, k, v, key_padding_mask, block_q, block_k)

    outf = out.reshape(b * h, t, d)
    dof = do.reshape(b * h, t, d)
    lsef = lse.reshape(b * h, t)
    if tp != t:
        pad_rows = ((0, 0), (0, tp - t), (0, 0))
        outf = jnp.pad(outf, pad_rows)
        dof = jnp.pad(dof, pad_rows)  # zero do rows: padded-q grads vanish
        lsef = jnp.pad(lsef, ((0, 0), (0, tp - t)))

    lse8 = jnp.broadcast_to(lsef[:, None, :], (b * h, 8, tp))
    dq, dk, dv = _flash_bwd_padded(
        qf, kf, vf, bias, None, None, outf, lse8, dof,
        num_heads=h, block_q=block_q, block_k=block_k,
        interpret=interpret, use_rotary=False, k_dmajor=d < 128,
    )
    return (
        dq[:, :t].reshape(b, h, t, d),
        dk[:, :s].reshape(b, h, s, d),
        dv[:, :s].reshape(b, h, s, d),
    )


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    key_padding_mask: Optional[jax.Array] = None,
    rotary: bool = False,
    block_q: int = 1024,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention on (B, H, T, d) tensors. q must already be scaled by
    the caller. key_padding_mask: (B, S) bool, True at pads.

    ``rotary=True`` applies GPT-NeoX-style rotary embeddings to q and k INSIDE
    the kernel (tables VMEM-resident; position = row index, q/k must be
    un-rotated) — this skips the separate rotary pass's HBM round trips
    (reference applies rotary as its own op, esm/rotary_embedding.py:63-69).
    Rotary commutes with q's scalar pre-scaling.

    Returns (B, H, T, d) in q's dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    b, h, t, d = q.shape
    s = k.shape[2]
    block_q = _pick_block_q(block_q, t)
    block_k = _pick_block_k(block_k, s)
    qf, kf, vf, bias, tp, sp = _prep_qkv(q, k, v, key_padding_mask, block_q, block_k)

    cos = sin = None
    if rotary:
        from ..ops.rotary import rotary_tables

        cos, sin = rotary_tables(max(tp, sp), d, q.dtype)

    block_h = _pick_block_h(h, block_q, sp, d) if sp == block_k else 1
    # the bias stream is also what masks PADDED key rows — it can only be
    # dropped when there is no user mask AND no key padding
    has_bias = key_padding_mask is not None or sp != s
    # relay q/k/v/o d-major whenever the half-width (d < 128 lanes) layout
    # penalty applies — attention then runs at the chip's LM-GEMM rate
    # (BENCH_NOTES "T=512 structure falsification")
    k_dmajor = d < 128
    out = _flash_core(
        h, block_q, block_k, interpret, rotary, block_h, has_bias, k_dmajor
    )(qf, kf, vf, bias, cos, sin)
    return out[:, :t].reshape(b, h, t, d)


def flash_attention_dmajor(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    key_padding_mask: Optional[jax.Array] = None,
    rotary: bool = False,
    block_q: int = 1024,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """:func:`flash_attention` with a NATIVE d-major interface: q/k/v are
    (B, H, d, T) — the layout the d<128 kernels want in HBM — and the output
    is (B, H, d, Tq). No relay transposes exist on this path: the caller is
    expected to emit q/k/v d-major straight from the projection GEMMs (one
    dot_general with the width as the lhs free dimension produces (B, D, T)
    natively) and to consume the output the same way in out_proj — see
    ops/attention.py's dmajor projection path. Differentiable (the custom
    vjp's residuals and grads stay d-major)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    b, h, d, t = q.shape
    s = k.shape[3]
    block_q = _pick_block_q(block_q, t)
    block_k = _pick_block_k(block_k, s)
    tp = _round_up(t, block_q)
    sp = _round_up(s, block_k)

    qf = q.reshape(b * h, d, t)
    kf = k.reshape(b * h, d, s)
    vf = v.reshape(b * h, d, s)
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, s), jnp.float32)
    bias = bias[:, None, :]  # (B, 1, S)
    if tp != t:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, tp - t)))
    if sp != s:
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, sp - s)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, sp - s)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, sp - s)), constant_values=NEG_INF)

    cos = sin = None
    if rotary:
        from ..ops.rotary import rotary_tables

        cos, sin = rotary_tables(max(tp, sp), d, q.dtype)

    block_h = _pick_block_h(h, block_q, sp, d) if sp == block_k else 1
    has_bias = key_padding_mask is not None or sp != s
    out = _flash_core(
        h, block_q, block_k, interpret, rotary, block_h, has_bias,
        k_dmajor=True, io_dmajor=True,
    )(qf, kf, vf, bias, cos, sin)
    return out[:, :, :t].reshape(b, h, d, t)
