"""Analytic ICI-vs-MXU scaling model for mesh configuration choice.

Promotes ARCHITECTURE.md's "Collective overlap and scaling model" table to
code so the prose and the byte/FLOP accounting cannot drift (the table in the
doc is GENERATED from this module — tests/test_scaling_model.py asserts the
committed markdown equals :func:`scaling_table`'s output). The reference has
no distributed layer to model (its one parallel example is world-size-1 FSDP
CPU offload, examples/esm2_infer_fairscale_fsdp_cpu_offloading.py:27-40);
this is the planning half of the ≥90% 1→N scaling north-star that real
multi-chip hardware would measure.

Per-chip, per-ESM-2-layer accounting at batch B, length T, width d:

  MXU   dense GEMMs 24·B·T·d² plus attention 4·B·T_q·T·d FLOPs, divided by
        tp (megatron splits both heads and MLP) and by the batch split
        B_local = ceil(B / (data·fsdp)).
  ICI   tp: 2 bf16 all-reduces of the (B_local, T, d) activation per layer
        = 8·(tp−1)/tp·B_local·T·d bytes;
        fsdp: ZeRO-3 weight prefetch (fsdp−1)/fsdp·12·d²·2 bytes;
        ring (sequence parallel): the KV pair rotates all the way round,
        4·(ring−1)/ring·B_local·T·d bytes.

r = t_ici / t_mxu decides everything: with the collectives overlapped (the
data-independence structure pinned by tests/test_collective_overlap.py plus
XLA's latency-hiding scheduler), efficiency ≈ min(1, 1/r); without overlap it
degrades to 1/(1+r). Rates default to this chip's MEASURED 96 TF/s bf16
LM-GEMM rate (BENCH_NOTES) and the nominal 90 GB/s/chip ICI (2×45 GB/s v5e
links per ring direction — unmeasurable through the single-chip tunnel);
``r_nominal`` re-evaluates at the 197 TF/s datasheet MXU so a config with no
headroom on a faster part is flagged before it ships.
"""

from __future__ import annotations

import math
import warnings
from typing import Dict, List

from .mesh import MeshConfig

MXU_TFLOPS_MEASURED = 96.0  # measured bf16 LM-GEMM rate on this chip (BENCH_NOTES)
MXU_TFLOPS_NOMINAL = 197.0  # v5e datasheet peak — the no-headroom check
ICI_GBPS = 90.0  # effective/chip: 2x45 GB/s links per ring direction (nominal)


def _width(cfg) -> int:
    return cfg if isinstance(cfg, int) else cfg.embed_dim


def plan_scaling(
    cfg,
    mesh_cfg: MeshConfig,
    batch: int,
    seqlen: int,
    *,
    mode: str = "inference",
    ring: int = 1,
    mxu_tflops: float = MXU_TFLOPS_MEASURED,
    ici_gbps: float = ICI_GBPS,
) -> Dict:
    """Per-chip, per-layer MXU time, ICI bytes, r, and predicted scaling
    efficiency for an ESM-2 model on a mesh (VERDICT r3 item 5).

    cfg: an ESM2Config (uses .embed_dim) or the width ``d`` directly.
    mode: "inference" or "train" — training triples the MXU FLOPs (fwd+bwd),
        mirrors the tp all-reduces in the backward (2×), and turns each ZeRO
        gather into gather(fwd) + gather(bwd) + grad reduce-scatter (3×).
    ring: sequence-parallel shards (T is split ring-ways; the KV ring's wire
        bytes appear under "ring_bytes"). ring devices are IN ADDITION to the
        mesh_cfg axes in this accounting — pass MeshConfig(1, 1, 1) with
        ring=N for the pure seq-parallel row.

    Returns a dict with t_mxu_ms, t_ici_ms, the ICI byte breakdown,
    r / r_nominal, efficiency_overlapped = min(1, 1/r), efficiency_serial =
    1/(1+r), and ``recommendations`` — a list of human-readable warnings,
    empty when the config is predicted to clear the ≥90% north-star with
    nominal-MXU headroom.
    """
    if mode not in ("inference", "train"):
        raise ValueError(f"mode must be 'inference' or 'train', got {mode!r}")
    d = _width(cfg)
    tp, fsdp, ring = mesh_cfg.tp, mesh_cfg.fsdp, max(ring, 1)
    b_local = -(-batch // max(mesh_cfg.data * fsdp, 1))
    t_local = -(-seqlen // ring)

    flops_mult = 3.0 if mode == "train" else 1.0
    gemm_flops = 24.0 * b_local * t_local * d * d / tp
    attn_flops = 4.0 * b_local * t_local * seqlen * d / tp
    t_mxu = flops_mult * (gemm_flops + attn_flops) / (mxu_tflops * 1e12)
    t_mxu_nominal = (
        flops_mult * (gemm_flops + attn_flops) / (MXU_TFLOPS_NOMINAL * 1e12)
    )

    ar_mult = 2.0 if mode == "train" else 1.0
    gather_mult = 3.0 if mode == "train" else 1.0
    allreduce = ar_mult * 8.0 * (tp - 1) / tp * b_local * t_local * d
    weight_gather = gather_mult * (fsdp - 1) / fsdp * 12.0 * d * d * 2
    ring_bytes = 4.0 * (ring - 1) / ring * b_local * seqlen * d
    ici_bytes = allreduce + weight_gather + ring_bytes
    t_ici = ici_bytes / (ici_gbps * 1e9)

    r = t_ici / t_mxu if t_mxu > 0 else math.inf
    r_nominal = t_ici / t_mxu_nominal if t_mxu_nominal > 0 else math.inf

    if weight_gather > 0.5 * ici_bytes:
        dominant, remedy = "ZeRO weight-gather", (
            f"raise the batch to amortize the gathers (B={batch} now), or "
            "drop the fsdp axis for weight-resident int8 on fewer chips "
            "(esm_tpu.quantization; 15B fits one 16 GB chip)"
        )
    elif allreduce > 0.5 * ici_bytes:
        dominant, remedy = f"tp={tp} all-reduce", (
            f"use tp={max(tp // 2, 1)} or data-parallel replicas — this "
            "width is past its useful tensor parallelism"
        )
    else:
        dominant, remedy = "KV-ring", "use fewer, longer sequence shards"

    recs: List[str] = []
    if r >= 1.0:
        recs.append(
            f"comm-bound (r={r:.2f}): {dominant} traffic exceeds compute "
            f"even with perfect overlap — {remedy}"
        )
    elif r_nominal >= 1.0:
        recs.append(
            f"no nominal-MXU headroom (r={r:.2f} measured, {r_nominal:.2f} "
            f"at the {MXU_TFLOPS_NOMINAL:.0f} TF/s datasheet rate): the "
            f"{dominant} traffic only hides because this chip's GEMMs run "
            f"at {mxu_tflops:.0f} TF/s — on faster parts, {remedy}"
        )
    elif r > 0.9:
        recs.append(
            f"marginal (r={r:.2f}): under 10% overlap slack — any scheduler "
            "regression shows up directly in step time"
        )

    return {
        "d": d,
        "mesh": mesh_cfg.shape,
        "ring": ring,
        "batch": batch,
        "seqlen": seqlen,
        "mode": mode,
        "t_mxu_ms": t_mxu * 1e3,
        "t_ici_ms": t_ici * 1e3,
        "allreduce_bytes": int(allreduce),
        "weight_gather_bytes": int(weight_gather),
        "ring_bytes": int(ring_bytes),
        "ici_bytes": int(ici_bytes),
        "r": r,
        "r_nominal": r_nominal,
        "efficiency_overlapped": min(1.0, 1.0 / r) if r > 0 else 1.0,
        "efficiency_serial": 1.0 / (1.0 + r),
        "recommendations": recs,
    }


def plan_scaling_fold(
    fcfg,
    mesh_cfg: MeshConfig,
    seqlen: int,
    batch: int = 1,
    *,
    num_recycles=None,
    mxu_tflops: float = MXU_TFLOPS_MEASURED,
    ici_gbps: float = ICI_GBPS,
) -> Dict:
    """Scaling model for the COMPOSED sharded fold (esmfold.apply_sharded:
    ring-sharded LM + pair-sharded trunk + sharded O(L²) heads) — the fold
    counterpart of :func:`plan_scaling` (VERDICT r4 item 7; plan_fold models
    its memory, this models its time).

    ``fcfg``: an ESMFoldConfig (reads .trunk.{num_blocks, pairwise_state_dim,
    sequence_state_dim, max_recycles, compute_dtype} and .esm.{embed_dim,
    num_layers}). Pair rows are sharded tp-ways (the axis apply_sharded
    uses); fsdp/data axes do not help a single fold (batch=1 dominant case).

    Per-chip accounting per trunk block, L rows sharded over tp:

      MXU   the O(L³) triangle terms (two tri-muls 4·L³·c_z + two tri
            attentions 8·L³·c_z FLOPs) and the O(L²) pair projections/MLP
            (aggregate 44·L²·c_z²), divided by tp; the sequence track
            (~24·L·c_s²) is replicated, not divided.
      ICI   the row↔col orientation changes the pair tensor forces:
            * tri_mul_out/in each all-gather the opposite orientation of one
              projected (L², 128) operand: (tp−1)/tp · B·L²·128·bytes each;
            * tri_att_end needs a col-major view in and row-major out: two
              all-to-alls at (tp−1)/tp² · B·L²·c_z·bytes (send side) each.
            Per recycle the whole block stack repeats; the final symmetrize
            in the distogram head (z + zᵀ, esmfold.py) is one more
            all-to-all, once. The LM contributes its ring-attention bytes
            (:func:`plan_scaling` with ring=tp) per LM layer.

    Returns t_mxu_ms / t_ici_ms / r / efficiencies for the WHOLE program
    (passes × blocks + LM), plus the per-component byte breakdown."""
    tcfg = fcfg.trunk
    c_z = tcfg.pairwise_state_dim
    c_s = tcfg.sequence_state_dim
    n_blocks = tcfg.num_blocks
    passes = tcfg.max_recycles if num_recycles is None else num_recycles + 1
    # jnp.bfloat16 the class strs as "<class 'jax.numpy.bfloat16'>" — match
    # the substring, not an exact name
    zbytes = 2 if "bfloat16" in str(getattr(tcfg, "compute_dtype", "float32")) else 4
    tp = mesh_cfg.tp
    b, l = batch, seqlen
    # tri-mul projection width: the trunk projects c_z -> c_z
    # (models/esmfold/init.py tri_mul linears), so the gathered operand is
    # c_z wide at ANY trunk width — not the reference's particular 128
    c_hidden = c_z

    # --- trunk block: MXU
    flops_tri = 12.0 * b * l**3 * c_z / tp
    flops_pair = 44.0 * b * l**2 * c_z**2 / tp
    flops_seq = 24.0 * b * l * c_s**2  # replicated sequence track
    t_mxu_block = (flops_tri + flops_pair + flops_seq) / (mxu_tflops * 1e12)
    t_mxu_block_nominal = (flops_tri + flops_pair + flops_seq) / (
        MXU_TFLOPS_NOMINAL * 1e12
    )

    # --- trunk block: ICI
    gather_bytes = 2.0 * (tp - 1) / tp * b * l * l * c_hidden * zbytes
    a2a_bytes = 2.0 * (tp - 1) / tp**2 * b * l * l * c_z * zbytes
    block_ici = gather_bytes + a2a_bytes

    # --- heads: the distogram symmetrize transpose (fp32 logits path), once
    head_a2a = (tp - 1) / tp**2 * b * l * l * c_z * 4.0

    # --- LM: ring-attention bytes + its own MXU time, per LM layer
    lm = plan_scaling(
        fcfg.esm.embed_dim, MeshConfig(1, 1, 1), batch, seqlen,
        ring=tp, mxu_tflops=mxu_tflops, ici_gbps=ici_gbps,
    )
    n_lm = fcfg.esm.num_layers

    t_mxu = passes * n_blocks * t_mxu_block + n_lm * lm["t_mxu_ms"] / 1e3
    t_mxu_nominal = passes * n_blocks * t_mxu_block_nominal + n_lm * lm[
        "t_mxu_ms"
    ] / 1e3 * (mxu_tflops / MXU_TFLOPS_NOMINAL)
    ici_bytes = passes * n_blocks * block_ici + head_a2a + n_lm * lm["ring_bytes"]
    t_ici = ici_bytes / (ici_gbps * 1e9)

    r = t_ici / t_mxu if t_mxu > 0 else math.inf
    r_nominal = t_ici / t_mxu_nominal if t_mxu_nominal > 0 else math.inf
    recs: List[str] = []
    if r >= 1.0:
        recs.append(
            f"comm-bound fold (r={r:.2f}): the pair-tensor resharding "
            f"exceeds the trunk's compute even with perfect overlap — use "
            f"fewer pair shards (tp={max(tp // 2, 1)}) or a longer L"
        )
    elif r_nominal >= 1.0:
        recs.append(
            f"no nominal-MXU headroom for the fold (r={r:.2f} measured, "
            f"{r_nominal:.2f} at {MXU_TFLOPS_NOMINAL:.0f} TF/s)"
        )
    elif r > 0.9:
        recs.append(f"marginal fold overlap (r={r:.2f})")

    return {
        "mesh": mesh_cfg.shape,
        "seqlen": seqlen,
        "batch": batch,
        "passes": passes,
        "n_blocks": n_blocks,
        "t_mxu_ms": t_mxu * 1e3,
        "t_ici_ms": t_ici * 1e3,
        "block_gather_bytes": int(gather_bytes),
        "block_a2a_bytes": int(a2a_bytes),
        "head_a2a_bytes": int(head_a2a),
        "lm_ring_bytes": int(n_lm * lm["ring_bytes"]),
        "ici_bytes": int(ici_bytes),
        "r": r,
        "r_nominal": r_nominal,
        "efficiency_overlapped": min(1.0, 1.0 / r) if r > 0 else 1.0,
        "efficiency_serial": 1.0 / (1.0 + r),
        "recommendations": recs,
    }


# The five configurations ARCHITECTURE.md's table documents. label -> kwargs.
DOC_ROWS = (
    ("650M (d=1280) B=8 T=1024, tp=4", dict(cfg=1280, mesh_cfg=MeshConfig(1, 1, 4), batch=8, seqlen=1024)),
    ("3B (d=2560) B=8 T=1024, tp=4", dict(cfg=2560, mesh_cfg=MeshConfig(1, 1, 4), batch=8, seqlen=1024)),
    ("15B (d=5120) B=8 T=1024, fsdp=4×tp=2", dict(cfg=5120, mesh_cfg=MeshConfig(1, 4, 2), batch=8, seqlen=1024)),
    ("15B B=1 T=1024, fsdp=4×tp=2", dict(cfg=5120, mesh_cfg=MeshConfig(1, 4, 2), batch=1, seqlen=1024)),
    ("650M seq-parallel B=1 T=8192, ring N=4", dict(cfg=1280, mesh_cfg=MeshConfig(1, 1, 1), batch=1, seqlen=8192, ring=4)),
)


def _fmt_bytes(row: Dict) -> str:
    mb = lambda b: f"{b / 2**20:.0f} MB"  # noqa: E731
    parts = []
    if row["allreduce_bytes"]:
        parts.append(f"{mb(row['allreduce_bytes'])} AR")
    if row["weight_gather_bytes"]:
        parts.append(f"{mb(row['weight_gather_bytes'])} weights")
    if row["ring_bytes"]:
        parts.append(f"{mb(row['ring_bytes'])} KV ring")
    return " + ".join(parts) if parts else "0"


def scaling_table(rows=DOC_ROWS) -> str:
    """The markdown table ARCHITECTURE.md embeds, generated from the model.

    tests/test_scaling_model.py pins committed-doc == this output; regenerate
    with ``python -m esm_tpu.parallel.scaling`` after changing the model."""
    lines = [
        "| config | t_mxu/chip/layer | ICI bytes/chip/layer | t_ici | r | eff. |",
        "|---|---|---|---|---|---|",
    ]
    for label, kw in rows:
        p = plan_scaling(**kw)
        lines.append(
            f"| {label} | {p['t_mxu_ms']:.2f} ms | {_fmt_bytes(p)} "
            f"| {p['t_ici_ms']:.2f} ms | {p['r']:.2f} "
            f"| {p['efficiency_overlapped'] * 100:.0f}% |"
        )
    return "\n".join(lines)


def _fold_dims(lm_width: int, lm_layers: int, n_blocks: int = 48,
               c_z: int = 128, c_s: int = 1024) -> object:
    """Duck-typed ESMFoldConfig for table rows (avoids importing the model
    package here): the reference trunk shape (trunk.py:35-51), bf16 compute."""
    from types import SimpleNamespace as NS

    return NS(
        trunk=NS(num_blocks=n_blocks, pairwise_state_dim=c_z,
                 sequence_state_dim=c_s, max_recycles=4,
                 compute_dtype="bfloat16"),
        esm=NS(embed_dim=lm_width, num_layers=lm_layers),
    )


# Composed-fold configurations ARCHITECTURE.md documents. label -> args.
FOLD_DOC_ROWS = (
    ("esmfold_v1 (3B LM, 48 blk) L=1024, pair tp=4, 4 passes",
     dict(fcfg=_fold_dims(2560, 36), mesh_cfg=MeshConfig(1, 1, 4), seqlen=1024)),
    ("650M-LM 48-blk L=2048, pair tp=4, 4 passes",
     dict(fcfg=_fold_dims(1280, 33), mesh_cfg=MeshConfig(1, 1, 4), seqlen=2048)),
    ("650M-LM 48-blk L=512, pair tp=8, 4 passes",
     dict(fcfg=_fold_dims(1280, 33), mesh_cfg=MeshConfig(1, 1, 8), seqlen=512)),
)


def fold_scaling_table(rows=FOLD_DOC_ROWS) -> str:
    """The composed-fold markdown table ARCHITECTURE.md embeds (generated;
    drift-pinned by tests/test_scaling_model.py)."""
    lines = [
        "| fold config | t_mxu | t_ici | reshard GB (gather/a2a/LM ring) | r | eff. |",
        "|---|---|---|---|---|---|",
    ]
    for label, kw in rows:
        p = plan_scaling_fold(**kw)
        gb = lambda b: f"{b / 1e9:.2f}"  # noqa: E731
        n_passes = p["passes"]
        lines.append(
            f"| {label} | {p['t_mxu_ms'] / 1e3:.2f} s | {p['t_ici_ms'] / 1e3:.2f} s "
            f"| {gb(n_passes * p['n_blocks'] * p['block_gather_bytes'])} / "
            f"{gb(n_passes * p['n_blocks'] * p['block_a2a_bytes'] + p['head_a2a_bytes'])} / "
            f"{gb(p['lm_ring_bytes'])} "
            f"| {p['r']:.2f} | {p['efficiency_overlapped'] * 100:.0f}% |"
        )
    return "\n".join(lines)


def warn_if_inefficient(
    cfg, mesh_cfg: MeshConfig, batch: int, seqlen: int, **kw
) -> Dict:
    """plan_scaling + a ``warnings.warn`` per recommendation — call this where
    a mesh is chosen for real work (examples/esm2_infer_sharded.py, esm-serve)
    so the documented-bad configs cannot be picked silently."""
    p = plan_scaling(cfg, mesh_cfg, batch, seqlen, **kw)
    for rec in p["recommendations"]:
        warnings.warn(f"mesh {mesh_cfg.shape}: {rec}", stacklevel=2)
    return p


if __name__ == "__main__":
    print(scaling_table())
    print()
    print(fold_scaling_table())
