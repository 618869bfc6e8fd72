"""Per-device memory planning for a params pytree on a mesh.

Answers "does ESM2-15B fit on this slice?" without devices: evaluates shapes
abstractly and divides each parameter by its PartitionSpec's shard factor.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from .mesh import AXES, MeshConfig
from .sharding import param_specs


def plan(params_or_shapes, mesh_cfg: MeshConfig, dtype_bytes: int = None) -> Dict:
    """Returns {"total_bytes", "per_device_bytes", "largest_param_bytes"}.

    params_or_shapes: a params pytree (arrays or ShapeDtypeStructs).
    """
    axis_sizes = dict(zip(AXES, mesh_cfg.shape))
    specs = param_specs(params_or_shapes)

    total = 0
    per_dev = 0
    largest = 0
    for leaf, spec in zip(
        jax.tree.leaves(params_or_shapes),
        jax.tree.leaves(specs, is_leaf=lambda x: hasattr(x, "index")),
    ):
        nbytes = int(np.prod(leaf.shape)) * (
            dtype_bytes or np.dtype(leaf.dtype).itemsize
        )
        shard = 1
        for axes in spec:
            if axes is None:
                continue
            for ax in (axes if isinstance(axes, tuple) else (axes,)):
                shard *= axis_sizes.get(ax, 1)
        total += nbytes
        shard_bytes = -(-nbytes // shard)  # ceil: the fullest device's share
        per_dev += shard_bytes
        largest = max(largest, shard_bytes)
    return {
        "total_bytes": total,
        "per_device_bytes": per_dev,
        "largest_param_bytes": largest,
    }


def plan_model(cfg, mesh_cfg: MeshConfig, dtype=None) -> Dict:
    """Abstract-eval an ESM-2 init and plan it (no memory allocated)."""
    import jax.numpy as jnp

    from ..models import esm2

    shapes = jax.eval_shape(
        lambda key: esm2.init(key, cfg, dtype or jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    return plan(shapes, mesh_cfg)


def _pair_shards(pair_spec, mesh_cfg: MeshConfig) -> int:
    """Shard factor the trunk's (B, I, J, C) pair tensors get from
    FoldingTrunkConfig.pair_spec on this mesh."""
    if pair_spec is None:
        return 1
    axis_sizes = dict(zip(AXES, mesh_cfg.shape))
    shards = 1
    for axes in pair_spec:
        if axes is None:
            continue
        for ax in (axes if isinstance(axes, tuple) else (axes,)):
            shards *= axis_sizes.get(ax, 1)
    return shards


# Held bytes per (i, j) pair entry of one NON-frugal ESMFold output dict:
# s_z (c_z fp32) + distogram/ptm/aligned-confidence logits (3 x bins fp32)
# + predicted_aligned_error (fp32). The frugal mode keeps only the PAE.
def _held_output_bytes_per_pair(c_z: int = 128, distogram_bins: int = 64) -> int:
    return c_z * 4 + 3 * distogram_bins * 4 + 4


def plan_fold(
    fold_cfg,
    L: int,
    mesh_cfg: MeshConfig = None,
    *,
    batch: int = 1,
    lm_dtype_bytes: int = 2,
    params_bytes: int = None,
    frugal: bool = None,
    held_outputs: int = 1,
    hbm_bytes: int = 15_750_000_000,
) -> Dict:
    """Estimate per-device HBM for an ESMFold forward at length ``L`` and
    answer "does this fit?" before trial-OOM (VERDICT r2 item 4; the
    reference's only lever here is chunking, esm/esmfold/v1/esmfold.py:354-360).

    fold_cfg: an ESMFoldConfig (uses .esm, .trunk, .distogram_bins).
    lm_dtype_bytes: 2 for bf16/fp16 LM, 4 fp32, 1 for weight-only int8 params
        (params only — LM activations are charged at max(2, lm_dtype_bytes)).
    params_bytes: total parameter bytes if already known (e.g. measured from a
        live params tree); otherwise estimated analytically from the configs.
    frugal: whether outputs use the frugal mode; None = the auto default
        (esmfold.infer's rule at this batch/L).
    held_outputs: output dicts alive at once (the fold CLI's --in-flight, or
        2 when a caller keeps the previous result while folding the next).

    Model (per device; pair tensors divided by the pair_spec shard factor):
    trunk working set = s_z_0 + recycle carry (fp32) + compute-dtype z and
    ~3 triangle-mul temporaries + recycle bins [+ the O(L^3) unchunked
    triangle-attention logits when neither chunk_size nor use_flash_tri is
    set]; LM = fp32 per-layer representation stack (+ attention-map stack
    when use_esm_attn_map); outputs per _held_output_bytes_per_pair.
    Accuracy is +/-20-30%: use the verdict, not the raw number. Calibration
    (BENCH_NOTES, one v5e chip, flash-tri bf16 trunk, 3B LM): L=1000 bf16-LM
    -> fits (measured 3.6 s/fold); L=2048 bf16-LM -> over (measured OOM);
    L=2048 int8 -> fits (measured 21.6 s); L=2048 int8 with a second
    non-frugal output held -> over (the documented re-fold OOM).
    """
    mesh_cfg = mesh_cfg or MeshConfig(1, 1, 1)
    esm_cfg, trunk_cfg = fold_cfg.esm, fold_cfg.trunk
    c_z = trunk_cfg.pairwise_state_dim
    tb = np.dtype(trunk_cfg.compute_dtype).itemsize
    shards = _pair_shards(trunk_cfg.pair_spec, mesh_cfg)
    pairs = batch * L * L // shards

    if params_bytes is None:
        # LM + trunk parameter counts, analytic (matches init_esmfold shapes
        # to ~5%: embeddings/LN/head terms included, biases folded into the
        # 10%/3% structural slack)
        d, nl = esm_cfg.embed_dim, esm_cfg.num_layers
        lm_params = nl * 12 * d * d + 2 * esm_cfg.alphabet_size * d
        c_s = trunk_cfg.sequence_state_dim
        block = (
            8 * c_z * c_z          # tri-mul in/out: 2 ops x (2 proj + gates)
            + 4 * c_z * c_z        # tri-attn start/end qkv+out at width c_z
            + 12 * c_s * c_s       # seq attention + 4x MLP
            + 2 * c_s * c_z + 2 * c_z * c_s  # seq<->pair couplings
            + 8 * c_z * c_z        # pair MLP (4x hidden)
        )
        sm = trunk_cfg.structure_module
        sm_params = sm.no_blocks * 16 * sm.c_s * sm.c_s + 4 * sm.c_s * sm.c_z
        params_bytes = (
            lm_params * lm_dtype_bytes
            + (trunk_cfg.num_blocks * block + sm_params
               + 2 * esm_cfg.embed_dim * c_s) * max(tb, 2)
        )
    per_dev_params = -(-params_bytes // max(mesh_cfg.fsdp * mesh_cfg.tp, 1))

    # LM activations: fp32 (layers+1, C) representation stack after the
    # stop_gradient cast (esmfold.py:143-150), + transient layer working set
    act_b = max(2, lm_dtype_bytes)
    lm_act = batch * (L + 2) * (esm_cfg.num_layers + 1) * esm_cfg.embed_dim * 4
    lm_act += 10 * batch * L * esm_cfg.embed_dim * act_b
    if fold_cfg.use_esm_attn_map:
        lm_act += pairs * esm_cfg.num_layers * esm_cfg.attention_heads * 4

    z32 = pairs * c_z * 4
    zc = pairs * c_z * tb
    trunk_work = 2 * z32 + 4 * zc + pairs * 4  # s_z_0 + carry + z&tri temps + bins
    if trunk_cfg.chunk_size is None and not trunk_cfg.use_flash_tri:
        # unchunked triangle attention materializes (B, I, H, J, J) logits
        trunk_work += batch * L * trunk_cfg.pair_heads * L * L // shards * 4

    if frugal is None:
        from ..models import esmfold as ef

        frugal = ef.auto_frugal(batch, L)
    out_pair_bytes = (
        4 if frugal else _held_output_bytes_per_pair(c_z, fold_cfg.distogram_bins)
    )
    sm_k = trunk_cfg.structure_module.no_blocks
    out_linear = batch * L * (37 * 4 + sm_k * 14 * 3 * 4)  # plddt + positions
    if not frugal:
        out_linear += batch * L * sm_k * (
            37 * fold_cfg.lddt_bins * 4 + trunk_cfg.structure_module.c_s * 4
        )  # lddt_head + states
    outputs = held_outputs * (pairs * out_pair_bytes + out_linear)

    total = per_dev_params + lm_act + trunk_work + outputs
    headroom = hbm_bytes - total
    verdict = (
        "fits" if headroom > 0.1 * hbm_bytes
        else ("close" if headroom > -0.05 * hbm_bytes else "over")
    )
    return {
        "per_device_bytes": int(total),
        "params_bytes": int(per_dev_params),
        "lm_bytes": int(lm_act),
        "pair_bytes": int(trunk_work),
        "output_bytes": int(outputs),
        "pair_shards": shards,
        "frugal": bool(frugal),
        "hbm_bytes": hbm_bytes,
        "verdict": verdict,
    }


def max_fold_length(
    fold_cfg, mesh_cfg: MeshConfig = None, *, include_close: bool = False, **kw
) -> int:
    """Largest L whose plan_fold verdict is "fits" (binary search).

    The default EXCLUDES "close": plan_fold's accuracy is ±20-30% and its own
    calibration contains a "close" that measured OOM (L=2048 1-chip bf16-LM,
    see plan_fold's docstring) — a cap derived from the not-"over" edge admits
    folds that die in production (and, co-batched, take innocent requests
    down with them: the failure mode the reference's OOM-skip exists for,
    scripts/fold.py:163-178). Pass ``include_close=True`` only for
    exploratory what-if estimates, never for admission caps."""
    admit = ("fits", "close") if include_close else ("fits",)
    lo, hi = 64, 16384
    if plan_fold(fold_cfg, lo, mesh_cfg, **kw)["verdict"] not in admit:
        # even the shortest length is not admitted — return 0 rather than
        # presenting lo as "the largest L that fits" (callers deriving
        # admission caps must treat 0 as "folding does not fit here")
        return 0
    while plan_fold(fold_cfg, hi, mesh_cfg, **kw)["verdict"] in admit and hi < 2**20:
        lo, hi = hi, hi * 2
    while hi - lo > 16:
        mid = (lo + hi) // 2
        if plan_fold(fold_cfg, mid, mesh_cfg, **kw)["verdict"] in admit:
            lo = mid
        else:
            hi = mid
    return lo


def plan_train(
    cfg,
    mesh_cfg: MeshConfig,
    batch: int,
    seqlen: int,
    *,
    accum_steps: int = 1,
    mu_dtype_bytes: int = 4,
    factored: bool = False,
    seq_shards: int = 1,
    hbm_bytes: int = 15_750_000_000,
) -> Dict:
    """Estimate per-device HBM for one MLM training step (AdamW, remat +
    flash attention assumed — the configuration training.train_step targets).

    Model: params(fp32) + AdamW mu/nu + grads + remat'd activations. With
    remat + flash the live activations are ~one layer body's saved matmul
    outputs times depth for the scan carry: we charge per layer the bf16
    attention/MLP GEMM outputs (qkv+out+fc1+fc2 ≈ (4·D + D + 4D) ≈ 10·D·T·B·2
    bytes) plus the fp32 logits. Accuracy is ±20-30% — use the verdict
    ("fits" / "close" = borderline either way / "over") rather than the raw
    number. Calibration against BENCH_NOTES: 650M B=4/L=1024 -> fits (ran at
    15.5 G); B=8 and B=1/L=8192 with bf16 mu -> close (both missed by ~0.3 G);
    B=8 accum=2 -> close (fits).
    """
    p = plan_model(cfg, mesh_cfg)
    per_dev_params = p["per_device_bytes"]
    if factored:
        # adafactor: row/col second-moment stats only (~params/1000), no mu —
        # the long-context single-chip configuration (650M L=8192 trains at
        # 7.1k tok/s on one chip where AdamW OOMs, BENCH_NOTES)
        opt = per_dev_params // 500
    else:
        opt = per_dev_params * (mu_dtype_bytes / 4.0) + per_dev_params  # mu + nu
    grads = per_dev_params
    micro_b = max(1, batch // accum_steps)
    accum_buf = per_dev_params if accum_steps > 1 else 0
    dp = mesh_cfg.data * mesh_cfg.fsdp
    b_local = -(-micro_b // dp)
    d = cfg.embed_dim
    # seq_shards: sequence parallelism (train_step_seq) keeps activations at
    # T/N per chip — the lever when L itself is what overflows HBM
    t_local = -(-seqlen // max(seq_shards, 1))
    acts = cfg.num_layers * (10 * d * t_local * b_local * 2)
    logits = b_local * t_local * getattr(cfg, "alphabet_size", 33) * 4
    total = per_dev_params + opt + grads + accum_buf + acts + logits
    headroom = hbm_bytes - total
    verdict = (
        "fits" if headroom > 0.1 * hbm_bytes
        else ("close" if headroom > -0.05 * hbm_bytes else "over")
    )
    return {
        "per_device_bytes": int(total),
        "params_bytes": int(per_dev_params),
        "optimizer_bytes": int(opt),
        "grads_bytes": int(grads + accum_buf),
        "activations_bytes": int(acts + logits),
        "hbm_bytes": hbm_bytes,
        "verdict": verdict,
    }


def plan_train_lora(
    cfg,
    mesh_cfg: MeshConfig,
    batch: int,
    seqlen: int,
    *,
    rank: int,
    base_dtype_bytes: int = 2,
    remat_policy: str = "dots",
    seq_shards: int = 1,
    hbm_bytes: int = 15_750_000_000,
) -> Dict:
    """Estimate per-device HBM for one LoRA step (training.train_step_lora):
    frozen base in its storage dtype (2 = bf16, 1 = weight-only int8, 4 =
    fp32) + fp32 adapters with AdamW moments + activations.

    Activation model, recalibrated round 5 against the measured single-chip
    OOM edges (BENCH_NOTES "LoRA fine-tuning"): the "dots" remat policy
    holds ~15·D·T·B·2 bytes per layer of saved matmul outputs (650M B=12
    compiled to 17.27 G => 1.31 GB/seq = 15.1·D·T·2; the older plan_train
    10·D factor under-counts the flash-training path), "full" holds only the
    per-layer scan carry (B·T·D·2) plus one layer's recompute workspace. An
    int8 base adds an L-independent backward weight-streaming transient
    (~12·D²·2·4 bytes: dequant/transpose staging of the six big per-layer
    kernels — the measured ~2.5 G that keeps 15B QLoRA off a 16 GB chip).
    Use the verdict, not the raw number (±20-30%).
    """
    import jax.numpy as jnp

    if base_dtype_bytes == 1:
        base = plan_model(cfg, mesh_cfg, dtype=jnp.bfloat16)["per_device_bytes"] // 2
    else:
        base = plan_model(cfg, mesh_cfg, dtype=jnp.bfloat16)["per_device_bytes"] * (
            base_dtype_bytes // 2
        )
    d = cfg.embed_dim
    # q/k/v/o: 4·(D·r + r·D) = 8Dr; fc1/fc2: (D·r + r·4D) + (4D·r + r·D) = 10Dr
    adapters = cfg.num_layers * 18 * d * rank * 4  # fp32
    opt = 2 * adapters  # AdamW mu + nu (fp32)
    grads = adapters
    dp = mesh_cfg.data * mesh_cfg.fsdp
    b_local = -(-batch // dp)
    t_local = -(-seqlen // max(seq_shards, 1))
    layer_body = 15 * d * t_local * b_local * 2
    if remat_policy == "full":
        acts = cfg.num_layers * (b_local * t_local * d * 2) + layer_body
    else:
        acts = cfg.num_layers * layer_body
    weight_transients = 12 * d * d * 2 * 4 if base_dtype_bytes == 1 else 0
    logits = b_local * t_local * getattr(cfg, "alphabet_size", 33) * 4
    total = base + adapters + opt + grads + acts + weight_transients + logits
    headroom = hbm_bytes - total
    verdict = (
        "fits" if headroom > 0.1 * hbm_bytes
        else ("close" if headroom > -0.05 * hbm_bytes else "over")
    )
    return {
        "per_device_bytes": int(total),
        "params_bytes": int(base),
        "adapter_bytes": int(adapters),
        "optimizer_bytes": int(opt),
        "grads_bytes": int(grads),
        "activations_bytes": int(acts + logits),
        "weight_transient_bytes": int(weight_transients),
        "hbm_bytes": hbm_bytes,
        "verdict": verdict,
    }
