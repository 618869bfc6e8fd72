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


def plan_train(
    cfg,
    mesh_cfg: MeshConfig,
    batch: int,
    seqlen: int,
    *,
    accum_steps: int = 1,
    mu_dtype_bytes: int = 4,
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
