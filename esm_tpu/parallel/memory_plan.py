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
