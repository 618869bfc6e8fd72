"""PartitionSpec assignment for esm_tpu parameter pytrees.

Megatron-style tensor parallelism + ZeRO-style fsdp sharding, expressed purely
as shardings (XLA SPMD inserts collectives):

  * q/k/v and fc1 kernels: column-parallel — output dim over ``tp``,
    contraction dim over ``fsdp`` (gathered per layer inside the scan);
  * out_proj and fc2 kernels: row-parallel — contraction dim over ``tp``
    (partial sums psum'd by XLA), output dim over ``fsdp``;
  * token embedding: feature dim over ``tp`` (the tied LM-head projection
    contracts over features → psum over tp);
  * norms / small heads: replicated;
  * activations: batch over (data, fsdp).

Stacked per-layer kernels carry a leading (unsharded) layer axis — specs are
rank-adjusted automatically.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from .mesh import AXIS_DATA, AXIS_FSDP, AXIS_TP


COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "fc1")
ROW_PARALLEL = ("out_proj", "fc2")


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(p.key)
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
    return tuple(names)


def spec_for_param(path, leaf) -> PS:
    """PartitionSpec for one parameter, by name path + rank."""
    names = _path_names(path)
    ndim = leaf.ndim

    def padded(spec2: Tuple) -> PS:
        """Right-align a 2D (in, out) spec under any leading stacked axes."""
        return PS(*((None,) * (ndim - len(spec2)) + spec2))

    if "embed_tokens" in names:
        return PS(None, AXIS_TP)
    if "embed_positions" in names or "msa_position_embedding" in names:
        return PS()  # small, replicated

    owner = next((n for n in names if n in COLUMN_PARALLEL + ROW_PARALLEL), None)
    leaf_name = names[-1] if names else ""

    if owner in COLUMN_PARALLEL:
        if leaf_name == "kernel":
            return padded((AXIS_FSDP, AXIS_TP))
        if leaf_name in ("bias", "scale"):  # int8 per-out-channel scales
            return padded((AXIS_TP,))
    if owner in ROW_PARALLEL:
        if leaf_name == "kernel":
            return padded((AXIS_TP, AXIS_FSDP))
        if leaf_name in ("bias", "scale"):
            return padded((None,))
    if "lm_head" in names and leaf_name == "kernel":
        return padded((AXIS_FSDP, AXIS_TP))
    if "lm_head" in names and leaf_name == "bias" and "dense" in names:
        return padded((AXIS_TP,))
    # norms, contact head, scalar biases: replicate
    return PS()


def param_specs(params) -> Any:
    """Pytree of PartitionSpecs matching ``params``."""
    return jax.tree_util.tree_map_with_path(spec_for_param, params)


def param_shardings(mesh: Mesh, params) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        param_specs(params),
        is_leaf=lambda x: isinstance(x, PS),
    )


def shard_params(mesh: Mesh, params) -> Any:
    """Place a (host or single-device) param pytree onto the mesh.

    One batched device_put for the whole tree (single dispatch) rather than
    a transfer per leaf."""
    return jax.device_put(params, param_shardings(mesh, params))


def batch_spec(ndim: int = 2) -> PS:
    """Tokens / activations: batch axis over (data, fsdp)."""
    return PS(*(((AXIS_DATA, AXIS_FSDP),) + (None,) * (ndim - 1)))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(ndim))
