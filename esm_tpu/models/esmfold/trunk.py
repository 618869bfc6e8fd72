"""ESMFold folding trunk (JAX).

Reference semantics: esm/esmfold/v1/trunk.py:110-243 — relative-position pair
embedding, 48 TriangularSelfAttentionBlocks, recycling with LN'd previous
s/z + distogram-binned previous CB coordinates, structure module per recycle.

TPU-first structure:
  * the 48 blocks are a stacked-param lax.scan (one compiled block body);
  * recycling is a lax.scan over the first (R-1) recycles carrying
    (s_s, s_z, bins) with stop_gradient (matching the reference's no_grad on
    all but the last recycle, trunk.py:193-194), then a final unrolled
    iteration that materializes the full structure output once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from ...ops.common import layer_norm, linear
from .blocks import relative_position, triangular_self_attention_block
from .structure_module import (
    StructureModuleConfig,
    structure_module_apply,
)


@dataclass(frozen=True)
class FoldingTrunkConfig:
    num_blocks: int = 48
    sequence_state_dim: int = 1024
    pairwise_state_dim: int = 128
    sequence_head_width: int = 32
    pairwise_head_width: int = 32
    position_bins: int = 32
    max_recycles: int = 4
    chunk_size: Optional[int] = None   # triangle-attention row chunking (O(L) memory)
    # Sequence-parallel pair-tensor sharding: PartitionSpec for the (B, I, J, C)
    # pair activations, e.g. PS(None, "tp") to shard rows over the tp axis.
    # Apply inside `with mesh:`; XLA inserts the all-to-alls between the
    # row-phase and column-phase triangle ops.
    pair_spec: Optional[PartitionSpec] = None
    # bf16 compute for the 48-block trunk (LN/softmax stay fp32; the structure
    # module always runs fp32 — geometry is precision-sensitive)
    compute_dtype: jnp.dtype = jnp.float32
    use_flash_tri: bool = False   # fused Pallas triangle attention (J<=1024)
    structure_module: StructureModuleConfig = field(default_factory=StructureModuleConfig)

    @property
    def seq_heads(self) -> int:
        return self.sequence_state_dim // self.sequence_head_width

    @property
    def pair_heads(self) -> int:
        return self.pairwise_state_dim // self.pairwise_head_width


RECYCLE_BINS = 15


def distogram_bins(coords: jax.Array, min_bin=3.375, max_bin=21.375, num_bins=RECYCLE_BINS):
    """Coords (..., L, 3, 3) = N/CA/C -> CB distance bin ids
    (reference trunk.py:225-243, inferred CB via cross-product chemistry)."""
    boundaries = jnp.linspace(min_bin, max_bin, num_bins - 1) ** 2
    n, ca, c = coords[..., 0, :], coords[..., 1, :], coords[..., 2, :]
    b = ca - n
    c_ = c - ca
    a = jnp.cross(b, c_)
    cb = -0.58273431 * a + 0.56802827 * b - 0.54067466 * c_ + ca
    d2 = jnp.sum(
        (cb[..., None, :, :] - cb[..., :, None, :]) ** 2, axis=-1, keepdims=True
    )
    return jnp.sum(d2 > boundaries, axis=-1)


def _constrain_pair(z, cfg: FoldingTrunkConfig):
    if cfg.pair_spec is not None:
        z = jax.lax.with_sharding_constraint(z, cfg.pair_spec)
    return z


def trunk_iter(params, cfg: FoldingTrunkConfig, s, z, residx, mask):
    s = s.astype(cfg.compute_dtype)
    z = z.astype(cfg.compute_dtype)
    z = z + relative_position(
        params["pairwise_positional_embedding"], residx, mask, bins=cfg.position_bins
    ).astype(z.dtype)
    z = _constrain_pair(z, cfg)

    def body(carry, block_params):
        s, z = carry
        s, z = triangular_self_attention_block(
            block_params,
            s,
            z,
            seq_heads=cfg.seq_heads,
            pair_heads=cfg.pair_heads,
            mask=mask,
            chunk_size=cfg.chunk_size,
            use_flash_tri=cfg.use_flash_tri,
        )
        return (s, _constrain_pair(z, cfg)), None

    if params.get("blocks") is not None:
        (s, z), _ = jax.lax.scan(body, (s, z), params["blocks"])
    return s.astype(jnp.float32), z.astype(jnp.float32)


def folding_trunk_apply(
    params,
    cfg: FoldingTrunkConfig,
    seq_feats: jax.Array,
    pair_feats: jax.Array,
    true_aa: jax.Array,
    residx: jax.Array,
    mask: jax.Array,
    no_recycles: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """s_s_0: (B, L, c_s); s_z_0: (B, L, L, c_z); residx/mask: (B, L)."""
    s_s_0, s_z_0 = seq_feats, pair_feats
    b, l = true_aa.shape

    if no_recycles is None:
        no_recycles = cfg.max_recycles
    else:
        assert no_recycles >= 0
        no_recycles += 1  # first pass is the standard forward

    def recycle_step(s_s_prev, s_z_prev, bins):
        rs = layer_norm(params["recycle_s_norm"], jax.lax.stop_gradient(s_s_prev))
        rz = layer_norm(params["recycle_z_norm"], jax.lax.stop_gradient(s_z_prev))
        rz = rz + jnp.take(params["recycle_disto"]["weight"], bins, axis=0).astype(rz.dtype)
        s_s, s_z = trunk_iter(params, cfg, s_s_0 + rs, s_z_0 + rz, residx, mask)
        sm_s = linear(params["trunk2sm_s"], s_s)
        sm_z = linear(params["trunk2sm_z"], s_z)
        structure = structure_module_apply(
            params["structure_module"],
            cfg.structure_module,
            sm_s,
            sm_z,
            true_aa,
            mask.astype(sm_s.dtype),
        )
        return s_s, s_z, structure

    s_s = jnp.zeros_like(s_s_0)
    s_z = jnp.zeros_like(s_z_0)
    bins = jnp.zeros((b, l, l), jnp.int32)

    if no_recycles > 1:

        def body(carry, _):
            s_s, s_z, bins = carry
            s_s, s_z, structure = recycle_step(s_s, s_z, bins)
            bins = distogram_bins(structure["positions"][-1][:, :, :3])
            carry = jax.lax.stop_gradient((s_s, s_z, bins))
            return carry, None

        (s_s, s_z, bins), _ = jax.lax.scan(
            body, (s_s, s_z, bins), None, length=no_recycles - 1
        )

    s_s, s_z, structure = recycle_step(s_s, s_z, bins)
    structure["s_s"] = s_s
    structure["s_z"] = s_z
    return structure
