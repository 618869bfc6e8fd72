"""ESMFold top-level model (JAX).

Reference semantics: esm/esmfold/v1/esmfold.py — frozen ESM-2 LM over
AF2-indexed tokens (bos/eos added then stripped), softmax-weighted layer
combine, s/z MLPs, folding trunk, distogram/lm/plddt/ptm heads, multimer
inference via ':'-linker encoding.

The LM runs through esm_tpu.models.esm2 (bf16-able, flash-attention path);
everything below is this package's from-scratch JAX ESMFold stack.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...data import residue_constants as rc
from ...data.alphabet import Alphabet
from ...ops.common import layer_norm, linear
from .. import esm2
from .protein import (
    atom14_to_atom37,
    categorical_lddt,
    compute_predicted_aligned_error,
    compute_tm,
    make_atom14_masks,
    output_to_pdb,
)
from .trunk import FoldingTrunkConfig, folding_trunk_apply


@dataclass(frozen=True)
class ESMFoldConfig:
    esm: esm2.ESM2Config = field(default_factory=esm2.ESM2Config)
    trunk: FoldingTrunkConfig = field(default_factory=FoldingTrunkConfig)
    lddt_head_hid_dim: int = 128
    use_esm_attn_map: bool = False
    distogram_bins: int = 64
    lddt_bins: int = 50
    # the checkpoint's LM registry name (reference esm/esmfold/v1/esmfold.py:
    # 35-47,59) — carried so io/export.save_esmfold can round-trip it
    esm_type: Optional[str] = None

    @property
    def n_tokens_embed(self) -> int:
        return rc.restype_num + 3  # 0=pad, 21=unk(X), 22=mask

    @property
    def mask_idx(self) -> int:
        return self.n_tokens_embed - 1

    @property
    def unk_idx(self) -> int:
        return self.n_tokens_embed - 2


def af2_to_esm_table(alphabet: Alphabet) -> np.ndarray:
    """AF2 restype index (shifted by 1; 0 = padding) -> ESM token id
    (reference esm/esmfold/v1/esmfold.py:106-112)."""
    return np.asarray(
        [alphabet.padding_idx]
        + [alphabet.get_idx(v) for v in rc.restypes_with_x()],
        dtype=np.int32,
    )


def _af2_idx_to_esm_idx(af2_to_esm: jax.Array, aa: jax.Array, mask: jax.Array):
    aa = jnp.where(mask == 1, aa + 1, 0)
    return af2_to_esm[aa]


def _lm_representations(
    esm_params,
    esm_cfg: esm2.ESM2Config,
    esmaa: jax.Array,
    need_attn_map: bool = False,
    ring=None,
):
    """Run the frozen LM with bos/eos handling
    (reference esm/esmfold/v1/esmfold.py:118-145). Returns
    ((B, L, layers+1, C), optional (B, L, L, layers*H) attention stack).

    ``ring=(mesh, axis_name)`` runs the LM sequence-parallel (T sharded over
    the axis, ring attention in every layer — esm2.apply_seq_sharded). The
    LM's T = L+2 (bos/eos) is padded with <pad> columns up to a multiple of
    the ring size; padded positions are key-masked everywhere and stripped
    from the returned stack, so outputs on real positions are unchanged."""
    b, l = esmaa.shape
    bosi, eosi = esm_cfg.cls_idx, esm_cfg.eos_idx
    bos = jnp.full((b, 1), bosi, esmaa.dtype)
    pad_col = jnp.full((b, 1), esm_cfg.padding_idx, esmaa.dtype)
    esmaa = jnp.concatenate([bos, esmaa, pad_col], axis=1)
    # first padding slot becomes eos. Written as an elementwise where over an
    # iota, NOT a batched scatter (.at[arange(b), eos_pos].set): when the T
    # axis is sharded (the ring path below), XLA's SPMD partitioner
    # miscompiles the batched scatter — it overwrites the last element of
    # every OTHER shard with the scatter target's old value (observed on the
    # 8-device CPU mesh; tokens at per-shard boundaries became <pad>).
    eos_pos = jnp.sum(esmaa != esm_cfg.padding_idx, axis=1)
    positions = jnp.arange(esmaa.shape[1], dtype=eos_pos.dtype)[None, :]
    esmaa = jnp.where(positions == eos_pos[:, None], eosi, esmaa)

    if ring is not None:
        if need_attn_map:
            raise ValueError(
                "use_esm_attn_map materializes T×T attention maps; it cannot "
                "run with the sequence-parallel (ring) LM"
            )
        mesh, axis_name = ring
        n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
        t = esmaa.shape[1]
        tp_pad = (-t) % n
        if tp_pad:
            esmaa = jnp.concatenate(
                [esmaa, jnp.full((b, tp_pad), esm_cfg.padding_idx, esmaa.dtype)],
                axis=1,
            )

    res = esm2.apply(
        esm_params,
        esm_cfg,
        esmaa,
        return_representations=True,
        need_head_weights=need_attn_map,
        ring=ring,
    )
    reps = res["representations"]                      # (L+1, B, T, C)
    esm_s = jnp.transpose(reps, (1, 2, 0, 3))          # (B, T, layers+1, C)
    esm_z = None
    if need_attn_map:
        # (B, Lyr, H, T, T) -> (B, Tk, Tq, Lyr*H), bos/eos stripped
        # (reference esmfold.py:140-144)
        att = res["attentions"]
        bb, nl, nh, t, _ = att.shape
        esm_z = jnp.transpose(att, (0, 4, 3, 1, 2)).reshape(bb, t, t, nl * nh)
        esm_z = esm_z[:, 1:-1, 1:-1, :]
    return esm_s[:, 1 : l + 1], esm_z                  # strip bos/eos(/ring pad)


@partial(jax.jit, static_argnames=("cfg", "num_recycles", "frugal", "ring"))
def apply(
    params,
    cfg: ESMFoldConfig,
    aa: jax.Array,
    mask: Optional[jax.Array] = None,
    residx: Optional[jax.Array] = None,
    masking_pattern: Optional[jax.Array] = None,
    num_recycles: Optional[int] = None,
    frugal: bool = False,
    ring=None,
) -> Dict[str, jax.Array]:
    """Forward pass on AF2-indexed tokens (reference esmfold.py:152-278).

    params must contain "esm" (ESM-2 params), "af2_to_esm" (lookup table) and
    the ESMFold params from io/convert_esmfold.convert_esmfold.

    ``frugal=True`` drops the O(L^2) diagnostic outputs (s_z, distogram/pTM
    logits, aligned-confidence probabilities, per-recycle states) from the
    result — XLA then frees them inside the program. ~5 GB less held HBM per
    structure at L=2048; pLDDT/pTM/PAE and coordinates are unaffected.

    ``ring=(mesh, axis_name)`` runs the LM sequence-parallel (ring attention,
    T sharded over the axis). Combine with ``cfg.trunk.pair_spec`` to shard
    the L×L pair tensors (trunk AND the distogram/pTM/PAE heads) over the
    same axis: one fold program whose per-device memory is O(L·L/N) — the
    multi-chip configuration that replaces the reference's chunking
    (esm/esmfold/v1/esmfold.py:354-360). Call under ``with mesh:`` (the
    sharding constraints resolve PartitionSpecs from the context mesh);
    :func:`apply_sharded` wraps this.
    """
    if mask is None:
        mask = jnp.ones_like(aa)
    b, l = aa.shape
    if residx is None:
        residx = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32), aa.shape)

    esmaa = _af2_idx_to_esm_idx(params["af2_to_esm"], aa, mask)
    if masking_pattern is not None:
        esmaa = jnp.where(masking_pattern == 1, cfg.esm.mask_idx, esmaa)

    esm_s, esm_z = _lm_representations(
        params["esm"], cfg.esm, esmaa, need_attn_map=cfg.use_esm_attn_map,
        ring=ring,
    )
    esm_s = jax.lax.stop_gradient(esm_s.astype(jnp.float32))

    # softmax-weighted combine over layers (esmfold.py:200)
    w = jax.nn.softmax(params["esm_s_combine"], axis=0)
    esm_s = jnp.einsum("k,blkc->blc", w, esm_s)

    h = layer_norm(params["esm_s_mlp"]["norm"], esm_s)
    h = jax.nn.relu(linear(params["esm_s_mlp"]["fc1"], h))
    s_s_0 = linear(params["esm_s_mlp"]["fc2"], h)

    if cfg.use_esm_attn_map:
        # pairwise features from the LM attention maps (esmfold.py:78-84,203-208);
        # under pair sharding the (B, L, L, Lyr*H) map tensor and its MLP run
        # on the trunk's pair shards (the v0 multi-device configuration: the
        # LM is replicated — it must materialize T×T maps — but everything
        # O(L²) downstream is sharded)
        esm_z = jax.lax.stop_gradient(esm_z.astype(jnp.float32))
        if cfg.trunk.pair_spec is not None:
            esm_z = jax.lax.with_sharding_constraint(esm_z, cfg.trunk.pair_spec)
        hz = layer_norm(params["esm_z_mlp"]["norm"], esm_z)
        hz = jax.nn.relu(linear(params["esm_z_mlp"]["fc1"], hz))
        s_z_0 = linear(params["esm_z_mlp"]["fc2"], hz)
    else:
        s_z_0 = jnp.zeros((b, l, l, cfg.trunk.pairwise_state_dim), s_s_0.dtype)

    s_s_0 = s_s_0 + jnp.take(params["embedding"]["weight"], aa, axis=0)

    structure = folding_trunk_apply(
        params["trunk"], cfg.trunk, s_s_0, s_z_0, aa, residx, mask,
        no_recycles=num_recycles,
    )

    # O(L^2) heads: keep them on the trunk's pair sharding — each device
    # computes its pair shard's head projections; the distogram symmetrize
    # is the one op XLA must insert a pair-transpose collective for
    def _constrain(z):
        if cfg.trunk.pair_spec is not None:
            z = jax.lax.with_sharding_constraint(z, cfg.trunk.pair_spec)
        return z

    disto_logits = _constrain(linear(params["distogram_head"], _constrain(structure["s_z"])))
    disto_logits = _constrain((disto_logits + jnp.swapaxes(disto_logits, 1, 2)) / 2)
    structure["distogram_logits"] = disto_logits
    structure["lm_logits"] = linear(params["lm_head"], structure["s_s"])
    structure["aatype"] = aa
    structure.update(make_atom14_masks(aa))
    for k in ["atom14_atom_exists", "atom37_atom_exists"]:
        structure[k] = structure[k] * mask[..., None]
    structure["residue_index"] = residx

    states = structure["states"]                       # (K, B, L, c_s)
    lh = layer_norm(params["lddt_head"]["norm"], states)
    lh = linear(params["lddt_head"]["fc1"], lh)
    lh = linear(params["lddt_head"]["fc2"], lh)
    lh = linear(params["lddt_head"]["fc3"], lh)
    lddt_head = lh.reshape(states.shape[0], b, l, -1, cfg.lddt_bins)
    structure["lddt_head"] = lddt_head
    plddt = categorical_lddt(lddt_head[-1], bins=cfg.lddt_bins)
    structure["plddt"] = 100 * plddt

    ptm_logits = _constrain(linear(params["ptm_head"], _constrain(structure["s_z"])))
    structure["ptm_logits"] = ptm_logits
    maskf = mask.astype(ptm_logits.dtype)
    structure["ptm"] = jax.vmap(
        lambda lg, m: compute_tm(
            lg, residue_weights=m, max_bin=31, no_bins=cfg.distogram_bins
        )
    )(ptm_logits, maskf)
    structure.update(
        compute_predicted_aligned_error(ptm_logits, max_bin=31, no_bins=cfg.distogram_bins)
    )
    if frugal:
        for k in ("s_z", "distogram_logits", "ptm_logits", "lddt_head",
                  "aligned_confidence_probs", "states"):
            structure.pop(k, None)
    return structure


def apply_sharded(
    params,
    cfg: ESMFoldConfig,
    aa: jax.Array,
    *,
    mesh,
    seq_axis: str = "tp",
    **kw,
) -> Dict[str, jax.Array]:
    """Full multi-device ESMFold: ONE jitted program with the LM
    sequence-sharded (ring attention over ``seq_axis``), the trunk's L×L pair
    tensors row-sharded via ``cfg.trunk.pair_spec``, and the distogram/pTM/PAE
    heads computed over the sharded s_z. This is the model-level realization of
    SURVEY §5.7 — sharding, not chunking, as the long-L memory strategy
    (reference: esm/esmfold/v1/esmfold.py:152-278 + set_chunk_size 354-360).

    ``cfg.trunk.pair_spec`` must shard over ``seq_axis`` (e.g.
    ``PartitionSpec(None, seq_axis)``); ``cfg.trunk.chunk_size`` composes
    with the sharding (triangle attention chunks rows WITHIN each shard —
    the long-L configuration). Budget memory with
    ``parallel.memory_plan.plan_fold(cfg, L, mesh_cfg)`` and predict the
    ICI-vs-MXU balance with ``parallel.scaling.plan_scaling_fold(cfg,
    mesh_cfg, L)`` — pair sharding is a long-L tool: at L<=1024 the
    per-block resharding can exceed the triangle compute (see
    ARCHITECTURE.md's fold scaling table)."""
    if cfg.trunk.pair_spec is None:
        raise ValueError(
            "apply_sharded needs cfg.trunk.pair_spec set (e.g. "
            f"PartitionSpec(None, {seq_axis!r})) so the trunk/pair heads "
            "shard; without it only the LM would be sequence-parallel"
        )
    # v0 semantics (use_esm_attn_map, reference esm/esmfold/v1/esmfold.py:
    # 78-84): the LM must materialize its T×T attention maps, which the ring
    # LM cannot — the LM runs REPLICATED and the O(L²) map features plus the
    # whole trunk/heads run pair-sharded (the maps dominate v0's memory, so
    # the sharding still carries the multi-device win)
    ring = None if cfg.use_esm_attn_map else (mesh, seq_axis)
    with mesh:
        return apply(params, cfg, aa, ring=ring, **kw)


# ---------------------------------------------------------------------------
# Host-side sequence encoding + inference wrappers
# ---------------------------------------------------------------------------


def encode_sequence(
    seq: str,
    residue_index_offset: Optional[int] = 512,
    chain_linker: Optional[str] = "G" * 25,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Multimer-aware AF2 encoding (reference esm/esmfold/v1/misc.py:18-58)."""
    if chain_linker is None:
        chain_linker = ""
    if residue_index_offset is None:
        residue_index_offset = 0

    chains = seq.split(":")
    seq = chain_linker.join(chains)

    unk_idx = rc.restype_order_with_x()["X"]
    encoded = np.asarray(
        [rc.restype_order_with_x().get(a, unk_idx) for a in seq], np.int32
    )
    residx = np.arange(len(encoded), dtype=np.int32)

    if residue_index_offset > 0:
        start = 0
        for i, chain in enumerate(chains):
            residx[start : start + len(chain) + len(chain_linker)] += (
                i * residue_index_offset
            )
            start += len(chain) + len(chain_linker)

    linker_mask = np.ones_like(encoded, dtype=np.float32)
    chain_index: List[int] = []
    offset = 0
    for i, chain in enumerate(chains):
        if i > 0:
            chain_index.extend([i - 1] * len(chain_linker))
        chain_index.extend([i] * len(chain))
        offset += len(chain)
        linker_mask[offset : offset + len(chain_linker)] = 0
        offset += len(chain_linker)

    return encoded, residx, linker_mask, np.asarray(chain_index, np.int32)


def batch_encode_sequences(
    sequences: Sequence[str],
    residue_index_offset: Optional[int] = 512,
    chain_linker: Optional[str] = "G" * 25,
):
    """Pad/stack encoded sequences (reference esm/esmfold/v1/misc.py:61-90)."""
    parts = [
        encode_sequence(s, residue_index_offset, chain_linker) for s in sequences
    ]
    max_len = max(p[0].shape[0] for p in parts)

    def collate(arrs, pad=0, dtype=None):
        out = np.full((len(arrs), max_len), pad, dtype or arrs[0].dtype)
        for i, a in enumerate(arrs):
            out[i, : a.shape[0]] = a
        return out

    aatype = collate([p[0] for p in parts])
    mask = collate([np.ones_like(p[0]) for p in parts])
    residx = collate([p[1] for p in parts])
    linker_mask = collate([p[2] for p in parts])
    chain_index = collate([p[3] for p in parts], pad=-1)
    return aatype, mask, residx, linker_mask, chain_index


# One compiled fold program per this many residues of padded length (the
# serving/CLI bucketing granularity — pad_to_multiple callers share it so
# the memory plan, the CLI and the server always model the same shapes)
FOLD_LENGTH_BUCKET = 64

# Auto-frugal threshold: one non-frugal output dict holds ~1284 bytes per
# (i, j) pair (s_z + distogram/ptm/aligned-confidence logits + PAE — see
# parallel/memory_plan._held_output_bytes_per_pair). Past ~1.5 GB of held
# diagnostics (~10% of a 16 GB chip) a second in-flight output starts
# deciding whether the next fold OOMs, so infer() switches to frugal there.
_AUTO_FRUGAL_HELD_BYTES = 1_500_000_000
_NON_FRUGAL_BYTES_PER_PAIR = 1284


def auto_frugal(batch: int, L: int) -> bool:
    """infer()'s default for ``frugal=None``: True when holding the full
    diagnostic outputs would cost more than ~1.5 GB HBM (B=1: L >= ~1080)."""
    return batch * L * L * _NON_FRUGAL_BYTES_PER_PAIR > _AUTO_FRUGAL_HELD_BYTES


def infer(
    params,
    cfg: ESMFoldConfig,
    sequences,
    *,
    num_recycles: Optional[int] = None,
    residue_index_offset: Optional[int] = 512,
    chain_linker: Optional[str] = "G" * 25,
    frugal: Optional[bool] = None,
    pad_to_multiple: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """Sequence(s) -> structure output (reference esmfold.py:281-339).

    ``frugal=None`` (default) resolves via :func:`auto_frugal`: at large L the
    O(L^2) diagnostic outputs are dropped automatically so back-to-back folds
    never OOM on a held previous result — pass ``frugal=False`` explicitly to
    keep s_z / distogram / pTM logits at any length (and budget for them with
    ``parallel.memory_plan.plan_fold``).

    ``pad_to_multiple`` rounds the padded length up to a bucket so varied
    inputs reuse a few compiled programs instead of recompiling per exact
    length (each fold compile is minutes at production size; the serving
    path uses 64). Padded positions carry mask=0 — the same mechanism that
    already pads shorter batch members — so outputs on real rows are
    unchanged and the PDB writer emits nothing for them."""
    if isinstance(sequences, str):
        sequences = [sequences]
    aatype, mask, residx, linker_mask, chain_index = batch_encode_sequences(
        sequences, residue_index_offset, chain_linker
    )
    if pad_to_multiple:
        L = aatype.shape[1]
        Lp = -(-L // pad_to_multiple) * pad_to_multiple
        if Lp != L:
            pad = ((0, 0), (0, Lp - L))
            aatype = np.pad(aatype, pad)
            mask = np.pad(mask, pad)
            # any in-range values do: these positions are masked everywhere
            residx = np.pad(residx, pad, mode="edge")
            linker_mask = np.pad(linker_mask, pad)
            chain_index = np.pad(chain_index, pad, constant_values=-1)
    if frugal is None:
        frugal = auto_frugal(*aatype.shape)
    output = apply(
        params,
        cfg,
        jnp.asarray(aatype),
        mask=jnp.asarray(mask),
        residx=jnp.asarray(residx),
        num_recycles=num_recycles,
        frugal=frugal,
    )
    output["atom37_atom_exists"] = output["atom37_atom_exists"] * jnp.asarray(
        linker_mask
    )[..., None]
    output["mean_plddt"] = jnp.sum(
        output["plddt"] * output["atom37_atom_exists"], axis=(1, 2)
    ) / jnp.sum(output["atom37_atom_exists"], axis=(1, 2))
    output["chain_index"] = jnp.asarray(chain_index)
    return output


def infer_pdbs(params, cfg: ESMFoldConfig, seqs: List[str], **kw) -> List[str]:
    return output_to_pdb(infer(params, cfg, seqs, **kw))


def infer_pdb(params, cfg: ESMFoldConfig, seq: str, **kw) -> str:
    return infer_pdbs(params, cfg, [seq], **kw)[0]
