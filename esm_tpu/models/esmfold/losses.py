"""AF2-style training losses for the ESMFold stack (backbone supervision).

The reference ships ESMFold as inference-only (esm/esmfold/v1/esmfold.py);
its training recipe — the AlphaFold2 losses on top of the frozen-LM folding
trunk (Lin et al. 2023, "Evolutionary-scale prediction of atomic-level
protein structure with a language model", SM §"Training") — is reconstructed
here TPU-first: fully batched O(L²) jnp with no data-dependent control flow,
jit/grad-safe, and supervised from backbone-only ground truth (N, CA, C per
residue) — exactly what a backbone PDB/mmCIF file provides through
``esm_tpu.io.structure.read_structure``.

Components (weights per FoldLossWeights):
- backbone FAPE (AF2 Alg. 28 restricted to backbone frames/CA points,
  clamped at 10 Å, length scale 10 Å), averaged over every structure-module
  block's intermediate frames as AF2 does;
- distogram cross-entropy over the trunk head's 64 bins (2.3125–21.6875 Å,
  squared-distance binning, inferred-Cβ pseudo-beta — metrics.inferred_cb
  chemistry — with Cα for glycine);
- pLDDT-head cross-entropy: the head's Cα channel supervised with the
  *measured* per-residue Cα-lDDT of the current prediction (stop-gradient —
  the head learns to predict its own model's error, it does not pull coords);
- optional masked-LM auxiliary on the trunk's lm_head when a
  ``masking_pattern`` is supplied (the paper's sequence-denoising term).

Sidechain FAPE / torsion supervision are intentionally out of scope: they
need all-atom ground truth (atom14 coordinates + alt-conformer resolution),
which backbone-format inputs do not carry.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...data import residue_constants as rc
from ...ops import rigid as rg

CA_ATOM_IDX = 1  # N=0, CA=1, C=2 in both atom14 and atom37 orderings


@dataclass(frozen=True)
class FoldLossWeights:
    """Loss-term weights (hashable: usable as a jit static argument).

    Defaults follow the AF2 supplementary weighting restricted to the terms
    computable from backbone ground truth: FAPE carries the loss, the
    distogram term shapes the trunk's pair representation, and the small
    pLDDT weight trains the confidence head without distorting coordinates.
    """

    fape: float = 1.0
    distogram: float = 0.3
    plddt: float = 0.01
    lm: float = 0.0  # used only when a masking_pattern is passed
    fape_clamp: float = 10.0
    fape_scale: float = 10.0


def backbone_frames(n: jax.Array, ca: jax.Array, c: jax.Array) -> rg.Rigid:
    """Ground-truth backbone frames from N/CA/C coords (AF2 Alg. 21,
    rigids_from_3_points): Gram–Schmidt with the CA→C direction as e1,
    origin at CA. Shapes (..., 3) -> Rigid over (...)."""
    eps = 1e-8
    v1 = c - ca
    v2 = n - ca
    e1 = v1 / jnp.sqrt(jnp.sum(v1 * v1, -1, keepdims=True) + eps)
    u2 = v2 - e1 * jnp.sum(e1 * v2, -1, keepdims=True)
    e2 = u2 / jnp.sqrt(jnp.sum(u2 * u2, -1, keepdims=True) + eps)
    e3 = jnp.cross(e1, e2)
    rots = jnp.stack([e1, e2, e3], axis=-1)  # columns = basis vectors
    return rg.Rigid(rots, ca)


def frames_from_tensor_7(t7: jax.Array) -> rg.Rigid:
    """Structure-module frame output (..., 7) = (quat wxyz, trans) -> Rigid."""
    return rg.Rigid(rg.quat_to_rot(t7[..., :4]), t7[..., 4:])


def fape(
    pred_frames: rg.Rigid,
    true_frames: rg.Rigid,
    frames_mask: jax.Array,
    pred_pts: jax.Array,
    true_pts: jax.Array,
    pts_mask: jax.Array,
    *,
    clamp: float = 10.0,
    length_scale: float = 10.0,
    eps: float = 1e-6,
) -> jax.Array:
    """Frame-aligned point error (AF2 Alg. 28). pred_frames may carry extra
    leading dims (e.g. the K structure-module blocks) relative to
    true_frames; the result is averaged over them. frames over (..., B, L),
    points (..., B, P, 3), masks (B, L)/(B, P)."""
    exp = lambda r: rg.Rigid(r.rots[..., None, :, :], r.trans[..., None, :])
    local_pred = rg.invert_apply(exp(pred_frames), pred_pts[..., None, :, :])
    local_true = rg.invert_apply(exp(true_frames), true_pts[..., None, :, :])
    diff = local_pred - local_true  # (..., B, L, P, 3)
    d = jnp.sqrt(jnp.sum(diff * diff, -1) + eps)
    d = jnp.clip(d, 0.0, clamp) / length_scale
    w = frames_mask[..., :, None] * pts_mask[..., None, :]  # (B, L, P)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    # sum over the (B, L, P) axes only; average any leading layer dims
    per = jnp.sum(d * w, axis=(-3, -2, -1)) / denom
    return jnp.mean(per)


def pseudo_beta(aa: jax.Array, coords: jax.Array) -> jax.Array:
    """Distogram pseudo-beta from backbone coords (..., L, 3, 3): inferred
    Cβ (the AF2 cross-product chemistry, metrics.inferred_cb) for every
    residue except glycine, which uses Cα."""
    n, ca, c = coords[..., 0, :], coords[..., 1, :], coords[..., 2, :]
    b = ca - n
    cc = c - ca
    a = jnp.cross(b, cc)
    cb = -0.58273431 * a + 0.56802827 * b - 0.54067466 * cc + ca
    is_gly = (aa == rc.restypes().index("G"))[..., None]
    return jnp.where(is_gly, ca, cb)


def distogram_targets(
    pb: jax.Array,
    *,
    n_bins: int = 64,
    min_bin: float = 2.3125,
    max_bin: float = 21.6875,
) -> jax.Array:
    """Bin indices (..., L, L) int32 for pseudo-beta coords (..., L, 3) —
    AF2's squared-boundary binning (boundary k at linspace(min,max)[k]²;
    distances past max_bin land in the last bin)."""
    boundaries = jnp.linspace(min_bin, max_bin, n_bins - 1) ** 2
    diff = pb[..., :, None, :] - pb[..., None, :, :]
    d2 = jnp.sum(diff * diff, -1)
    return jnp.sum(d2[..., None] > boundaries, axis=-1).astype(jnp.int32)


def lddt_ca(
    pred_ca: jax.Array,
    true_ca: jax.Array,
    mask: jax.Array,
    *,
    cutoff: float = 15.0,
) -> jax.Array:
    """Per-residue superposition-free Cα-lDDT in [0, 1] (Mariani 2013), the
    jnp/batched counterpart of metrics.lddt(per_residue=True): coords
    (..., L, 3), mask (..., L) -> (..., L)."""
    dtrue = jnp.sqrt(
        jnp.sum((true_ca[..., :, None, :] - true_ca[..., None, :, :]) ** 2, -1) + 1e-10
    )
    dpred = jnp.sqrt(
        jnp.sum((pred_ca[..., :, None, :] - pred_ca[..., None, :, :]) ** 2, -1) + 1e-10
    )
    L = true_ca.shape[-2]
    pair = (
        (dtrue < cutoff)
        * (1.0 - jnp.eye(L, dtype=dtrue.dtype))
        * mask[..., :, None]
        * mask[..., None, :]
    )
    diff = jnp.abs(dtrue - dpred)
    kept = sum((diff < t).astype(dtrue.dtype) for t in (0.5, 1.0, 2.0, 4.0)) / 4.0
    return jnp.sum(kept * pair, -1) / jnp.maximum(jnp.sum(pair, -1), 1.0)


def fold_loss(
    structure: dict,
    cfg,
    aa: jax.Array,
    mask: jax.Array,
    coords: jax.Array,
    coord_mask: jax.Array,
    *,
    weights: FoldLossWeights = FoldLossWeights(),
    masking_pattern: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    """Total training loss from an esmfold.apply output dict.

    coords: (B, L, 3, 3) ground-truth N/CA/C in Å; coord_mask: (B, L) 1.0
    where the residue is resolved (combined with the padding mask).
    Returns (scalar loss, metrics dict incl. the measured mean Cα-lDDT)."""
    w = coord_mask * mask.astype(coords.dtype)
    true_r = backbone_frames(
        coords[..., 0, :], coords[..., 1, :], coords[..., 2, :]
    )
    pred_r = frames_from_tensor_7(structure["frames"])  # (K, B, L)
    pred_ca = structure["positions"][..., CA_ATOM_IDX, :]  # (K, B, L, 3)
    true_ca = coords[..., 1, :]

    loss_fape = fape(
        pred_r, true_r, w, pred_ca, true_ca, w,
        clamp=weights.fape_clamp, length_scale=weights.fape_scale,
    )

    pb = pseudo_beta(aa, coords)
    bins = distogram_targets(pb, n_bins=cfg.distogram_bins)
    logp = jax.nn.log_softmax(structure["distogram_logits"], -1)
    ce = -jnp.take_along_axis(logp, bins[..., None], -1)[..., 0]
    pair_w = w[..., :, None] * w[..., None, :]
    loss_disto = jnp.sum(ce * pair_w) / jnp.maximum(jnp.sum(pair_w), 1.0)

    # pLDDT head: supervise the Cα channel of the FINAL block's head with the
    # measured lDDT of the final prediction (targets are stop-gradient — the
    # confidence head must not pull on the coordinates)
    target_lddt = jax.lax.stop_gradient(lddt_ca(pred_ca[-1], true_ca, w))
    n_lbins = cfg.lddt_bins
    tbin = jnp.clip((target_lddt * n_lbins).astype(jnp.int32), 0, n_lbins - 1)
    head = structure["lddt_head"][-1][..., CA_ATOM_IDX, :]  # (B, L, bins)
    logp_l = jax.nn.log_softmax(head, -1)
    ce_l = -jnp.take_along_axis(logp_l, tbin[..., None], -1)[..., 0]
    loss_plddt = jnp.sum(ce_l * w) / jnp.maximum(jnp.sum(w), 1.0)

    loss = (
        weights.fape * loss_fape
        + weights.distogram * loss_disto
        + weights.plddt * loss_plddt
    )
    metrics = {
        "fape": loss_fape,
        "distogram_ce": loss_disto,
        "plddt_ce": loss_plddt,
        "lddt_ca": jnp.sum(target_lddt * w) / jnp.maximum(jnp.sum(w), 1.0),
    }

    if masking_pattern is not None and weights.lm != 0.0:
        logp_lm = jax.nn.log_softmax(structure["lm_logits"], -1)
        ce_lm = -jnp.take_along_axis(logp_lm, aa[..., None], -1)[..., 0]
        w_lm = (masking_pattern == 1) * mask.astype(ce_lm.dtype)
        loss_lm = jnp.sum(ce_lm * w_lm) / jnp.maximum(jnp.sum(w_lm), 1.0)
        loss = loss + weights.lm * loss_lm
        metrics["lm_ce"] = loss_lm

    metrics["loss"] = loss
    return loss, metrics
