"""Protein output utilities: atom14/atom37 bookkeeping, confidence metrics,
and a PDB writer.

From-scratch equivalents of the openfold utilities the reference consumes
(esm/esmfold/v1/esmfold.py:23-25: make_atom14_masks, compute_tm,
compute_predicted_aligned_error; esm/esmfold/v1/misc.py:93-116:
atom14_to_atom37 + Protein/to_pdb; esm/esmfold/v1/categorical_mixture.py:
pLDDT expectation). Data tables from esm_tpu/data/residue_constants.npz.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...data import residue_constants as rc


def make_atom14_masks(aatype: jax.Array) -> Dict[str, jax.Array]:
    """Per-residue atom14/atom37 index maps and existence masks."""
    a14_to_a37 = jnp.asarray(rc.restype_atom14_to_atom37)[aatype]
    a37_to_a14 = jnp.asarray(rc.restype_atom37_to_atom14)[aatype]
    atom14_mask = jnp.asarray(rc.restype_atom14_mask)[aatype]
    atom37_mask = jnp.asarray(rc.restype_atom37_mask)[aatype]
    return {
        "residx_atom14_to_atom37": a14_to_a37,
        "residx_atom37_to_atom14": a37_to_a14,
        "atom14_atom_exists": atom14_mask,
        "atom37_atom_exists": atom37_mask,
    }


def atom14_to_atom37(atom14: jax.Array, aatype: jax.Array) -> jax.Array:
    """(..., L, 14, 3) -> (..., L, 37, 3)."""
    a37_to_a14 = jnp.asarray(rc.restype_atom37_to_atom14)[aatype]  # (..., L, 37)
    atom37 = jnp.take_along_axis(atom14, a37_to_a14[..., None], axis=-2)
    mask = jnp.asarray(rc.restype_atom37_mask)[aatype]
    return atom37 * mask[..., None]


def _bin_centers(max_bin: float, no_bins: int) -> jax.Array:
    boundaries = jnp.linspace(0.0, max_bin, no_bins - 1)
    step = boundaries[1] - boundaries[0]
    centers = boundaries + step / 2
    return jnp.concatenate([centers, (centers[-1] + step)[None]], axis=0)


def compute_tm(
    logits: jax.Array,
    residue_weights: Optional[jax.Array] = None,
    max_bin: int = 31,
    no_bins: int = 64,
    eps: float = 1e-8,
) -> jax.Array:
    """Predicted TM-score from pairwise error-bin logits (AF2 suppl. 1.9.7)."""
    if residue_weights is None:
        residue_weights = jnp.ones(logits.shape[-2], logits.dtype)
    centers = _bin_centers(max_bin, no_bins)
    # effective residue count from the weights (the reference slices the
    # logits to the true length; with 0/1 mask weights this is equivalent,
    # including the d0 computation)
    n = jnp.sum(residue_weights)
    clipped_n = jnp.maximum(n, 19)
    d0 = 1.24 * (clipped_n - 15) ** (1.0 / 3) - 1.8

    probs = jax.nn.softmax(logits, axis=-1)
    tm_per_bin = 1.0 / (1 + (centers ** 2) / (d0 ** 2))
    predicted_tm = jnp.sum(probs * tm_per_bin, axis=-1)

    normed = residue_weights / (eps + jnp.sum(residue_weights))
    per_alignment = jnp.sum(predicted_tm * normed, axis=-1)
    weighted = per_alignment * residue_weights
    # take_along_axis, not fancy indexing: with leading batch dims
    # per_alignment[..., argmax] would gather a cross-batch matrix
    best = jnp.argmax(weighted, axis=-1, keepdims=True)
    return jnp.take_along_axis(per_alignment, best, axis=-1)[..., 0]


def compute_predicted_aligned_error(
    logits: jax.Array, max_bin: int = 31, no_bins: int = 64
) -> Dict[str, jax.Array]:
    centers = _bin_centers(max_bin, no_bins)
    probs = jax.nn.softmax(logits, axis=-1)
    return {
        "aligned_confidence_probs": probs,
        "predicted_aligned_error": jnp.sum(probs * centers, axis=-1),
        "max_predicted_aligned_error": centers[-1],
    }


def categorical_lddt(logits: jax.Array, bins: int = 50) -> jax.Array:
    """Expectation of the binned pLDDT distribution
    (reference esm/esmfold/v1/categorical_mixture.py:8-43)."""
    edges = jnp.linspace(0.0, 1.0, bins + 1)
    v_bins = (edges[:-1] + edges[1:]) / 2
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(probs * v_bins, axis=-1)


# ---------------------------------------------------------------------------
# PDB output (host-side, numpy)
# ---------------------------------------------------------------------------

PDB_CHAIN_IDS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"


def to_pdb(
    aatype: np.ndarray,          # (L,)
    atom_positions: np.ndarray,  # (L, 37, 3)
    atom_mask: np.ndarray,       # (L, 37)
    residue_index: np.ndarray,   # (L,)
    b_factors: np.ndarray,       # (L,) or (L, 37)
    chain_index: Optional[np.ndarray] = None,
) -> str:
    """Minimal standards-compliant PDB writer (ATOM/TER/END records)."""
    restypes3 = [rc.restype_1to3()[r] for r in rc.restypes()] + ["UNK"]
    atom_names = rc.atom_types()

    if b_factors.ndim == 1:
        b_factors = np.tile(b_factors[:, None], (1, 37))
    if chain_index is None:
        chain_index = np.zeros_like(aatype)

    lines: List[str] = []
    atom_idx = 1
    prev_chain = None
    last_real = None  # (res3, chain, residue_index) of the last emitted row
    for i in range(aatype.shape[0]):
        if atom_mask[i].max() < 0.5:
            # fully masked residue: batch padding (chain_index -1) or the
            # multimer linker — no atoms, and it must not drive chain/TER
            # logic (a padded tail previously emitted a bogus trailing
            # 'TER ... 9' record from PDB_CHAIN_IDS[-1])
            continue
        ci = int(chain_index[i])
        res3 = restypes3[min(int(aatype[i]), 20)]
        if prev_chain is not None and ci != prev_chain:
            lines.append(
                f"TER   {atom_idx:>5}      {last_real[0]:>3} "
                f"{PDB_CHAIN_IDS[last_real[1]]}{last_real[2]:>4}"
            )
            atom_idx += 1
        prev_chain = ci
        for j, name in enumerate(atom_names):
            if atom_mask[i, j] < 0.5:
                continue
            x, y, z = atom_positions[i, j]
            elem = name[0]
            name_f = name if len(name) == 4 else f" {name:<3}"
            lines.append(
                f"ATOM  {atom_idx:>5} {name_f}{'':1}{res3:>3} "
                f"{PDB_CHAIN_IDS[ci]}{int(residue_index[i]):>4}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}{1.00:6.2f}{b_factors[i, j]:6.2f}"
                f"          {elem:>2}"
            )
            atom_idx += 1
        last_real = (res3, ci, int(residue_index[i]))
    if last_real is not None:
        lines.append(
            f"TER   {atom_idx:>5}      {last_real[0]:>3} "
            f"{PDB_CHAIN_IDS[last_real[1]]}{last_real[2]:>4}"
        )
    lines.append("END")
    lines.append("")
    return "\n".join(lines)


def output_to_pdb(output: Dict) -> List[str]:
    """Model output dict -> list of PDB strings
    (reference esm/esmfold/v1/misc.py:93-116)."""
    aatype = np.asarray(output["aatype"])
    final_pos = np.asarray(
        atom14_to_atom37(output["positions"][-1], output["aatype"])
    )
    mask = np.asarray(output["atom37_atom_exists"])
    residx = np.asarray(output["residue_index"]) + 1
    plddt = np.asarray(output["plddt"])
    chain_index = (
        np.asarray(output["chain_index"]) if "chain_index" in output else None
    )
    pdbs = []
    for i in range(aatype.shape[0]):
        pdbs.append(
            to_pdb(
                aatype[i],
                final_pos[i],
                mask[i],
                residx[i],
                plddt[i],
                chain_index[i] if chain_index is not None else None,
            )
        )
    return pdbs
