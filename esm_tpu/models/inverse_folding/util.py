"""Inverse-folding geometry helpers and coordinate batch conversion.

Reference semantics: esm/inverse_folding/util.py:145-323 (rotate,
get_rotation_frames via Gram-Schmidt on N/CA/C, nan_to_num, rbf, norm,
normalize, CoordBatchConverter with inf bos/eos padding and NaN batch padding).
Device math in JAX; batch conversion host-side numpy.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...data.alphabet import Alphabet, BatchConverter


def nan_to_num(ts: jax.Array, val: float = 0.0) -> jax.Array:
    return jnp.where(jnp.isfinite(ts), ts, val)


def rbf(values: jax.Array, v_min: float, v_max: float, n_bins: int = 16) -> jax.Array:
    """Radial basis encoding appended as a trailing dim."""
    centers = jnp.linspace(v_min, v_max, n_bins)
    std = (v_max - v_min) / n_bins
    z = (values[..., None] - centers) / std
    return jnp.exp(-(z ** 2))


def norm(t: jax.Array, axis, eps: float = 1e-8, keepdims: bool = False) -> jax.Array:
    return jnp.sqrt(jnp.sum(jnp.square(t), axis=axis, keepdims=keepdims) + eps)


def normalize(t: jax.Array, axis: int = -1) -> jax.Array:
    return nan_to_num(t / norm(t, axis=axis, keepdims=True))


def rotate(v: jax.Array, R: jax.Array) -> jax.Array:
    """v: (..., C, 3), R: (..., 3, 3) -> rotated vectors (v @ R per channel,
    reference util.py:145-158: sum(v[..., None] * R[..., None, :, :], -2))."""
    return jnp.sum(v[..., None] * R[..., None, :, :], axis=-2)


def get_rotation_frames(coords: jax.Array) -> jax.Array:
    """Local frames from N/CA/C via Gram-Schmidt (reference util.py:161-179).
    coords: (B, L, 3, 3); returns (B, L, 3, 3) with rows e1, e2, e3."""
    v1 = coords[:, :, 2] - coords[:, :, 1]
    v2 = coords[:, :, 0] - coords[:, :, 1]
    e1 = normalize(v1, axis=-1)
    u2 = v2 - e1 * jnp.sum(e1 * v2, axis=-1, keepdims=True)
    e2 = normalize(u2, axis=-1)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-2)


class CoordBatchConverter(BatchConverter):
    """(coords, confidence, seq) batches -> padded arrays
    (reference util.py:220-295). Coordinates get an inf bos/eos residue and
    NaN padding; padding_mask/coord_mask are derived from non-finiteness."""

    def __call__(self, raw_batch: Sequence[Tuple], device=None):
        self.alphabet.cls_idx = self.alphabet.get_idx("<cath>")
        batch = []
        for coords, confidence, seq in raw_batch:
            if confidence is None:
                confidence = 1.0
            if isinstance(confidence, (float, int)):
                confidence = [float(confidence)] * len(coords)
            if seq is None:
                seq = "X" * len(coords)
            batch.append(((coords, confidence), seq))

        coords_and_confidence, strs, tokens = super().__call__(batch)

        coords_list = [
            np.pad(
                np.asarray(cd, np.float32),
                ((1, 1), (0, 0), (0, 0)),
                constant_values=np.inf,
            )
            for cd, _ in coords_and_confidence
        ]
        conf_list = [
            np.pad(np.asarray(cf, np.float32), (1, 1), constant_values=-1.0)
            for _, cf in coords_and_confidence
        ]
        max_len = max(c.shape[0] for c in coords_list)
        coords = np.full((len(batch), max_len, 3, 3), np.nan, np.float32)
        confidence = np.full((len(batch), max_len), -1.0, np.float32)
        for i, (c, f) in enumerate(zip(coords_list, conf_list)):
            coords[i, : c.shape[0]] = c
            confidence[i, : f.shape[0]] = f

        padding_mask = np.isnan(coords[:, :, 0, 0])
        coord_mask = np.isfinite(coords.sum(axis=(-2, -1)))
        confidence = confidence * coord_mask + (-1.0) * padding_mask
        return coords, confidence, strs, tokens, padding_mask

    def from_lists(self, coords_list, confidence_list=None, seq_list=None, device=None):
        n = len(coords_list)
        if confidence_list is None:
            confidence_list = [None] * n
        if seq_list is None:
            seq_list = [None] * n
        return self(list(zip(coords_list, confidence_list, seq_list)))


def load_structure(fpath, chain=None):
    """Host-side structure IO via biotite (kept as an optional dependency like
    the reference, esm/inverse_folding/util.py:27-64; raises if absent)."""
    import biotite.structure
    from biotite.structure.io import pdb, pdbx
    from biotite.structure import filter_backbone, get_chains

    if fpath.endswith("cif"):
        with open(fpath) as fin:
            pdbxf = pdbx.PDBxFile.read(fin)
        structure = pdbx.get_structure(pdbxf, model=1)
    elif fpath.endswith("pdb"):
        with open(fpath) as fin:
            pdbf = pdb.PDBFile.read(fin)
        structure = pdb.get_structure(pdbf, model=1)
    bbmask = filter_backbone(structure)
    structure = structure[bbmask]
    all_chains = get_chains(structure)
    if len(all_chains) == 0:
        raise ValueError("No chains found in the input file.")
    if chain is None:
        chain_ids = all_chains
    elif isinstance(chain, list):
        chain_ids = chain
    else:
        chain_ids = [chain]
    for c in chain_ids:
        if c not in all_chains:
            raise ValueError(f"Chain {c} not found in input file")
    import numpy as _np

    chain_filter = _np.isin(structure.chain_id, _np.asarray(chain_ids))
    return structure[chain_filter]


def extract_coords_from_structure(structure):
    """AtomArray -> (L, 3, 3) N/CA/C coords + sequence
    (reference util.py:66-76,96-105)."""
    import numpy as _np
    from biotite.structure import get_residues
    from biotite.sequence import ProteinSequence

    coords = get_atom_coords_residuewise(["N", "CA", "C"], structure)
    residue_identities = get_residues(structure)[1]
    seq = "".join([ProteinSequence.convert_letter_3to1(r) for r in residue_identities])
    return coords, seq


def get_atom_coords_residuewise(atoms: List[str], struct):
    import numpy as _np

    def filterfn(s, axis=None):
        filters = _np.stack([s.atom_name == name for name in atoms], axis=1)
        sum_ = filters.sum(0)
        if not _np.all(sum_ <= _np.ones(filters.shape[1])):
            raise RuntimeError("structure has multiple atoms with same name")
        index = filters.argmax(0)
        coords = s[index].coord
        coords[sum_ == 0] = float("nan")
        return coords

    import biotite.structure as bs

    return bs.apply_residue_wise(struct, struct, filterfn)


def load_coords(fpath, chain):
    try:
        structure = load_structure(fpath, chain)
    except (ImportError, AttributeError):
        # biotite absent (or a partial/stub install): plain-python fallback
        # for .pdb and .cif/.mmcif files (esm_tpu.data.pdb)
        from ...data.pdb import backbone_coords, read_structure

        if isinstance(chain, list):
            atoms = read_structure(fpath)
            import numpy as _np

            atoms = atoms[_np.isin(atoms.chain_id, _np.asarray(chain, object))]
            return backbone_coords(atoms)
        return backbone_coords(read_structure(fpath), chain=chain)
    return extract_coords_from_structure(structure)
