"""Minimal dependency-free PDB reader.

The reference delegates all structure IO to biotite
(esm/inverse_folding/util.py:9-14, examples/protein-programming-language/
language/utilities.py:10-19). biotite stays an optional host-side dependency
here; this module provides a plain-python fallback good enough for the flows
that only need ATOM records of model 1: inverse-folding backbone extraction
and protein-programming-language template energies (MinimizeCRmsd/DRmsd).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from . import residue_constants as rc


@dataclass
class PDBAtoms:
    """Flat atom table for model 1 of a PDB file."""

    coord: np.ndarray      # (N, 3) float32
    atom_name: np.ndarray  # (N,) str, stripped, e.g. "CA"
    res_name: np.ndarray   # (N,) str, e.g. "LEU"
    res_id: np.ndarray     # (N,) int author residue numbers
    chain_id: np.ndarray   # (N,) str
    element: np.ndarray    # (N,) str
    hetero: np.ndarray     # (N,) bool (HETATM records)

    def __getitem__(self, mask) -> "PDBAtoms":
        return PDBAtoms(
            self.coord[mask], self.atom_name[mask], self.res_name[mask],
            self.res_id[mask], self.chain_id[mask], self.element[mask],
            self.hetero[mask],
        )

    def __len__(self) -> int:
        return self.coord.shape[0]


def read_pdb(path_or_text: str, keep_hetero: bool = False) -> PDBAtoms:
    """Parse model 1 ATOM (and optionally HETATM) records.

    Accepts a filesystem path or raw PDB text. Keeps altloc '' or 'A' only
    (biotite's default structure view). Fixed-column PDB format.
    """
    if "\n" in path_or_text:
        lines = path_or_text.splitlines()
    else:
        with open(path_or_text) as f:
            lines = f.read().splitlines()

    coords, names, resn, resi, chains, elems, het = [], [], [], [], [], [], []
    in_model = 0
    for ln in lines:
        rec = ln[:6]
        if rec.startswith("MODEL"):
            in_model += 1
            if in_model > 1:
                break
            continue
        if rec.startswith("ENDMDL"):
            break
        is_atom = rec == "ATOM  "
        is_het = rec == "HETATM"
        if not (is_atom or (keep_hetero and is_het)):
            continue
        altloc = ln[16]
        if altloc not in (" ", "A"):
            continue
        coords.append((float(ln[30:38]), float(ln[38:46]), float(ln[46:54])))
        names.append(ln[12:16].strip())
        resn.append(ln[17:20].strip())
        resi.append(int(ln[22:26]))
        chains.append(ln[21].strip())
        elems.append(ln[76:78].strip() if len(ln) >= 78 else ln[12:16].strip()[:1])
        het.append(is_het)

    return PDBAtoms(
        np.asarray(coords, np.float32).reshape(-1, 3),
        np.asarray(names, object),
        np.asarray(resn, object),
        np.asarray(resi, np.int64),
        np.asarray(chains, object),
        np.asarray(elems, object),
        np.asarray(het, bool),
    )


def backbone_coords(
    atoms: PDBAtoms, chain: Optional[str] = None
) -> Tuple[np.ndarray, str]:
    """N/CA/C coordinates per residue plus the 1-letter sequence.

    Missing backbone atoms become NaN rows (matching the reference's
    inverse-folding convention, esm/inverse_folding/util.py:96-105).
    Returns (coords (L, 3, 3) float32, sequence str).
    """
    if chain is not None:
        atoms = atoms[atoms.chain_id == chain]
    atoms = atoms[~atoms.hetero]
    three_to_one = {v: k for k, v in rc.restype_1to3().items()}

    # residues in file order, keyed by (chain, res_id)
    order = []
    seen = {}
    for i in range(len(atoms)):
        key = (atoms.chain_id[i], int(atoms.res_id[i]))
        if key not in seen:
            seen[key] = len(order)
            order.append((key, atoms.res_name[i]))

    coords = np.full((len(order), 3, 3), np.nan, np.float32)
    slot = {"N": 0, "CA": 1, "C": 2}
    for i in range(len(atoms)):
        s = slot.get(atoms.atom_name[i])
        if s is None:
            continue
        ridx = seen[(atoms.chain_id[i], int(atoms.res_id[i]))]
        if np.isnan(coords[ridx, s, 0]):
            coords[ridx, s] = atoms.coord[i]

    seq = "".join(three_to_one.get(resname, "X") for _, resname in order)
    return coords, seq
