"""Folding callbacks: sequence -> structure + confidence for energy terms.

Reference semantics: examples/protein-programming-language/language/
folding_callbacks.py — FoldingResult(ptm, plddt, atoms) from ESMFold.

TPU adaptation: sequences are padded to a length bucket (multiple of 16) so
XLA reuses one compiled fold per bucket across annealer steps with varying
lengths (the reference re-runs eagerly).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class AtomView:
    """Flat atom table (the subset of biotite's AtomArray the energies use)."""

    coord: np.ndarray      # (N, 3)
    atom_name: np.ndarray  # (N,) e.g. "CA"
    res_name: np.ndarray   # (N,) e.g. "LEU"
    res_id: np.ndarray     # (N,) residue indices (1-based, program numbering)
    element: np.ndarray    # (N,) e.g. "C"

    def __getitem__(self, mask) -> "AtomView":
        return AtomView(
            self.coord[mask],
            self.atom_name[mask],
            self.res_name[mask],
            self.res_id[mask],
            self.element[mask],
        )

    def __len__(self):
        return self.coord.shape[0]


@dataclass
class FoldingResult:
    ptm: float
    plddt: float
    atoms: AtomView
    residue_indices: np.ndarray


class FoldingCallback(ABC):
    @abstractmethod
    def fold(self, sequence: str, residue_indices: List[int]) -> FoldingResult: ...


def _round_up(n, m):
    return ((n + m - 1) // m) * m


class ESMFoldCallback(FoldingCallback):
    """Folds with esm_tpu's ESMFold (reference folding_callbacks.py:43-78)."""

    def __init__(self, params, cfg, num_recycles: Optional[int] = 1, bucket: int = 16):
        self.params = params
        self.cfg = cfg
        self.num_recycles = num_recycles
        self.bucket = bucket

    def fold(self, sequence: str, residue_indices: List[int]) -> FoldingResult:
        import jax.numpy as jnp

        from ...data import residue_constants as rc
        from ...models import esmfold as ef

        L = len(sequence)
        padded = _round_up(L, self.bucket)
        aatype, mask, _residx, _, _ = ef.batch_encode_sequences(
            [sequence], residue_index_offset=None, chain_linker=""
        )
        pad = padded - aatype.shape[1]
        if pad:
            aatype = np.pad(aatype, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        residx = np.zeros((1, padded), np.int32)
        residx[0, :L] = np.asarray(residue_indices, np.int32)

        out = ef.apply(
            self.params,
            self.cfg,
            jnp.asarray(aatype),
            mask=jnp.asarray(mask),
            residx=jnp.asarray(residx),
            num_recycles=self.num_recycles,
        )
        from ...models.esmfold.protein import atom14_to_atom37

        pos37 = np.asarray(atom14_to_atom37(out["positions"][-1], out["aatype"]))[0, :L]
        mask37 = np.asarray(out["atom37_atom_exists"])[0, :L]
        plddt37 = np.asarray(out["plddt"])[0, :L]
        ptm = float(np.asarray(out["ptm"])[0])
        # CA-only residue mean (atom37 index 1), matching the reference
        # EsmFoldv1 callback's per-residue pLDDT
        mean_plddt = float(plddt37[:, 1].mean()) / 100.0

        atom_types = rc.atom_types()
        r3 = rc.restype_1to3()
        coords, names, resnames, resids, elements = [], [], [], [], []
        for i in range(L):
            res3 = r3.get(sequence[i], "UNK")
            for j, aname in enumerate(atom_types):
                if mask37[i, j] < 0.5:
                    continue
                coords.append(pos37[i, j])
                names.append(aname)
                resnames.append(res3)
                resids.append(residue_indices[i])
                elements.append(aname[0])
        atoms = AtomView(
            np.asarray(coords, np.float32),
            np.asarray(names),
            np.asarray(resnames),
            np.asarray(resids, np.int64),
            np.asarray(elements),
        )
        return FoldingResult(
            ptm=ptm,
            plddt=mean_plddt,
            atoms=atoms,
            residue_indices=np.asarray(residue_indices),
        )
