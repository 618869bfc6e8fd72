"""Energy terms over folded structures.

Reference semantics: examples/protein-programming-language/language/energy.py —
pTM/pLDDT maximization, symmetry rings, surface hydrophobics/exposure,
globularity, template cRMSD/dRMSD, secondary structure matching. Geometry via
esm_tpu.apps.ppl.geometry (numpy) instead of biotite.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List, Optional

import numpy as np

from .folding import AtomView, FoldingResult
from .geometry import annotate_sse_ca, kabsch_superimpose, rmsd, sasa

_HYDROPHOBICS = {"VAL", "ILE", "LEU", "PHE", "MET", "TRP"}


class EnergyTerm(ABC):
    @abstractmethod
    def compute(self, node, folding_result: FoldingResult) -> float: ...


class MaximizePTM(EnergyTerm):
    def compute(self, node, folding_result: FoldingResult) -> float:
        return 1.0 - folding_result.ptm


class MaximizePLDDT(EnergyTerm):
    def compute(self, node, folding_result: FoldingResult) -> float:
        return 1.0 - folding_result.plddt


def get_backbone_atoms(atoms: AtomView) -> AtomView:
    return atoms[
        (atoms.atom_name == "CA") | (atoms.atom_name == "N") | (atoms.atom_name == "C")
    ]


def get_center_of_mass(coords: np.ndarray) -> np.ndarray:
    return coords.mean(axis=0).reshape(1, 3)


def pairwise_distances(coords: np.ndarray) -> np.ndarray:
    m = coords[:, None, :] - coords[None, :, :]
    d = np.linalg.norm(m, axis=-1)
    return d[np.triu_indices(d.shape[0], k=1)]


def adjacent_distances(coords: np.ndarray) -> np.ndarray:
    m = coords - np.roll(coords, shift=1, axis=0)
    return np.linalg.norm(m, axis=-1)


class SymmetryRing(EnergyTerm):
    """Std of protomer center-of-mass distances (reference energy.py:42-71)."""

    def __init__(self, all_to_all_protomer_symmetry: bool = False) -> None:
        self.all_to_all = all_to_all_protomer_symmetry

    def compute(self, node, folding_result: FoldingResult) -> float:
        centers = []
        for child in node.get_children():
            start, end = child.get_residue_index_range()
            bb = get_backbone_atoms(
                folding_result.atoms[
                    (folding_result.atoms.res_id >= start)
                    & (folding_result.atoms.res_id < end)
                ]
            ).coord
            centers.append(get_center_of_mass(bb))
        centers = np.vstack(centers)
        return float(
            np.std(pairwise_distances(centers))
            if self.all_to_all
            else np.std(adjacent_distances(centers))
        )


def hydrophobic_score(atoms: AtomView, start=None, end=None) -> float:
    """Fraction of hydrophobic atoms that are surface exposed
    (reference energy.py:113-145)."""
    hydrophobic = np.isin(atoms.res_name, list(_HYDROPHOBICS))
    if start is None and end is None:
        selection = np.ones_like(hydrophobic)
    else:
        start = 0 if start is None else start
        end = atoms.res_id.max() + 1 if end is None else end
        selection = (atoms.res_id >= start) & (atoms.res_id < end)
    surf = sasa(atoms.coord, atoms.element) > 0
    hydrophobic_surf = selection & hydrophobic & surf
    denom = (selection & hydrophobic).sum()
    return float(hydrophobic_surf.sum() / denom) if denom else 0.0


class MinimizeSurfaceHydrophobics(EnergyTerm):
    def compute(self, node, folding_result: FoldingResult) -> float:
        start, end = node.get_residue_index_range()
        return hydrophobic_score(folding_result.atoms, start, end)


def surface_ratio(atoms: AtomView, start: int, end: int) -> float:
    mask = (atoms.res_id >= start) & (atoms.res_id < end)
    surf = mask & (sasa(atoms.coord, atoms.element) > 0)
    return float(surf.sum() / max(mask.sum(), 1))


class MinimizeSurfaceExposure(EnergyTerm):
    def compute(self, node, folding_result: FoldingResult) -> float:
        start, end = node.get_residue_index_range()
        return surface_ratio(folding_result.atoms, start, end)


class MaximizeSurfaceExposure(EnergyTerm):
    def compute(self, node, folding_result: FoldingResult) -> float:
        start, end = node.get_residue_index_range()
        return 1.0 - surface_ratio(folding_result.atoms, start, end)


class MaximizeGlobularity(EnergyTerm):
    def compute(self, node, folding_result: FoldingResult) -> float:
        start, end = node.get_residue_index_range()
        bb = get_backbone_atoms(
            folding_result.atoms[
                (folding_result.atoms.res_id >= start)
                & (folding_result.atoms.res_id < end)
            ]
        ).coord
        return float(np.std(np.linalg.norm(bb - get_center_of_mass(bb), axis=-1)))


class MinimizeCRmsd(EnergyTerm):
    """Coordinate RMSD to a template after Kabsch superposition."""

    def __init__(self, template: AtomView, backbone_only: bool = False) -> None:
        self.template = get_backbone_atoms(template) if backbone_only else template
        self.backbone_only = backbone_only

    def compute(self, node, folding_result: FoldingResult) -> float:
        start, end = node.get_residue_index_range()
        atoms = folding_result.atoms[
            (folding_result.atoms.res_id >= start)
            & (folding_result.atoms.res_id < end)
        ]
        if self.backbone_only:
            atoms = get_backbone_atoms(atoms)
        n = min(len(self.template), len(atoms))
        moved = kabsch_superimpose(self.template.coord[:n], atoms.coord[:n])
        return rmsd(self.template.coord[:n], moved)


class MinimizeDRmsd(EnergyTerm):
    """Distance-matrix RMSD to a template (superposition-free)."""

    def __init__(self, template: AtomView, backbone_only: bool = False) -> None:
        self.template = get_backbone_atoms(template) if backbone_only else template
        self.backbone_only = backbone_only

    def compute(self, node, folding_result: FoldingResult) -> float:
        start, end = node.get_residue_index_range()
        atoms = folding_result.atoms[
            (folding_result.atoms.res_id >= start)
            & (folding_result.atoms.res_id < end)
        ]
        if self.backbone_only:
            atoms = get_backbone_atoms(atoms)
        n = min(len(self.template), len(atoms))
        dp = pairwise_distances(self.template.coord[:n])
        dq = pairwise_distances(atoms.coord[:n])
        return float(np.sqrt(((dp - dq) ** 2).mean()))


class MatchSecondaryStructure(EnergyTerm):
    """Fraction of residues NOT matching the desired SSE ('a'/'b'/'c')."""

    def __init__(self, secondary_structure_element: str) -> None:
        self.sse = secondary_structure_element

    def compute(self, node, folding_result: FoldingResult) -> float:
        start, end = node.get_residue_index_range()
        atoms = folding_result.atoms[
            (folding_result.atoms.res_id >= start)
            & (folding_result.atoms.res_id < end)
        ]
        ca = atoms[atoms.atom_name == "CA"].coord
        sse = annotate_sse_ca(ca)
        return float(np.mean(sse != self.sse))
