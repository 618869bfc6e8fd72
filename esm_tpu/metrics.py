"""Evaluation metrics for contact prediction.

The reference computes these inline in its notebooks
(examples/contact_prediction.ipynb) and reports them in README.md:617-688:
top-L long-range precision — the fraction of the L highest-scoring predicted
pairs with sequence separation >= minsep that are true contacts.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def contact_precision(
    predictions: np.ndarray,
    targets: np.ndarray,
    *,
    minsep: int = 24,
    maxsep: Optional[int] = None,
    topk: Optional[int] = None,
) -> float:
    """Top-k precision on an (L, L) contact map.

    predictions: (L, L) scores (e.g. ``out["contacts"]``);
    targets: (L, L) binary true-contact map (CB-CB < 8 Å convention);
    minsep/maxsep: sequence-separation range (24 = "long-range");
    topk: number of pairs scored (default L, the "@L" in precision@L).
    """
    L = predictions.shape[-1]
    if targets.shape != predictions.shape:
        raise ValueError(f"shape mismatch {predictions.shape} vs {targets.shape}")
    i, j = np.triu_indices(L, k=minsep)
    if maxsep is not None:
        keep = (j - i) < maxsep
        i, j = i[keep], j[keep]
    scores = predictions[i, j]
    true = targets[i, j].astype(np.float64)
    order = np.argsort(-scores)[: (topk if topk is not None else L)]
    return float(true[order].mean())


def contacts_from_distance_map(dist: np.ndarray, cutoff: float = 8.0) -> np.ndarray:
    """Binary contact map from a distance map (NaN = missing -> not a contact).
    Matches the ESMStructuralSplitDataset ``dist`` field convention."""
    with np.errstate(invalid="ignore"):
        return (np.nan_to_num(dist, nan=np.inf) < cutoff).astype(np.float32)
