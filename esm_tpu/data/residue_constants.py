"""AlphaFold-2 residue constants (runtime accessor).

Loads the committed npz (see gen_residue_constants.py for provenance — the
arrays are AlphaFold's published literature geometry tables). Used by the
ESMFold structure module (torsion->frames->atom14), atom14/37 conversion, and
the PDB writer (reference consumes these via openfold:
esm/esmfold/v1/esmfold.py:23-25, esm/esmfold/v1/misc.py:12-15).
"""

from __future__ import annotations

import functools
import os

import numpy as np


@functools.lru_cache(None)
def _data() -> dict:
    path = os.path.join(os.path.dirname(__file__), "residue_constants.npz")
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


def __getattr__(name: str):
    d = _data()
    if name in d:
        return d[name]
    raise AttributeError(name)


restype_num = 20

# Derived python-side conveniences
@functools.lru_cache(None)
def restypes() -> list:
    return [str(x) for x in _data()["restypes"]]


@functools.lru_cache(None)
def restypes_with_x() -> list:
    return [str(x) for x in _data()["restypes_with_x"]]


@functools.lru_cache(None)
def restype_order_with_x() -> dict:
    return {r: i for i, r in enumerate(restypes_with_x())}


@functools.lru_cache(None)
def restype_1to3() -> dict:
    d = _data()
    return {
        str(k): str(v)
        for k, v in zip(d["restype_1to3_keys"], d["restype_1to3_vals"])
    }


@functools.lru_cache(None)
def atom_types() -> list:
    return [str(x) for x in _data()["atom_types"]]
