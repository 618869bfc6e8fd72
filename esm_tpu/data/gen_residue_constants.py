"""Generate esm_tpu/data/residue_constants.npz.

The arrays are AlphaFold-2's published residue constants (literature bond
geometry + atom bookkeeping tables), taken from the copy vendored in the
installed `transformers` package (transformers.models.esm.openfold_utils.
residue_constants). Run once at build time; the npz is committed so runtime
has no transformers/torch dependency.

Usage: python -m esm_tpu.data.gen_residue_constants
"""

import os

import numpy as np


def main():
    import transformers.models.esm.openfold_utils.residue_constants as rc

    out = {}
    # Core identity tables
    out["restypes"] = np.array(list(rc.restypes))                       # 20 one-letter codes
    out["restypes_with_x"] = np.array(list(rc.restypes_with_x))         # 21
    out["restype_1to3_keys"] = np.array(list(rc.restype_1to3.keys()))
    out["restype_1to3_vals"] = np.array(list(rc.restype_1to3.values()))
    out["atom_types"] = np.array(list(rc.atom_types))                   # 37 atom names
    out["restype_name_to_atom14_names_keys"] = np.array(
        list(rc.restype_name_to_atom14_names.keys())
    )
    out["restype_name_to_atom14_names_vals"] = np.array(
        [rc.restype_name_to_atom14_names[k] for k in rc.restype_name_to_atom14_names]
    )

    # Rigid-frame tables used by torsion->frames->atom14 (all (21, ...))
    out["restype_rigid_group_default_frame"] = np.asarray(
        rc.restype_rigid_group_default_frame, np.float32
    )                                                                   # (21, 8, 4, 4)
    out["restype_atom14_to_rigid_group"] = np.asarray(
        rc.restype_atom14_to_rigid_group, np.int32
    )                                                                   # (21, 14)
    out["restype_atom14_mask"] = np.asarray(rc.restype_atom14_mask, np.float32)
    out["restype_atom14_rigid_group_positions"] = np.asarray(
        rc.restype_atom14_rigid_group_positions, np.float32
    )                                                                   # (21, 14, 3)

    # chi angle bookkeeping
    out["chi_angles_mask"] = np.asarray(rc.chi_angles_mask, np.float32)  # (20, 4)
    out["chi_pi_periodic"] = np.asarray(rc.chi_pi_periodic, np.float32)

    # atom14 <-> atom37 per-restype maps (same construction as openfold's
    # make_atom14_masks, reference esm/esmfold/v1/esmfold.py:240)
    restype_atom14_to_atom37 = []
    restype_atom37_to_atom14 = []
    atom_order = {name: i for i, name in enumerate(rc.atom_types)}
    for rt in rc.restypes:
        names3 = rc.restype_1to3[rt]
        atom14_names = rc.restype_name_to_atom14_names[names3]
        restype_atom14_to_atom37.append(
            [(atom_order[n] if n else 0) for n in atom14_names]
        )
        atom14_order = {n: i for i, n in enumerate(atom14_names) if n}
        restype_atom37_to_atom14.append(
            [(atom14_order.get(n, 0)) for n in rc.atom_types]
        )
    # UNK row
    restype_atom14_to_atom37.append([0] * 14)
    restype_atom37_to_atom14.append([0] * 37)
    out["restype_atom14_to_atom37"] = np.asarray(restype_atom14_to_atom37, np.int32)
    out["restype_atom37_to_atom14"] = np.asarray(restype_atom37_to_atom14, np.int32)

    # atom37 existence mask per restype (21, 37)
    restype_atom37_mask = np.zeros((21, 37), np.float32)
    for i, rt in enumerate(rc.restypes):
        names3 = rc.restype_1to3[rt]
        for name in rc.residue_atoms[names3]:
            restype_atom37_mask[i, atom_order[name]] = 1.0
    out["restype_atom37_mask"] = restype_atom37_mask

    path = os.path.join(os.path.dirname(__file__), "residue_constants.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {sorted(out)}")


if __name__ == "__main__":
    main()
