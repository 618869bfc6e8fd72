"""Dependency-free PDB reader (esm_tpu/data/pdb.py) and the flows it backs:
inverse-folding load_coords fallback (biotite absent in this image) and PPL
template energies."""

import numpy as np
import pytest


def _pdb_line(serial, name, res, chain, resseq, xyz, alt=" ", record="ATOM  ", elem=None):
    elem = elem or name[0]
    x, y, z = xyz
    return (
        f"{record}{serial:5d} {name:<4s}{alt:1s}{res:>3s} {chain}{resseq:4d}    "
        f"{x:8.3f}{y:8.3f}{z:8.3f}{1.00:6.2f}{25.00:6.2f}          {elem:>2s}"
    )


@pytest.fixture(scope="module")
def pdb_text():
    rng = np.random.RandomState(0)
    lines = ["HEADER    TEST", "MODEL        1"]
    serial = 1
    # chain A: 3 residues, full N/CA/C (+CB on res 2); res 2 CA has an
    # altloc B copy that must be skipped
    for resseq, res in [(1, "MET"), (2, "LYS"), (3, "THR")]:
        for name in ["N", "CA", "C"] + (["CB"] if resseq == 2 else []):
            xyz = rng.randn(3) * 5
            lines.append(_pdb_line(serial, name, res, "A", resseq, xyz))
            serial += 1
            if resseq == 2 and name == "CA":
                lines.append(_pdb_line(serial, name, res, "A", resseq, xyz + 9, alt="B"))
                serial += 1
    # chain B: 1 residue MISSING its C atom
    for name in ["N", "CA"]:
        lines.append(_pdb_line(serial, name, "GLY", "B", 1, rng.randn(3)))
        serial += 1
    # a water HETATM and a second model that must both be ignored
    lines.append(_pdb_line(serial, "O", "HOH", "A", 99, rng.randn(3), record="HETATM"))
    lines += ["ENDMDL", "MODEL        2", _pdb_line(999, "N", "ALA", "A", 1, [0, 0, 0]), "ENDMDL", "END"]
    return "\n".join(lines)


def test_read_pdb(pdb_text):
    from esm_tpu.data.pdb import read_pdb

    atoms = read_pdb(pdb_text)
    # 3 + 4 (res2 incl CB, altloc-B dropped) + 3 + 2, HETATM + model-2 dropped
    assert len(atoms) == 12
    assert not atoms.hetero.any()
    assert set(atoms.chain_id) == {"A", "B"}
    assert read_pdb(pdb_text, keep_hetero=True).hetero.sum() == 1
    ca = atoms[(atoms.atom_name == "CA") & (atoms.chain_id == "A")]
    assert len(ca) == 3 and list(ca.res_id) == [1, 2, 3]


def test_backbone_coords_and_fallback(pdb_text, tmp_path):
    from esm_tpu.data.pdb import backbone_coords, read_pdb

    coords, seq = backbone_coords(read_pdb(pdb_text), chain="A")
    assert coords.shape == (3, 3, 3) and seq == "MKT"
    assert np.isfinite(coords).all()
    coords_b, seq_b = backbone_coords(read_pdb(pdb_text), chain="B")
    assert seq_b == "G"
    assert np.isnan(coords_b[0, 2]).all() and np.isfinite(coords_b[0, :2]).all()

    # inverse-folding load_coords falls back to this parser without biotite
    fp = tmp_path / "t.pdb"
    fp.write_text(pdb_text)
    from esm_tpu.models.inverse_folding.util import load_coords

    c2, s2 = load_coords(str(fp), "A")
    assert s2 == "MKT"
    np.testing.assert_allclose(c2, coords)


CIF_TEXT = """data_test
#
_entry.id TEST
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.auth_seq_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_atom_id
_atom_site.pdbx_PDB_model_num
ATOM   1 N N  . MET X 1 1.000 2.000 3.000 5 MET A N  1
ATOM   2 C CA . MET X 1 2.000 2.500 3.500 5 MET A CA 1
ATOM   3 C C  . MET X 1 3.000 3.000 4.000 5 MET A C  1
ATOM   4 N N  . LYS X 2 4.000 4.500 5.000 6 LYS A N  1
ATOM   5 C CA A LYS X 2 5.000 5.500 6.000 6 LYS A CA 1
ATOM   6 C CA B LYS X 2 9.000 9.500 9.000 6 LYS A CA 1
ATOM   7 C C  . LYS X 2 6.000 6.500 7.000 6 LYS A C  1
ATOM   8 N N  . GLY Y 1 7.000 7.500 8.000 1 GLY B N  1
ATOM   9 C CA . GLY Y 1 8.000 8.500 9.000 1 GLY B CA 1
HETATM 10 O O  . HOH Z . 0.000 0.000 0.000 99 HOH A O 1
ATOM   11 N N  . ALA X 1 0.000 0.000 0.000 5 ALA A N  2
#
"""


def test_read_cif(tmp_path):
    from esm_tpu.data.pdb import backbone_coords, read_cif, read_structure

    atoms = read_cif(CIF_TEXT)
    # altloc B, HETATM, and model-2 rows dropped
    assert len(atoms) == 8
    assert not atoms.hetero.any()
    # auth_* identifiers win over label_* (biotite default)
    assert set(atoms.chain_id) == {"A", "B"}
    assert list(atoms.res_id[atoms.chain_id == "A"]) == [5, 5, 5, 6, 6, 6]
    assert read_cif(CIF_TEXT, keep_hetero=True).hetero.sum() == 1

    coords, seq = backbone_coords(atoms, chain="A")
    assert seq == "MK" and coords.shape == (2, 3, 3)
    np.testing.assert_allclose(coords[0, 1], [2.0, 2.5, 3.5])
    np.testing.assert_allclose(coords[1, 1], [5.0, 5.5, 6.0])  # altloc A kept
    coords_b, seq_b = backbone_coords(atoms, chain="B")
    assert seq_b == "G"
    assert np.isnan(coords_b[0, 2]).all()  # missing C atom -> NaN row

    # extension dispatch + raw-text sniffing
    fp = tmp_path / "t.cif"
    fp.write_text(CIF_TEXT)
    assert len(read_structure(str(fp))) == 8
    assert len(read_structure(CIF_TEXT)) == 8

    # inverse-folding load_coords accepts .cif without biotite
    from esm_tpu.models.inverse_folding.util import load_coords

    c2, s2 = load_coords(str(fp), "A")
    assert s2 == "MK"
    np.testing.assert_allclose(c2, coords)


def test_ppl_template_energies(pdb_text):
    from esm_tpu.apps.ppl import (
        MinimizeCRmsd,
        MinimizeDRmsd,
        get_atomview_in_residue_range,
        pdb_file_to_atomview,
    )
    from esm_tpu.apps.ppl.folding import FoldingResult

    template = pdb_file_to_atomview(pdb_text, chain="A")
    assert len(template) == 10
    assert len(get_atomview_in_residue_range(template, 1, 3)) == 7

    class _Node:
        def get_residue_index_range(self):
            return 1, 4

    fr = FoldingResult(ptm=0.5, plddt=80.0, atoms=template, residue_indices=np.arange(1, 4))
    # identical structure: zero RMSD; rigid shift: zero only for dRMSD
    assert MinimizeCRmsd(template).compute(_Node(), fr) < 1e-4
    assert MinimizeDRmsd(template).compute(_Node(), fr) < 1e-6
    shifted = pdb_file_to_atomview(pdb_text, chain="A")
    shifted.coord = shifted.coord + np.asarray([3.0, -1.0, 2.0], np.float32)
    fr2 = FoldingResult(ptm=0.5, plddt=80.0, atoms=shifted, residue_indices=np.arange(1, 4))
    assert MinimizeCRmsd(template).compute(_Node(), fr2) < 1e-3
    assert MinimizeDRmsd(template).compute(_Node(), fr2) < 1e-5


def test_cif_quoted_values_with_embedded_quotes():
    """CIF quoting ends at quote+whitespace, not at the first quote char —
    primed atom ids like "O5'" are spec-legal and must not silently drop the
    row to the short-row guard."""
    from esm_tpu.data.pdb import _cif_tokens, read_cif

    assert _cif_tokens("ATOM \"O5'\" 'C1\"' end") == ["ATOM", "O5'", 'C1"', "end"]
    assert _cif_tokens("'a b' plain") == ["a b", "plain"]

    cif = "\n".join(
        [
            "data_test",
            "loop_",
            "_atom_site.group_PDB",
            "_atom_site.id",
            "_atom_site.auth_atom_id",
            "_atom_site.label_alt_id",
            "_atom_site.auth_comp_id",
            "_atom_site.auth_asym_id",
            "_atom_site.auth_seq_id",
            "_atom_site.Cartn_x",
            "_atom_site.Cartn_y",
            "_atom_site.Cartn_z",
            "_atom_site.type_symbol",
            "_atom_site.pdbx_PDB_model_num",
            "ATOM 1 \"O5'\" . DA A 1 1.0 2.0 3.0 O 1",
            "ATOM 2 CA . ALA A 2 4.0 5.0 6.0 C 1",
            "#",
        ]
    )
    atoms = read_cif(cif)
    assert list(atoms.atom_name) == ["O5'", "CA"]
    np.testing.assert_allclose(atoms.coord[0], [1.0, 2.0, 3.0])
