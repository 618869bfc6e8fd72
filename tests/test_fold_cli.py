"""esm-fold CLI end-to-end with synthesized checkpoints (tiny ESMFold + LM)."""

import argparse
import os

import numpy as np
import pytest
import torch

from transformers.models.esm.configuration_esm import (
    StructureModuleConfig as HFSMConfig,
    TrunkConfig as HFTrunkConfig,
)
import transformers.models.esm.modeling_esmfold as hf

from tests.conftest import add_reference_to_path

add_reference_to_path()

from esm.model.esm2 import ESM2 as RefESM2  # noqa: E402

C_S, C_Z = 64, 32


def _make_cache(tmp_path):
    """Write fake LM + ESMFold checkpoints into an ESM_TPU_CACHE dir."""
    cache = tmp_path / "cache"
    cache.mkdir()

    # LM checkpoint for esm_type "esm2_8M" -> name esm2_t6_8M_UR50D_500K
    torch.manual_seed(0)
    lm = RefESM2(num_layers=2, embed_dim=32, attention_heads=2)
    lm_state = {
        (
            f"encoder.sentence_encoder.{k}"
            if not k.startswith("lm_head")
            else f"encoder.{k}"
        ): v
        for k, v in lm.state_dict().items()
    }
    lm_cfg = argparse.Namespace(
        encoder_layers=2, encoder_embed_dim=32, encoder_attention_heads=2,
        token_dropout=True,
    )
    torch.save(
        {"cfg": {"model": lm_cfg}, "model": lm_state},
        cache / "esm2_t6_8M_UR50D_500K.pt",
    )

    # ESMFold checkpoint: trunk state from the HF oracle + top-level heads
    hf_cfg = HFTrunkConfig(
        num_blocks=1,
        sequence_state_dim=C_S,
        pairwise_state_dim=C_Z,
        sequence_head_width=16,
        pairwise_head_width=16,
        dropout=0,
        max_recycles=2,
        structure_module=HFSMConfig(
            sequence_dim=32, pairwise_dim=C_Z, ipa_dim=8, resnet_dim=16,
            num_heads_ipa=4, num_blocks=1,
        ),
    )
    trunk = hf.EsmFoldingTrunk(hf_cfg)
    sd = {f"trunk.{k}": v for k, v in trunk.state_dict().items()}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = torch.randn(o, i) * 0.05
        if bias:
            sd[f"{name}.bias"] = torch.zeros(o)

    n_tokens = 23
    sd["esm_s_combine"] = torch.zeros(3)  # lm layers + 1
    sd["esm_s_mlp.0.weight"] = torch.ones(32)
    sd["esm_s_mlp.0.bias"] = torch.zeros(32)
    lin("esm_s_mlp.1", 32, C_S)
    lin("esm_s_mlp.3", C_S, C_S)
    sd["embedding.weight"] = torch.randn(n_tokens, C_S) * 0.02
    lin("distogram_head", C_Z, 64)
    lin("ptm_head", C_Z, 64)
    lin("lm_head", C_S, n_tokens)
    sd["lddt_head.0.weight"] = torch.ones(32)
    sd["lddt_head.0.bias"] = torch.zeros(32)
    lin("lddt_head.1", 32, 16)
    lin("lddt_head.2", 16, 16)
    lin("lddt_head.3", 16, 37 * 50)

    fold_cfg = argparse.Namespace(
        esm_type="esm2_8M",
        use_esm_attn_map=False,
        lddt_head_hid_dim=16,
        trunk=argparse.Namespace(
            num_blocks=1,
            sequence_state_dim=C_S,
            pairwise_state_dim=C_Z,
            sequence_head_width=16,
            pairwise_head_width=16,
            position_bins=32,
            max_recycles=2,
            structure_module=argparse.Namespace(
                c_s=32, c_z=C_Z, c_ipa=8, c_resnet=16, no_heads_ipa=4,
                no_qk_points=4, no_v_points=8, no_blocks=1,
                no_transition_layers=1, no_resnet_blocks=2, no_angles=7,
                trans_scale_factor=10,
            ),
        ),
    )
    fold_path = cache / "esmfold_tiny.pt"
    torch.save({"cfg": {"model": fold_cfg}, "model": sd}, fold_path)
    return cache, fold_path


@pytest.mark.slow
def test_fold_cli_end_to_end(tmp_path, monkeypatch):
    cache, fold_path = _make_cache(tmp_path)
    monkeypatch.setenv("ESM_TPU_CACHE", str(cache))

    fasta = tmp_path / "in.fasta"
    fasta.write_text(">seqA\nMKTVRQERLK\n>seqB\nKALTARQ\n>dimer\nMKT:RQE\n")

    from esm_tpu.cli import fold

    args = fold.create_parser().parse_args(
        ["-i", str(fasta), "-o", str(tmp_path / "pdbs"),
         "-m", str(fold_path), "--num-recycles", "1"]
    )
    fold.run(args)

    for name, ln in [("seqA", 10), ("seqB", 7)]:
        pdb = (tmp_path / "pdbs" / f"{name}.pdb").read_text()
        assert pdb.startswith("ATOM")
        # one CA per residue
        assert pdb.count(" CA ") == ln
    dimer = (tmp_path / "pdbs" / "dimer.pdb").read_text()
    assert " A" in dimer and "TER" in dimer


def test_fold_cli_int8(tmp_path, monkeypatch):
    """--int8 quantizes LM + trunk; end-to-end fold still writes valid PDBs."""
    cache, fold_path = _make_cache(tmp_path)
    monkeypatch.setenv("ESM_TPU_CACHE", str(cache))
    fasta = tmp_path / "in.fasta"
    fasta.write_text(">seqA\nMKTVRQERLK\n")

    from esm_tpu.cli import fold

    args = fold.create_parser().parse_args(
        ["-i", str(fasta), "-o", str(tmp_path / "pdbs8"),
         "-m", str(fold_path), "--num-recycles", "0", "--int8"]
    )
    fold.run(args)
    pdb = (tmp_path / "pdbs8" / "seqA.pdb").read_text()
    assert pdb.startswith("ATOM") and pdb.count(" CA ") == 10


@pytest.mark.slow
def test_esmfold_handle_api(tmp_path, monkeypatch):
    """ESMFoldHandle mirrors the reference model API (infer/infer_pdb/
    output_to_pdb/set_chunk_size) and unpacks as (cfg, params, alphabet)."""
    import jax.numpy as jnp

    from esm_tpu import pretrained

    cache, fold_path = _make_cache(tmp_path)
    monkeypatch.setenv("ESM_TPU_CACHE", str(cache))

    handle = pretrained.load_esmfold(str(fold_path))
    cfg, params, alphabet = handle  # back-compat tuple unpacking
    assert cfg is handle.cfg and params is handle.params

    seq = "MKTVRQERLKSIV"
    out = handle.infer(seq, num_recycles=1)
    assert np.isfinite(np.asarray(out["positions"])).all()
    pdb = handle.infer_pdb(seq, num_recycles=1)
    assert pdb.startswith("PARENT") or "ATOM" in pdb
    assert handle.output_to_pdb(out)[0] == pdb

    handle.set_chunk_size(32)
    assert handle.cfg.trunk.chunk_size == 32
    out_chunked = handle.infer(seq, num_recycles=1)
    np.testing.assert_allclose(
        np.asarray(out_chunked["positions"]), np.asarray(out["positions"]),
        atol=1e-4, rtol=1e-4,
    )

    fast = handle.with_options(compute_dtype=jnp.bfloat16)
    assert fast.cfg.trunk.compute_dtype == jnp.bfloat16
    assert handle.cfg.trunk.compute_dtype != jnp.bfloat16

    q = handle.quantized()
    qpdb = q.infer_pdb(seq, num_recycles=1)
    assert "ATOM" in qpdb


def test_fold_cli_plan(tmp_path, monkeypatch, capsys):
    """--plan prints the plan_fold verdict for the longest (multimer-expanded)
    input and exits without writing any PDB."""
    cache, fold_path = _make_cache(tmp_path)
    monkeypatch.setenv("ESM_TPU_CACHE", str(cache))
    fasta = tmp_path / "in.fasta"
    fasta.write_text(">seqA\nMKTVRQERLK\n>dimer\nMKT:RQE\n")

    from esm_tpu.cli import fold

    args = fold.create_parser().parse_args(
        ["-i", str(fasta), "-o", str(tmp_path / "pdbs"),
         "-m", str(fold_path), "--plan"]
    )
    fold.run(args)
    out = capsys.readouterr().out
    # dimer expands to 3 + 25-G linker + 3 = 31 residues > seqA's 10
    assert "L=31" in out
    assert "verdict: fits" in out
    assert "largest L that fits" in out
    assert not list((tmp_path / "pdbs").glob("*.pdb"))
