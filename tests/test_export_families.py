"""Export-path coverage for the non-ESM2 families (io/export.py): MSA
Transformer (v1 msa_transformer layout with the historical row/column swap,
reference esm/pretrained.py:114-132), ESM-IF1 (v1 invariant_gvp layout,
:134-161) and the ESMFold trunk (esm/esmfold/v1/pretrained.py:13-38 format).

Each test does the strongest check available without released weights: a
torch -> jax -> torch round trip that is BIT-equal to the original state
dict, plus a reload of the written file through the reference's own loader
(or the HF-vendored trunk for ESMFold, where the reference loader needs
openfold)."""

import argparse

import numpy as np
import pytest
import torch

from tests.conftest import add_reference_to_path

add_reference_to_path()

from esm.data import Alphabet as RefAlphabet  # noqa: E402
from esm.model.msa_transformer import MSATransformer as RefMSA  # noqa: E402

# torch>=2.6 defaults torch.load to weights_only, which rejects the argparse
# Namespace args/cfg all fair-esm v1 checkpoints carry
torch.serialization.add_safe_globals([argparse.Namespace])


def _fill_params_(model: torch.nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 1 and name.endswith("weight"):
                p.copy_(1 + 0.02 * torch.randn(p.shape, generator=g))
            else:
                p.copy_(0.02 * torch.randn(p.shape, generator=g))


def test_msa_export_roundtrip_and_reference_load(tmp_path):
    from esm.pretrained import load_model_and_alphabet_local

    from esm_tpu.io.convert import convert_msa_transformer
    from esm_tpu.io.export import export_msa_state_dict, save_msa
    from esm_tpu.models.msa_transformer import MSATransformerConfig

    torch.manual_seed(7)
    args = argparse.Namespace(
        layers=2, embed_dim=32, ffn_embed_dim=64, attention_heads=2,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        max_tokens_per_msa=2**14, max_tokens=2**14, max_positions=1024,
        embed_positions_msa=True,
        embed_positions_msa_dim=32,
    )
    ref_alphabet = RefAlphabet.from_architecture("msa_transformer")
    ref = RefMSA(args, ref_alphabet).eval()
    _fill_params_(ref, 77)

    params = convert_msa_transformer(ref.state_dict())
    cfg = MSATransformerConfig.from_alphabet(
        RefAlphabet.from_architecture("msa_transformer"),
        num_layers=2, embed_dim=32, ffn_embed_dim=64, attention_heads=2,
    )

    # canonical export is bit-equal to the oracle's own state dict
    back = export_msa_state_dict(params, cfg)
    ref_sd = ref.state_dict()
    assert set(back) == {k for k in ref_sd if not k.startswith("contact_head")}
    for k, v in back.items():
        np.testing.assert_array_equal(v, ref_sd[k].numpy(), err_msg=k)

    # the written file (swapped storage keys + regression companion) loads
    # through the reference's v1 loader with its STRICT key check
    path, reg = save_msa(params, cfg, tmp_path / "esm_msa_tiny.pt")
    assert reg is not None
    loaded, alphabet2 = load_model_and_alphabet_local(path)
    loaded.eval()

    msa = [("s1", "KALTARQQEV"), ("s2", "KALT-RQQEV"), ("s3", "K-LTARQQ-V")]
    _, _, toks = ref_alphabet.get_batch_converter()([msa])
    with torch.no_grad():
        a = ref(toks, repr_layers=[2], return_contacts=True)
        b = loaded(toks, repr_layers=[2], return_contacts=True)
    np.testing.assert_allclose(a["logits"].numpy(), b["logits"].numpy(), atol=1e-6)
    np.testing.assert_allclose(a["contacts"].numpy(), b["contacts"].numpy(), atol=1e-6)


def test_if1_export_roundtrip_and_reference_load(tmp_path):
    from tests._stubs import install_all

    install_all()  # torch_geometric / biotite stubs for the reference oracle

    import esm.inverse_folding  # noqa: E402
    from esm.pretrained import load_model_and_alphabet_local

    from esm_tpu.io.convert_if import convert_gvp_transformer
    from esm_tpu.io.export import export_if1_state_dict, save_if1
    from esm_tpu.models.inverse_folding.model import GVPTransformerConfig

    torch.manual_seed(16)
    args = argparse.Namespace(
        encoder_embed_dim=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_embed_dim=64, decoder_embed_dim=32, decoder_layers=2,
        decoder_attention_heads=2, decoder_ffn_embed_dim=64,
        dropout=0.0, attention_dropout=0.0,
        gvp_top_k_neighbors=5, gvp_node_hidden_dim_scalar=16,
        gvp_node_hidden_dim_vector=4, gvp_edge_hidden_dim_scalar=8,
        gvp_edge_hidden_dim_vector=1, gvp_num_encoder_layers=2, gvp_dropout=0.0,
    )
    ref_alphabet = RefAlphabet.from_architecture("invariant_gvp")
    ref = esm.inverse_folding.gvp_transformer.GVPTransformerModel(args, ref_alphabet)
    ref.eval()

    params = convert_gvp_transformer(ref.state_dict())
    cfg = GVPTransformerConfig(
        encoder_embed_dim=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_embed_dim=64, decoder_embed_dim=32, decoder_layers=2,
        decoder_attention_heads=2, decoder_ffn_embed_dim=64,
        gvp_top_k_neighbors=5, gvp_node_hidden_dim_scalar=16,
        gvp_node_hidden_dim_vector=4, gvp_edge_hidden_dim_scalar=8,
        gvp_edge_hidden_dim_vector=1, gvp_num_encoder_layers=2,
    )

    back = export_if1_state_dict(params, cfg)
    ref_sd = ref.state_dict()
    assert set(back) == set(ref_sd)  # incl. the two _float_tensor buffers
    for k, v in back.items():
        if k.endswith("_float_tensor"):
            continue  # dtype carrier, value is irrelevant by construction
        np.testing.assert_array_equal(v, ref_sd[k].numpy(), err_msg=k)

    # written file loads through the reference's v1 invariant_gvp path (the
    # key check runs with expected_missing = the contact-regression keys)
    path, reg = save_if1(params, cfg, tmp_path / "esm_if_tiny.pt")
    assert reg is None  # esm_if stems are regression-free
    loaded, alphabet2 = load_model_and_alphabet_local(path)
    loaded.eval()
    for (ka, va), (kb, vb) in zip(
        sorted(ref.state_dict().items()), sorted(loaded.state_dict().items())
    ):
        assert ka == kb
        if not ka.endswith("_float_tensor"):
            np.testing.assert_array_equal(va.numpy(), vb.numpy(), err_msg=ka)


def test_esmfold_export_roundtrip_and_hf_trunk_load(tmp_path, monkeypatch):
    """Synthesized tiny esmfold .pt -> load_esmfold -> save_esmfold is
    bit-equal to the original state, and the exported trunk subtree
    strict-loads into the HF-vendored EsmFoldingTrunk (the openfold-derived
    oracle with the released checkpoint's key names)."""
    import zlib

    from transformers.models.esm.configuration_esm import (
        StructureModuleConfig as HFSMConfig,
        TrunkConfig as HFTrunkConfig,
    )
    import transformers.models.esm.modeling_esmfold as hf

    from esm_tpu import pretrained
    from esm_tpu.io.export import save_esmfold

    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("ESM_TPU_CACHE", str(cache))

    # tiny LM under the esm2_8M registry name ('500K' stem: no regression)
    import jax

    from esm_tpu.data import Alphabet
    from esm_tpu.io.export import save_esm2
    from esm_tpu.models import esm2 as esm2_mod

    alphabet = Alphabet.from_architecture("ESM-1b")
    lm_cfg = esm2_mod.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=48, attention_heads=2
    )
    lm_params = esm2_mod.init(jax.random.PRNGKey(0), lm_cfg)
    lm_params.pop("contact_head", None)
    save_esm2(lm_params, lm_cfg, cache / "esm2_t6_8M_UR50D_500K.pt")

    # tiny trunk from the HF oracle + hand-built heads (the exact key set of
    # a released esmfold checkpoint, minus esm.*)
    torch.manual_seed(4)
    c_s, c_z, sm_s = 48, 32, 24
    hf_cfg = HFTrunkConfig(
        num_blocks=2, sequence_state_dim=c_s, pairwise_state_dim=c_z,
        sequence_head_width=16, pairwise_head_width=16, dropout=0,
        max_recycles=2,
        structure_module=HFSMConfig(
            sequence_dim=sm_s, pairwise_dim=c_z, ipa_dim=8, resnet_dim=16,
            num_heads_ipa=2, num_blocks=2,
        ),
    )
    trunk = hf.EsmFoldingTrunk(hf_cfg)
    sd = {f"trunk.{k}": v.detach().clone() for k, v in trunk.state_dict().items()}

    def lin(name, i, o):
        g = torch.Generator().manual_seed(zlib.crc32(name.encode()) & 0x7FFFFFFF)
        sd[f"{name}.weight"] = 0.02 * torch.randn(o, i, generator=g)
        sd[f"{name}.bias"] = torch.zeros(o)

    n_tokens, n_lm_layers = 23, 2
    sd["esm_s_combine"] = torch.zeros(n_lm_layers + 1)
    sd["esm_s_mlp.0.weight"] = torch.ones(48)
    sd["esm_s_mlp.0.bias"] = torch.zeros(48)
    lin("esm_s_mlp.1", 48, c_s)
    lin("esm_s_mlp.3", c_s, c_s)
    sd["embedding.weight"] = 0.02 * torch.randn(n_tokens, c_s)
    lin("distogram_head", c_z, 64)
    lin("ptm_head", c_z, 64)
    lin("lm_head", c_s, n_tokens)
    sd["lddt_head.0.weight"] = torch.ones(sm_s)
    sd["lddt_head.0.bias"] = torch.zeros(sm_s)
    lin("lddt_head.1", sm_s, 16)
    lin("lddt_head.2", 16, 16)
    lin("lddt_head.3", 16, 37 * 50)

    fold_cfg = argparse.Namespace(
        esm_type="esm2_8M", use_esm_attn_map=False, lddt_head_hid_dim=16,
        trunk=argparse.Namespace(
            num_blocks=2, sequence_state_dim=c_s, pairwise_state_dim=c_z,
            sequence_head_width=16, pairwise_head_width=16, position_bins=32,
            max_recycles=2,
            structure_module=argparse.Namespace(
                c_s=sm_s, c_z=c_z, c_ipa=8, c_resnet=16, no_heads_ipa=2,
                no_qk_points=4, no_v_points=8, no_blocks=2,
                no_transition_layers=1, no_resnet_blocks=2, no_angles=7,
                trans_scale_factor=10,
            ),
        ),
    )
    src = cache / "esmfold_tiny_v1.pt"
    torch.save({"cfg": {"model": fold_cfg}, "model": sd}, src)

    handle = pretrained.load_esmfold(str(src))

    out = tmp_path / "esmfold_tiny_exported.pt"
    save_esmfold(handle.params, handle.cfg, out)

    data = torch.load(out, weights_only=False)
    assert data["cfg"]["model"].esm_type == "esm2_8M"
    exported = data["model"]
    assert set(exported) == set(sd)
    for k, v in exported.items():
        np.testing.assert_array_equal(v.numpy(), sd[k].numpy(), err_msg=k)

    # the exported trunk subtree is a valid HF EsmFoldingTrunk state dict
    trunk_sd = {k[len("trunk."):]: v for k, v in exported.items()
                if k.startswith("trunk.")}
    trunk.load_state_dict(trunk_sd, strict=True)

    # and the exported file reloads through our own loader
    handle2 = pretrained.load_esmfold(str(out))
    a = jax.tree.leaves(handle.params)
    b = jax.tree.leaves(handle2.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_esm1v_headless_export_is_allowed(tmp_path):
    """ESM-1v stems are in the reference's no-regression set
    (esm/pretrained.py:18-21): a headless ESM-1v export must succeed (the
    round-4 guard spuriously rejected it)."""
    import jax

    from esm_tpu.data import Alphabet
    from esm_tpu.io.export import save_esm1b
    from esm_tpu.models import esm1 as esm1_mod

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm1_mod.ESM1Config(
        model_version="ESM-1b", num_layers=2, embed_dim=32, ffn_embed_dim=64,
        attention_heads=2, max_positions=1024,
    )
    params = esm1_mod.init(jax.random.PRNGKey(1), cfg)
    params.pop("contact_head", None)
    # zero the mask row so the save emits no round-trip warning (the loader
    # zeroes it; a nonzero row is the lossy case the warning flags)
    emb = np.array(params["embed_tokens"]["weight"])
    emb[alphabet.mask_idx] = 0
    params["embed_tokens"]["weight"] = emb

    path, reg = save_esm1b(params, cfg, tmp_path / "esm1v_tiny_1.pt")
    assert reg is None

    # ...and the nonzero-mask-row case warns
    emb2 = emb.copy()
    emb2[alphabet.mask_idx] = 0.5
    params["embed_tokens"]["weight"] = emb2
    with pytest.warns(UserWarning, match="mask"):
        save_esm1b(params, cfg, tmp_path / "esm1v_tiny_2.pt")


def test_headless_esm2_leaves_no_file_behind(tmp_path):
    """The stem/contact-head combination is validated BEFORE the main .pt is
    written: the error path must not leave a checkpoint on disk that the
    reference loader would FileNotFoundError on."""
    import jax

    from esm_tpu.data import Alphabet
    from esm_tpu.io.export import save_esm2
    from esm_tpu.models import esm2 as esm2_mod

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2_mod.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    params = esm2_mod.init(jax.random.PRNGKey(2), cfg)
    params.pop("contact_head", None)
    target = tmp_path / "esm2_tiny_ft.pt"
    with pytest.raises(ValueError, match="contact-regression"):
        save_esm2(params, cfg, target)
    assert not target.exists()


def test_esm1_proper_export_roundtrip_and_reference_load(tmp_path):
    """ESM-1 proper (protein_bert_base: bias_kv attention, sinusoidal
    positions, untied embed_out) — the last interop family: torch -> jax ->
    torch bit-equal, and the written file loads through the reference's v1
    protein_bert_base path with its strict check."""
    from esm.model.esm1 import ProteinBertModel
    from esm.pretrained import load_model_and_alphabet_local

    from esm_tpu.io.convert import convert_esm1
    from esm_tpu.io.export import export_esm1_state_dict, save_esm1
    from esm_tpu.models import esm1 as esm1_mod

    torch.manual_seed(5)
    args = argparse.Namespace(
        arch="protein_bert_base", layers=2, embed_dim=32, ffn_embed_dim=64,
        attention_heads=2, max_positions=1024, final_bias=True,
        token_dropout=False,
    )
    ref_alphabet = RefAlphabet.from_architecture("ESM-1")
    ref = ProteinBertModel(args, ref_alphabet).eval()
    _fill_params_(ref, 55)

    params = convert_esm1(ref.state_dict(), model_version="ESM-1")
    cfg = esm1_mod.ESM1Config(
        model_version="ESM-1", num_layers=2, embed_dim=32, ffn_embed_dim=64,
        attention_heads=2, max_positions=1024,
    )
    back = export_esm1_state_dict(params, cfg)
    ref_sd = ref.state_dict()
    assert set(back) == {k for k in ref_sd if not k.startswith("contact_head")}
    for k, v in back.items():
        if not k.endswith("_float_tensor"):
            np.testing.assert_array_equal(v, ref_sd[k].numpy(), err_msg=k)

    path, reg = save_esm1(params, cfg, tmp_path / "esm1_tiny.pt")
    assert reg is not None
    loaded, _ = load_model_and_alphabet_local(path)
    loaded.eval()
    toks = torch.tensor([[0, 5, 6, 7, 8]])
    with torch.no_grad():
        a = ref(toks)["logits"]
        b = loaded(toks)["logits"]
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-6)
