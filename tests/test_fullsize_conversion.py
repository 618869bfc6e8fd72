"""Full-size synthesized-checkpoint conversion tests.

The released checkpoints cannot be downloaded here (zero egress), so every
converter path is exercised at the REAL shapes/names of the released models
(esm2_t33_650M, esm2_t36_3B, esm_msa1b, esm_if1, esmfold_v1): name/shape/
layout bugs that only appear at real scale (33/36/48 layer counts, d>=1280
head packing, the 1024-row msa position embedding, the 15B layer width) can
no longer hide behind "needs weights". Reference layouts:
esm/pretrained.py:85-221, esm/esmfold/v1/pretrained.py:25-36.

All tests are slow-tier: GB-scale RAM and minutes of runtime.
"""

import argparse
import os
import zlib

import numpy as np
import pytest
import torch

from tests.conftest import add_reference_to_path

add_reference_to_path()

from esm.data import Alphabet as RefAlphabet  # noqa: E402
from esm.model.esm2 import ESM2 as RefESM2  # noqa: E402
from esm.model.msa_transformer import MSATransformer as RefMSA  # noqa: E402

from esm_tpu import pretrained  # noqa: E402

pytestmark = pytest.mark.slow

# The two 3B-scale tests (11 GB state dicts) take ~15 min on this 2-core box;
# they are gated so the full suite stays ~12 min. Run them explicitly with
#   ESM_TPU_FULLSIZE=1 python -m pytest tests/test_fullsize_conversion.py
_huge = pytest.mark.skipif(
    os.environ.get("ESM_TPU_FULLSIZE") != "1",
    reason="3B-scale synthesis (~15 min); set ESM_TPU_FULLSIZE=1",
)


def _fill_params_(model: torch.nn.Module, seed: int) -> None:
    """Overwrite parameters in-place with cheap deterministic values (1-d
    ``weight`` tensors stay near 1 so LayerNorms behave); buffers keep their
    constructor values — rotary ``inv_freq`` ships in real checkpoints with
    its analytic value, and the converter must be free to ignore it."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 1 and name.endswith("weight"):
                p.copy_(1 + 0.02 * torch.randn(p.shape, generator=g))
            else:
                p.copy_(0.02 * torch.randn(p.shape, generator=g))


def _det_tensor(key: str, shape) -> torch.Tensor:
    """Per-key deterministic tensor (recomputable without keeping the full
    state dict alive) — transpose/reshape layout bugs shift the pattern."""
    g = torch.Generator().manual_seed(zlib.crc32(key.encode()) & 0x7FFFFFFF)
    if len(shape) == 1 and key.endswith("weight"):
        return 1 + 0.02 * torch.randn(shape, generator=g)
    return 0.02 * torch.randn(shape, generator=g)


def _v2_prefix(k: str) -> str:
    """Key layout of released ESM-2 checkpoints (undone by upgrade_state_v2)."""
    return ("encoder." + k) if k.startswith("lm_head") else ("encoder.sentence_encoder." + k)


def test_esm2_650M_fullsize_roundtrip(tmp_path):
    """esm2_t33_650M layout through the full disk path: synthesize -> save ->
    load_model_and_alphabet_local -> forward parity vs the torch oracle."""
    ref = RefESM2(num_layers=33, embed_dim=1280, attention_heads=20)
    _fill_params_(ref, 650)
    ref.eval()

    state = {_v2_prefix(k): v for k, v in ref.state_dict().items()
             if not k.startswith("contact_head.")}
    cfg = argparse.Namespace(
        encoder_layers=33, encoder_embed_dim=1280, encoder_attention_heads=20,
        token_dropout=True,
    )
    path = tmp_path / "esm2_t33_650M_UR50D.pt"
    torch.save({"cfg": {"model": cfg}, "model": state}, path)
    g = torch.Generator().manual_seed(651)
    reg = {
        "model": {
            "contact_head.regression.weight": 0.05 * torch.randn(1, 33 * 20, generator=g),
            "contact_head.regression.bias": torch.zeros(1),
        }
    }
    torch.save(reg, tmp_path / "esm2_t33_650M_UR50D-contact-regression.pt")

    model, alphabet = pretrained.load_model_and_alphabet_local(str(path))
    assert model.num_layers == 33 and model.embed_dim == 1280

    # spot leaf checks on the scan-stacked tree (transposed linear layout)
    q17 = np.asarray(model.params["layers"]["self_attn"]["q_proj"]["kernel"][17])
    np.testing.assert_array_equal(q17, ref.layers[17].self_attn.q_proj.weight.detach().numpy().T)
    fc1 = model.params["layers"]["fc1"]["kernel"]
    assert fc1.shape == (33, 1280, 5120)

    # forward parity with the torch oracle carrying the same weights
    with torch.no_grad():
        ref.contact_head.regression.weight.copy_(reg["model"]["contact_head.regression.weight"])
        ref.contact_head.regression.bias.copy_(reg["model"]["contact_head.regression.bias"])
    _, _, toks = alphabet.get_batch_converter()([("a", "KALTARQQEVFDLIRD")])
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(np.asarray(toks)).long(), repr_layers=[33], return_contacts=True)
    out = model(toks, repr_layers=[33], return_contacts=True)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), out_ref["logits"].numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["representations"][33]),
        out_ref["representations"][33].numpy(), atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["contacts"]), out_ref["contacts"].numpy(), atol=1e-4, rtol=1e-4
    )

    # torch -> jax -> torch round trip (io/export.py): the exported state
    # dict is BIT-equal to the synthesized original at full 650M size —
    # the strongest converter validation available without released weights
    from esm_tpu.io.export import export_contact_regression, export_esm2_state_dict

    exported = export_esm2_state_dict(model.params, model.cfg)
    ref_sd = ref.state_dict()
    assert set(exported) == {
        k for k in ref_sd if not k.startswith("contact_head.")
    }
    for k, v in exported.items():
        if k.endswith("rot_emb.inv_freq"):
            # analytic buffer, not a weight: allow libm one-ulp pow drift
            np.testing.assert_allclose(v, ref_sd[k].numpy(), rtol=1e-6, err_msg=k)
        else:
            np.testing.assert_array_equal(v, ref_sd[k].numpy(), err_msg=k)
        del v
    exported_reg = export_contact_regression(model.params)
    for k, v in exported_reg.items():
        np.testing.assert_array_equal(v, ref_sd[k].numpy(), err_msg=k)


def test_esm2_export_loads_in_reference(tmp_path):
    """io/export.save_esm2 output is a real reference checkpoint: a freshly
    initialized (i.e. 'fine-tuned here') ESM-2 saves to .pt, loads through
    the reference's load_model_and_alphabet_local with its STRICT key check
    (esm/pretrained.py:186-219), and the torch model's forward matches the
    JAX forward."""
    from esm.pretrained import load_model_and_alphabet_local  # noqa: E402

    from esm_tpu.data import Alphabet
    from esm_tpu.io.convert import convert_esm2
    from esm_tpu.io.export import save_esm2
    from esm_tpu.models import esm2

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=3, embed_dim=96, attention_heads=4
    )
    import jax

    params = esm2.init(jax.random.PRNGKey(9), cfg)
    # non-zero contact head so the regression file carries real content
    params["contact_head"]["regression"]["kernel"] = (
        0.05 * np.arange(12, dtype=np.float32).reshape(12, 1)
    )

    path, reg_path = save_esm2(params, cfg, tmp_path / "esm2_t3_test.pt")
    assert reg_path is not None

    # torch>=2.6 defaults torch.load to weights_only, which rejects the
    # argparse.Namespace cfg ALL released fair-esm checkpoints carry; the
    # stdlib allowlist below is the standard accommodation for loading them
    torch.serialization.add_safe_globals([argparse.Namespace])
    tm, talpha = load_model_and_alphabet_local(str(path))
    tm.eval()
    assert tm.num_layers == 3 and tm.embed_dim == 96

    _, _, toks = talpha.get_batch_converter()([("a", "KALTARQQEVFDLIRDHISQTGMPPTRAEIA")])
    with torch.no_grad():
        out_t = tm(toks, repr_layers=[3], return_contacts=True)
    out_j = esm2.apply(
        params, cfg, np.asarray(toks), repr_layers=(3,), return_contacts=True,
        need_head_weights=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_j["logits"]), out_t["logits"].numpy(), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_j["contacts"]), out_t["contacts"].numpy(), atol=1e-5, rtol=1e-4
    )

    # ...and converting the torch model back reproduces the original pytree
    back = convert_esm2(tm.state_dict(), attention_heads=4)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@_huge
def test_esm2_3B_fullsize_conversion_inmemory():
    """esm2_t36_3B layout (36 layers, d=2560, 40 heads) converted in memory:
    meta-device reference model supplies the exact key set; converted scan
    leaves are compared against recomputed per-key tensors."""
    with torch.device("meta"):
        meta = RefESM2(num_layers=36, embed_dim=2560, attention_heads=40)
    param_names = {n for n, _ in meta.named_parameters()}

    head_dim = 2560 // 40
    state = {}
    for k, v in meta.state_dict().items():
        if k.startswith("contact_head."):
            continue  # ships in the separate regression file
        if k in param_names:
            state[_v2_prefix(k)] = _det_tensor(k, tuple(v.shape))
        elif k == "lm_head.weight":  # tied to embed_tokens.weight
            state[_v2_prefix(k)] = _det_tensor("embed_tokens.weight", tuple(v.shape))
        elif k.endswith("rot_emb.inv_freq"):
            state[_v2_prefix(k)] = 1.0 / (
                10000 ** (torch.arange(0, head_dim, 2).float() / head_dim)
            )
        else:
            raise AssertionError(f"unexpected non-parameter key {k}")

    model_data = {
        "cfg": {
            "model": argparse.Namespace(
                encoder_layers=36, encoder_embed_dim=2560,
                encoder_attention_heads=40, token_dropout=True,
            )
        },
        "model": state,
    }
    g = torch.Generator().manual_seed(3000)
    regression_data = {
        "model": {
            "contact_head.regression.weight": 0.05 * torch.randn(1, 36 * 40, generator=g),
            "contact_head.regression.bias": torch.zeros(1),
        }
    }
    handle, alphabet = pretrained.load_model_and_alphabet_core(
        "esm2_t36_3B_UR50D", model_data, regression_data
    )
    del state, model_data
    assert handle.num_layers == 36 and handle.embed_dim == 2560

    # leaf equality at several depths (first/middle/last layer)
    for i in (0, 17, 35):
        got = np.asarray(handle.params["layers"]["self_attn"]["k_proj"]["kernel"][i])
        want = _det_tensor(f"layers.{i}.self_attn.k_proj.weight", (2560, 2560)).numpy().T
        np.testing.assert_array_equal(got, want, err_msg=f"layer {i}")
        gotb = np.asarray(handle.params["layers"]["final_layer_norm"]["scale"][i])
        wantb = _det_tensor(f"layers.{i}.final_layer_norm.weight", (2560,)).numpy()
        np.testing.assert_array_equal(gotb, wantb, err_msg=f"ln {i}")
    assert handle.params["layers"]["fc1"]["kernel"].shape == (36, 2560, 10240)
    assert handle.params["contact_head"]["regression"]["kernel"].shape == (36 * 40, 1)

    out = handle(
        np.asarray(alphabet.get_batch_converter()([("a", "MKTVRQ")])[2]),
        return_contacts=True,
    )
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert out["logits"].shape[-1] == len(alphabet)
    assert np.isfinite(np.asarray(out["contacts"])).all()


def test_esm_msa1b_fullsize_fairseq_layout(tmp_path):
    """esm_msa1b (12 layers, d=768, 1024-row msa position embedding) through
    the fairseq-era v1 layout: encoder_/sentence_encoder prefixes AND the
    historical row<->column attention name swap (esm/pretrained.py:121-125);
    forward parity vs the torch oracle."""
    args = argparse.Namespace(
        layers=12, embed_dim=768, ffn_embed_dim=3072, attention_heads=12,
        dropout=0.1, attention_dropout=0.1, activation_dropout=0.1,
        max_tokens_per_msa=2**14, max_tokens=2**14, max_positions=1024,
        embed_positions_msa=True,
    )
    ref = RefMSA(args, RefAlphabet.from_architecture("msa_transformer"))
    _fill_params_(ref, 100)
    ref.eval()

    def swap_rc(k: str) -> str:  # involution: stored layout has them swapped
        if "row" in k:
            return k.replace("row", "column")
        return k.replace("column", "row")

    state = {}
    for k, v in ref.state_dict().items():
        if k.startswith("contact_head."):
            continue
        k = swap_rc(k)
        state[_v2_prefix(k)] = v
    legacy_args = argparse.Namespace(
        arch="msa_transformer",
        encoder_layers=12, encoder_embed_dim=768, encoder_ffn_embed_dim=3072,
        encoder_attention_heads=12, max_positions=1024, embed_positions_msa=True,
        dropout=0.1,
    )
    path = tmp_path / "esm_msa1b_t12_100M_UR50S.pt"
    torch.save({"args": legacy_args, "model": state}, path)
    g = torch.Generator().manual_seed(101)
    reg = {
        "model": {
            "contact_head.regression.weight": 0.05 * torch.randn(1, 12 * 12, generator=g),
            "contact_head.regression.bias": torch.zeros(1),
        }
    }
    torch.save(reg, tmp_path / "esm_msa1b_t12_100M_UR50S-contact-regression.pt")

    model, alphabet = pretrained.load_model_and_alphabet_local(str(path))
    assert model.num_layers == 12 and model.embed_dim == 768
    # the 1024-row msa position embedding survived at its real shape
    assert model.params["msa_position_embedding"].shape == (1024, 1, 768)

    with torch.no_grad():
        ref.contact_head.regression.weight.copy_(reg["model"]["contact_head.regression.weight"])
        ref.contact_head.regression.bias.copy_(reg["model"]["contact_head.regression.bias"])
    msa = [("s1", "KALTARQQEV"), ("s2", "KALT-RQQEV"), ("s3", "K-LTARQQ-V")]
    _, _, toks = alphabet.get_batch_converter()([msa])
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(np.asarray(toks)).long(), repr_layers=[12], return_contacts=True)
    out = model(np.asarray(toks), repr_layers=[12], return_contacts=True)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), out_ref["logits"].numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["contacts"]), out_ref["contacts"].numpy(), atol=1e-4, rtol=1e-4
    )

    # torch -> jax -> torch round trip at full msa1b size (io/export.py):
    # canonical export is BIT-equal to the oracle's state dict, and the
    # written v1-layout file (swapped keys) reloads through the reference's
    # own strict loader
    from esm_tpu.io.export import export_msa_state_dict, save_msa

    exported = export_msa_state_dict(model.params, model.cfg)
    ref_sd = ref.state_dict()
    assert set(exported) == {k for k in ref_sd if not k.startswith("contact_head.")}
    for k, v in exported.items():
        np.testing.assert_array_equal(v, ref_sd[k].numpy(), err_msg=k)
        del v
    from esm.pretrained import load_model_and_alphabet_local as ref_load

    epath, ereg = save_msa(model.params, model.cfg, tmp_path / "esm_msa1b_exported.pt")
    assert ereg is not None
    torch.serialization.add_safe_globals([argparse.Namespace])
    reloaded, _ = ref_load(epath)
    np.testing.assert_array_equal(
        reloaded.state_dict()["layers.7.row_self_attention.layer.q_proj.weight"].numpy(),
        ref_sd["layers.7.row_self_attention.layer.q_proj.weight"].numpy(),
    )
    assert reloaded.msa_position_embedding.shape == (1, 1024, 1, 768)


def test_esm_if1_fullsize_conversion():
    """esm_if1 scale (4 GVP layers w/ 1024/256 hidden, 8+8 transformer layers
    d=512) through the v1 invariant_gvp upgrade with the historical key names
    (inverse of the W_v/W_e/... renames, esm/pretrained.py:128-146); scoring
    parity vs the torch oracle."""
    from tests._stubs import install_all

    install_all()  # torch_geometric / biotite stubs for the reference oracle

    import esm.inverse_folding  # noqa: E402

    torch.manual_seed(16)
    args = argparse.Namespace(
        encoder_embed_dim=512, encoder_layers=8, encoder_attention_heads=8,
        encoder_ffn_embed_dim=2048, decoder_embed_dim=512, decoder_layers=8,
        decoder_attention_heads=8, decoder_ffn_embed_dim=2048,
        dropout=0.0, attention_dropout=0.0,
        gvp_top_k_neighbors=30, gvp_node_hidden_dim_scalar=1024,
        gvp_node_hidden_dim_vector=256, gvp_edge_hidden_dim_scalar=32,
        gvp_edge_hidden_dim_vector=1, gvp_num_encoder_layers=4, gvp_dropout=0.0,
    )
    ref_alphabet = RefAlphabet.from_architecture("invariant_gvp")
    ref = esm.inverse_folding.gvp_transformer.GVPTransformerModel(args, ref_alphabet)
    ref.eval()

    # stored layout: pre-rename key names where the rename is invertible
    # (seq_logits_projection/embed_scores shapes are not recoverable from the
    # current model; those keys keep their current — idempotent — names)
    inverse = [
        ("embed_graph.embed_node", "W_v"),
        ("embed_graph.embed_edge", "W_e"),
        ("embed_graph.embed_confidence.", "embed_score."),
        ("embed_dihedrals", "embed_ingraham_features"),
        ("embed_gvp_output", "embed_gvp_in_local_frame.0"),
        ("embed_gvp_input_features", "embed_features_in_local_frame.0"),
    ]
    state = {}
    for k, v in ref.state_dict().items():
        for new, old in inverse:
            k = k.replace(new, old)
        state[k] = v
    args.arch = "vt_invariant_gvp_transformer"
    model_data = {"args": args, "model": state}

    handle, alphabet = pretrained.load_model_and_alphabet_core(
        "esm_if1_gvp4_t16_142M_UR50", model_data, None
    )
    assert handle.cfg.encoder_layers == 8 and handle.cfg.gvp_num_encoder_layers == 4

    # teacher-forced scoring parity on a small synthetic backbone
    rng = np.random.default_rng(0)
    coords = np.cumsum(rng.normal(0, 1.0, (18, 3, 3)).astype(np.float32), axis=0)
    seq = "KALTARQQEVFDLIRDHI"
    ll_full, ll_coord = handle.score_sequence(coords, seq)
    # reference score_sequence itself trips on numpy2 (np.all over a torch
    # tensor); use its get_sequence_loss + the score formulas verbatim
    with torch.no_grad():
        loss_ref, tpm_ref = esm.inverse_folding.util.get_sequence_loss(
            ref, ref_alphabet, torch.from_numpy(coords), seq
        )
    ref_ll_full = -np.sum(loss_ref * ~tpm_ref) / np.sum(~tpm_ref)
    cm = np.all(np.isfinite(coords), axis=(-1, -2))
    ref_ll_coord = -np.sum(loss_ref * cm) / np.sum(cm)
    np.testing.assert_allclose(ll_full, float(ref_ll_full), atol=2e-3)
    np.testing.assert_allclose(ll_coord, float(ref_ll_coord), atol=2e-3)

    # torch -> jax -> torch round trip at full esm_if1 size (io/export.py):
    # canonical export BIT-equal to the oracle state dict; the written file
    # reloads through the reference's v1 invariant_gvp loader (which applies
    # its historical update_name renames — no-ops on canonical keys)
    import tempfile

    from esm_tpu.io.export import export_if1_state_dict, save_if1

    exported = export_if1_state_dict(handle.params, handle.cfg)
    ref_sd = ref.state_dict()
    assert set(exported) == set(ref_sd)
    for k, v in exported.items():
        if not k.endswith("_float_tensor"):
            np.testing.assert_array_equal(v, ref_sd[k].numpy(), err_msg=k)
        del v
    torch.serialization.add_safe_globals([argparse.Namespace])
    with tempfile.TemporaryDirectory() as td:
        epath, ereg = save_if1(handle.params, handle.cfg, td + "/esm_if1_exported.pt")
        assert ereg is None  # esm_if stems are regression-free
        from esm.pretrained import load_model_and_alphabet_local as ref_load

        reloaded, _ = ref_load(epath)
        np.testing.assert_array_equal(
            reloaded.state_dict()["decoder.layers.5.encoder_attn.k_proj.weight"].numpy(),
            ref_sd["decoder.layers.5.encoder_attn.k_proj.weight"].numpy(),
        )


@_huge
def test_esmfold_v1_fullsize_conversion(tmp_path, monkeypatch):
    """esmfold_v1 layout at its real config (48 trunk blocks, c_s=1024,
    c_z=128, structure module c_s=384, frozen 3B LM): the trunk state comes
    from the HF-vendored openfold-derived oracle modules (same key names as
    the released checkpoint), the LM from a full-size synthesized
    esm2_t36_3B checkpoint in the cache. One end-to-end infer + leaf checks."""
    from transformers.models.esm.configuration_esm import (
        StructureModuleConfig as HFSMConfig,
        TrunkConfig as HFTrunkConfig,
    )
    import transformers.models.esm.modeling_esmfold as hf

    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("ESM_TPU_CACHE", str(cache))

    # --- frozen LM: esm2_t36_3B layout from the meta reference model
    with torch.device("meta"):
        meta = RefESM2(num_layers=36, embed_dim=2560, attention_heads=40)
    param_names = {n for n, _ in meta.named_parameters()}
    head_dim = 2560 // 40
    lm_state = {}
    for k, v in meta.state_dict().items():
        if k.startswith("contact_head."):
            continue
        if k in param_names:
            lm_state[_v2_prefix(k)] = _det_tensor(k, tuple(v.shape))
        elif k == "lm_head.weight":  # tied to embed_tokens.weight
            lm_state[_v2_prefix(k)] = _det_tensor("embed_tokens.weight", tuple(v.shape))
        elif k.endswith("rot_emb.inv_freq"):
            lm_state[_v2_prefix(k)] = 1.0 / (
                10000 ** (torch.arange(0, head_dim, 2).float() / head_dim)
            )
    lm_cfg = argparse.Namespace(
        encoder_layers=36, encoder_embed_dim=2560, encoder_attention_heads=40,
        token_dropout=True,
    )
    torch.save({"cfg": {"model": lm_cfg}, "model": lm_state}, cache / "esm2_t36_3B_UR50D.pt")
    g = torch.Generator().manual_seed(3001)
    torch.save(
        {
            "model": {
                "contact_head.regression.weight": 0.05 * torch.randn(1, 36 * 40, generator=g),
                "contact_head.regression.bias": torch.zeros(1),
            }
        },
        cache / "esm2_t36_3B_UR50D-contact-regression.pt",
    )
    del lm_state

    # --- trunk at the real v1 config (trunk.py:16-51)
    hf_cfg = HFTrunkConfig(
        num_blocks=48, sequence_state_dim=1024, pairwise_state_dim=128,
        sequence_head_width=32, pairwise_head_width=32, dropout=0,
        max_recycles=4,
        structure_module=HFSMConfig(
            sequence_dim=384, pairwise_dim=128, ipa_dim=16, resnet_dim=128,
            num_heads_ipa=12, num_blocks=8,
        ),
    )
    trunk = hf.EsmFoldingTrunk(hf_cfg)
    sd = {f"trunk.{k}": v for k, v in trunk.state_dict().items()}

    def lin(name, i, o):
        gk = torch.Generator().manual_seed(zlib.crc32(name.encode()) & 0x7FFFFFFF)
        sd[f"{name}.weight"] = 0.02 * torch.randn(o, i, generator=gk)
        sd[f"{name}.bias"] = torch.zeros(o)

    n_tokens = 23
    sd["esm_s_combine"] = torch.zeros(37)
    sd["esm_s_mlp.0.weight"] = torch.ones(2560)
    sd["esm_s_mlp.0.bias"] = torch.zeros(2560)
    lin("esm_s_mlp.1", 2560, 1024)
    lin("esm_s_mlp.3", 1024, 1024)
    sd["embedding.weight"] = 0.02 * torch.randn(n_tokens, 1024)
    lin("distogram_head", 128, 64)
    lin("ptm_head", 128, 64)
    lin("lm_head", 1024, n_tokens)
    sd["lddt_head.0.weight"] = torch.ones(384)
    sd["lddt_head.0.bias"] = torch.zeros(384)
    lin("lddt_head.1", 384, 128)
    lin("lddt_head.2", 128, 128)
    lin("lddt_head.3", 128, 37 * 50)

    fold_cfg = argparse.Namespace(
        esm_type="esm2_3B", use_esm_attn_map=False, lddt_head_hid_dim=128,
        trunk=argparse.Namespace(
            num_blocks=48, sequence_state_dim=1024, pairwise_state_dim=128,
            sequence_head_width=32, pairwise_head_width=32, position_bins=32,
            max_recycles=4,
            structure_module=argparse.Namespace(
                c_s=384, c_z=128, c_ipa=16, c_resnet=128, no_heads_ipa=12,
                no_qk_points=4, no_v_points=8, no_blocks=8,
                no_transition_layers=1, no_resnet_blocks=2, no_angles=7,
                trans_scale_factor=10,
            ),
        ),
    )
    fold_path = cache / "esmfold_3B_v1.pt"
    torch.save({"cfg": {"model": fold_cfg}, "model": sd}, fold_path)

    handle = pretrained.load_esmfold(str(fold_path))
    assert handle.cfg.trunk.num_blocks == 48
    assert handle.cfg.esm.num_layers == 36

    # leaf checks: deepest trunk block + a mid block against the HF tensors
    for b in (0, 24, 47):
        got = np.asarray(
            handle.params["trunk"]["blocks"]["tri_mul_out"]["linear_a_p"]["kernel"][b]
        )
        want = trunk.blocks[b].tri_mul_out.linear_a_p.weight.detach().numpy().T
        np.testing.assert_array_equal(got, want, err_msg=f"block {b}")
    # LM landed inside the fold params at full shape
    assert handle.params["esm"]["layers"]["fc1"]["kernel"].shape == (36, 2560, 10240)

    # jax -> torch export at the full 48-block v1 size (io/export.py):
    # BIT-equal to the synthesized checkpoint, esm.* keys correctly absent
    from esm_tpu.io.export import export_esmfold_state_dict

    exported = export_esmfold_state_dict(handle.params)
    assert set(exported) == set(sd)
    for b in (0, 47):
        k = f"trunk.blocks.{b}.tri_att_end.mha.linear_g.weight"
        np.testing.assert_array_equal(exported[k], sd[k].numpy(), err_msg=k)
    k = "trunk.structure_module.ipa.linear_kv_points.weight"
    np.testing.assert_array_equal(exported[k], sd[k].numpy(), err_msg=k)
    del exported, sd, trunk

    out = handle.infer(["MKTVRQER"], num_recycles=0)
    assert np.isfinite(np.asarray(out["positions"])).all()
    assert np.isfinite(float(out["mean_plddt"][0]))
    pdb = handle.infer_pdb("MKTVRQER", num_recycles=0)
    assert pdb.startswith("ATOM")


def test_esm2_15B_layer_width_streaming():
    """The 15B layer width (d=5120, ffn 20480, 40 heads): convert single
    layers streamed one at a time — the full 60 GB state dict never exists.
    Catches converters that silently assume smaller widths/head counts."""
    from esm_tpu.io.convert import convert_transformer_layer

    d, ffn = 5120, 20480
    for i in (0, 47):
        sd = {}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"layers.{i}.self_attn.{proj}.weight"] = _det_tensor(
                f"15b.{i}.{proj}.w", (d, d)
            )
            sd[f"layers.{i}.self_attn.{proj}.bias"] = _det_tensor(
                f"15b.{i}.{proj}.b", (d,)
            )
        sd[f"layers.{i}.self_attn_layer_norm.weight"] = torch.ones(d)
        sd[f"layers.{i}.self_attn_layer_norm.bias"] = torch.zeros(d)
        sd[f"layers.{i}.fc1.weight"] = _det_tensor(f"15b.{i}.fc1.w", (ffn, d))
        sd[f"layers.{i}.fc1.bias"] = torch.zeros(ffn)
        sd[f"layers.{i}.fc2.weight"] = _det_tensor(f"15b.{i}.fc2.w", (d, ffn))
        sd[f"layers.{i}.fc2.bias"] = torch.zeros(d)
        sd[f"layers.{i}.final_layer_norm.weight"] = torch.ones(d)
        sd[f"layers.{i}.final_layer_norm.bias"] = torch.zeros(d)

        layer = convert_transformer_layer(sd, f"layers.{i}")
        assert layer["fc1"]["kernel"].shape == (d, ffn)
        assert layer["self_attn"]["q_proj"]["kernel"].shape == (d, d)
        np.testing.assert_array_equal(
            layer["self_attn"]["q_proj"]["kernel"],
            _det_tensor(f"15b.{i}.q_proj.w", (d, d)).numpy().T,
        )
        del sd, layer
