"""Checkpoint loading: legacy key upgrades + registry, tested against
synthesized .pt files in the reference's historical layouts (no network)."""

import argparse
import os

import numpy as np
import pytest
import torch

from tests.conftest import add_reference_to_path

add_reference_to_path()

from esm.model.esm2 import ESM2 as RefESM2  # noqa: E402
from esm.model.esm1 import ProteinBertModel  # noqa: E402
from esm.data import Alphabet as RefAlphabet  # noqa: E402

from esm_tpu import pretrained  # noqa: E402
from esm_tpu.data import Alphabet  # noqa: E402


def _fake_esm2_checkpoint(tmp_path):
    torch.manual_seed(0)
    ref = RefESM2(num_layers=2, embed_dim=32, attention_heads=2)
    # simulate the released layout: prefixed keys + OmegaConf-ish cfg
    state = {
        f"encoder.sentence_encoder.{k}"
        if not k.startswith("lm_head")
        else f"encoder.{k}": v
        for k, v in ref.state_dict().items()
    }
    cfg = argparse.Namespace(
        encoder_layers=2,
        encoder_embed_dim=32,
        encoder_attention_heads=2,
        token_dropout=True,
    )
    path = tmp_path / "esm2_t2_fake_UR50D.pt"
    torch.save({"cfg": {"model": cfg}, "model": state}, path)
    # regression weights
    reg = {
        "model": {
            "contact_head.regression.weight": torch.randn(1, 2 * 2),
            "contact_head.regression.bias": torch.randn(1),
        }
    }
    torch.save(reg, tmp_path / "esm2_t2_fake_UR50D-contact-regression.pt")
    return ref, reg, path


def test_load_local_esm2_with_legacy_prefixes(tmp_path):
    ref, reg, path = _fake_esm2_checkpoint(tmp_path)
    model, alphabet = pretrained.load_model_and_alphabet_local(str(path))
    assert model.num_layers == 2

    _, _, toks = alphabet.get_batch_converter()([("a", "KALTARQ")])
    with torch.no_grad():
        ref.contact_head.regression.weight.copy_(
            reg["model"]["contact_head.regression.weight"]
        )
        ref.contact_head.regression.bias.copy_(
            reg["model"]["contact_head.regression.bias"]
        )
        ref.eval()
        out_ref = ref(torch.from_numpy(toks).long(), return_contacts=True)
    out = model(toks, return_contacts=True)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), out_ref["logits"].numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["contacts"]), out_ref["contacts"].numpy(), atol=2e-5, rtol=1e-4
    )


def test_load_local_esm1b_fairseq_layout(tmp_path):
    torch.manual_seed(1)
    args = argparse.Namespace(
        arch="roberta_large",
        layers=2,
        embed_dim=32,
        ffn_embed_dim=64,
        attention_heads=2,
        max_positions=1024,
        emb_layer_norm_before=True,
        final_bias=True,
    )
    ref_alphabet = RefAlphabet.from_architecture("ESM-1b")
    ref = ProteinBertModel(args, ref_alphabet).eval()

    # fairseq-era keys: encoder.sentence_encoder.* prefix, encoder_-prefixed args
    state = {}
    for k, v in ref.state_dict().items():
        if k.startswith("lm_head") or k.startswith("contact_head"):
            state[f"encoder.{k}"] = v
        else:
            state[f"encoder.sentence_encoder.{k}"] = v
    legacy_args = argparse.Namespace(
        arch="roberta_large",
        encoder_layers=2,
        encoder_embed_dim=32,
        encoder_ffn_embed_dim=64,
        encoder_attention_heads=2,
        max_positions=1024,
        final_bias=True,
    )
    path = tmp_path / "esm1v_t2_fake_UR90S_1.pt"  # esm1v: no regression expected
    torch.save({"args": legacy_args, "model": state}, path)

    model, alphabet = pretrained.load_model_and_alphabet_local(str(path))
    _, _, toks = alphabet.get_batch_converter()([("a", "KALTARQ")])
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(toks).long())
    out = model(toks)
    # note: the v1 upgrade zeroes the mask-token embedding row for token-drop
    # (reference esm/pretrained.py:99); re-apply to the oracle
    with torch.no_grad():
        ref.embed_tokens.weight[ref_alphabet.mask_idx].zero_()
        out_ref = ref(torch.from_numpy(toks).long())
    np.testing.assert_allclose(
        np.asarray(out["logits"]), out_ref["logits"].numpy(), atol=2e-5, rtol=1e-4
    )


def test_named_constructors_exist():
    for name in pretrained._LM_NAMES:
        assert hasattr(pretrained, name), name
    assert callable(pretrained.esm2_t33_650M_UR50D)
    assert callable(pretrained.esmfold_v1)
