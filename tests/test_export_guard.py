"""save_esm2's contract guards: the reference loader unconditionally opens
<stem>-contact-regression.pt for esm2* stems (esm/pretrained.py:18-21,72-77),
so exporting a tree without a contact head must fail AT SAVE TIME unless the
stem carries the reference's no-regression marker (270K/500K)."""

import jax
import pytest

from esm_tpu.data import Alphabet
from esm_tpu.io.export import save_esm2
from esm_tpu.models import esm2


@pytest.fixture(scope="module")
def tiny():
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_missing_contact_head_fails_at_save(tiny, tmp_path):
    cfg, params = tiny
    headless = {k: v for k, v in params.items() if k != "contact_head"}
    assert "contact_head" in params  # the fixture model does have one
    with pytest.raises(ValueError, match="contact-regression"):
        save_esm2(headless, cfg, tmp_path / "esm2_tiny_ft.pt")


def test_no_regression_marker_stem_is_allowed(tiny, tmp_path):
    cfg, params = tiny
    headless = {k: v for k, v in params.items() if k != "contact_head"}
    path, reg = save_esm2(headless, cfg, tmp_path / "esm2_tiny_270K.pt")
    assert reg is None  # marker stem: loader skips the regression file


def test_with_contact_head_writes_regression(tiny, tmp_path):
    cfg, params = tiny
    path, reg = save_esm2(params, cfg, tmp_path / "esm2_tiny.pt")
    assert reg is not None and reg.endswith("-contact-regression.pt")


def test_esm1b_export_roundtrip(tmp_path):
    """torch -> jax -> torch round trip for the v1 (roberta_large) layout,
    and the written file loads through the reference's v1 loader path."""
    import sys

    sys.path.insert(0, "/root/reference")
    import argparse

    import numpy as np
    import torch
    from esm.model.esm1 import ProteinBertModel
    from esm.data import Alphabet as RefAlphabet

    from esm_tpu.io.convert import convert_esm1
    from esm_tpu.io.export import export_esm1b_state_dict, save_esm1b
    from esm_tpu.models import esm1 as esm1_mod

    torch.manual_seed(3)
    args = argparse.Namespace(
        arch="roberta_large", layers=2, embed_dim=32, ffn_embed_dim=64,
        attention_heads=2, max_positions=1024, emb_layer_norm_before=True,
        token_dropout=False, final_bias=True,
    )
    ref_alphabet = RefAlphabet.from_architecture("ESM-1b")
    model = ProteinBertModel(args, ref_alphabet).eval()
    with torch.no_grad():
        model.contact_head.regression.weight.normal_()
        model.contact_head.regression.bias.normal_()
        # the reference v1 loader zeroes this row at load; pre-zero so the
        # round trip compares post-upgrade state
        model.embed_tokens.weight[ref_alphabet.mask_idx].zero_()
    sd = {k: v for k, v in model.state_dict().items()}

    params = convert_esm1(sd, model_version="ESM-1b")
    cfg = esm1_mod.ESM1Config(
        model_version="ESM-1b", num_layers=2, embed_dim=32, ffn_embed_dim=64,
        attention_heads=2, max_positions=1024,
    )
    back = export_esm1b_state_dict(params, cfg)
    ref_keys = {k for k in sd if not k.startswith("contact_head")}
    assert set(back) == ref_keys
    for k in sorted(ref_keys):
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)

    # reference-load the saved file (strict v1 path incl. regression merge)
    path, reg = save_esm1b(params, cfg, tmp_path / "esm1b_tiny.pt")
    assert reg is not None
    # torch>=2.6 defaults torch.load to weights_only, rejecting the args
    # Namespace every real v1 checkpoint carries
    torch.serialization.add_safe_globals([argparse.Namespace])
    from esm.pretrained import load_model_and_alphabet_local

    loaded, alphabet2 = load_model_and_alphabet_local(path)
    toks = torch.tensor([[0, 5, 6, 7, 2]])
    with torch.no_grad():
        a = model(toks)["logits"]
        b = loaded(toks)["logits"]
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-6)
