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
