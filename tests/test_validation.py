"""Runtime input validation at the API boundary (esm_tpu/utils/validation.py,
SURVEY §5.2): malformed tokens/coords/repr_layers fail fast with actionable
messages instead of cryptic shape errors deep inside jit."""

import jax
import numpy as np
import pytest

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2
from esm_tpu.pretrained import LMHandle
from esm_tpu.utils import validation as V


@pytest.fixture(scope="module")
def model():
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    return LMHandle("esm2", cfg, params, alphabet)


def test_handle_rejects_bad_tokens(model):
    _, _, good = model.alphabet.get_batch_converter()([("a", "KALTARQ")])

    with pytest.raises(TypeError, match="integer token ids"):
        model(good.astype(np.float32))
    with pytest.raises(ValueError, match=r"expected 2D \(B, T\)"):
        model(good[0])  # missing batch dim
    bad = good.copy()
    bad[0, 0] = 99
    with pytest.raises(ValueError, match=r"token ids must be in \[0, 33\)"):
        model(bad)
    with pytest.raises(ValueError, match="out of range"):
        model(good, repr_layers=[7])
    with pytest.raises(TypeError, match="expected an int"):
        model(good, repr_layers=[1.5])
    # the valid call still works
    out = model(good, repr_layers=[-1])
    assert 2 in out["representations"]


def test_check_tokens_msa_rank():
    alphabet = Alphabet.from_architecture("msa_transformer")
    with pytest.raises(ValueError, match=r"expected 3D \(B, R, C\)"):
        V.check_tokens(np.zeros((2, 5), np.int32), alphabet, msa=True)
    V.check_tokens(np.zeros((1, 2, 5), np.int32), alphabet, msa=True)


def test_check_tokens_inside_jit(model):
    """Traced values keep static shape/dtype checks, skip value checks."""
    _, _, good = model.alphabet.get_batch_converter()([("a", "KALTARQ")])

    @jax.jit
    def run(t):
        V.check_tokens(t, model.alphabet)
        return t

    np.testing.assert_array_equal(np.asarray(run(good)), good)

    @jax.jit
    def bad_rank(t):
        V.check_tokens(t[0], model.alphabet)
        return t

    with pytest.raises(ValueError, match="expected 2D"):
        bad_rank(good)


def test_range_check_skip_warns_once(monkeypatch):
    """Accelerator-resident tokens skip the value-range check but warn once
    (ADVICE r2): the skip is no longer silent."""
    import warnings

    alphabet = Alphabet.from_architecture("ESM-1b")
    monkeypatch.setattr(V, "_on_accelerator", lambda x: True)
    monkeypatch.setattr(V, "_warned_skip_range_check", False)
    bad = np.full((1, 4), 99, np.int32)  # out of range, but "on accelerator"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        V.check_tokens(bad, alphabet)  # does not raise
        V.check_tokens(bad, alphabet)
    assert len(w) == 1 and "value-range check is skipped" in str(w[0].message)


def test_check_coords():
    V.check_coords(np.zeros((7, 3, 3), np.float32))
    V.check_coords(np.zeros((2, 7, 3, 3), np.float32), batched=True)
    with pytest.raises(ValueError, match="N/CA/C"):
        V.check_coords(np.zeros((7, 3), np.float32))
    with pytest.raises(ValueError, match="N/CA/C"):
        V.check_coords(np.zeros((7, 4, 3), np.float32))
    with pytest.raises(TypeError, match="floating"):
        V.check_coords(np.zeros((7, 3, 3), np.int32))
    # NaN (missing residues) is legal
    c = np.full((4, 3, 3), np.nan, np.float32)
    V.check_coords(c)
