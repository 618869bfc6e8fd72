"""ESM-2 numeric parity vs. the reference torch implementation.

Builds a small random-init reference ESM2 on CPU, converts its state dict with
esm_tpu.io.convert, and checks logits / representations / attentions / contacts
allclose. This validates both the converter and the JAX forward semantics
(token-dropout rescale, rotary, fp32 softmax, contact head APC math)."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path

add_reference_to_path()

import torch  # noqa: E402

torch.manual_seed(0)

from esm.model.esm2 import ESM2 as RefESM2  # noqa: E402

from esm_tpu.data import Alphabet  # noqa: E402
from esm_tpu.io.convert import convert_esm2  # noqa: E402
from esm_tpu.models import esm2  # noqa: E402


@pytest.fixture(scope="module")
def ref_and_params():
    torch.manual_seed(0)
    ref = RefESM2(num_layers=3, embed_dim=64, attention_heads=4, token_dropout=True)
    ref.eval()
    # give the contact head non-trivial weights
    with torch.no_grad():
        ref.contact_head.regression.weight.normal_()
        ref.contact_head.regression.bias.normal_()
    sd = ref.state_dict()
    params = convert_esm2(sd)
    cfg = esm2.ESM2Config.from_alphabet(
        Alphabet.from_architecture("ESM-1b"),
        num_layers=3,
        embed_dim=64,
        attention_heads=4,
        token_dropout=True,
    )
    return ref, params, cfg


def _tokens(with_padding=True, with_mask=True):
    alphabet = Alphabet.from_architecture("ESM-1b")
    seqs = [("a", "KALTARQQEVFDLIRD"), ("b", "LAGM<mask>S" if with_mask else "LAGMKS")]
    if not with_padding:
        seqs = [seqs[0]]
    _, _, toks = alphabet.get_batch_converter()(seqs)
    return toks


@pytest.mark.parametrize("with_padding", [True, False])
@pytest.mark.parametrize("with_mask", [True, False])
def test_esm2_forward_parity(ref_and_params, with_padding, with_mask):
    ref, params, cfg = ref_and_params
    toks = _tokens(with_padding, with_mask)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(toks).long(),
            repr_layers=list(range(cfg.num_layers + 1)),
            return_contacts=True,
        )

    out = esm2.apply(
        params,
        cfg,
        toks,
        need_head_weights=True,
        return_contacts=True,
        return_representations=True,
    )

    np.testing.assert_allclose(
        np.asarray(out["logits"]), out_ref["logits"].numpy(), atol=2e-5, rtol=1e-5
    )
    for i in range(cfg.num_layers + 1):
        np.testing.assert_allclose(
            np.asarray(out["representations"][i]),
            out_ref["representations"][i].numpy(),
            atol=2e-5,
            rtol=1e-5,
            err_msg=f"layer {i}",
        )
    np.testing.assert_allclose(
        np.asarray(out["attentions"]), out_ref["attentions"].numpy(), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["contacts"]), out_ref["contacts"].numpy(), atol=2e-5, rtol=1e-5
    )


def test_esm2_logits_only_path(ref_and_params):
    """The fast path (no hiddens/attentions collected) produces the same logits."""
    ref, params, cfg = ref_and_params
    toks = _tokens()
    out_fast = esm2.apply(params, cfg, toks)
    assert set(out_fast.keys()) == {"logits"}
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(toks).long())
    np.testing.assert_allclose(
        np.asarray(out_fast["logits"]), out_ref["logits"].numpy(), atol=2e-5, rtol=1e-5
    )


def test_esm2_init_shapes():
    import jax

    cfg = esm2.ESM2Config.from_alphabet(
        Alphabet.from_architecture("ESM-1b"), num_layers=2, embed_dim=64, attention_heads=4
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    assert params["embed_tokens"]["weight"].shape == (33, 64)
    assert params["layers"]["fc1"]["kernel"].shape == (2, 64, 256)
    out = esm2.apply(params, cfg, _tokens())
    assert out["logits"].shape == (2, 18, 33)


def test_esm2_streaming_contacts_match_stacked(ref_and_params):
    """The in-scan contact accumulation equals the reference stack-then-regress."""
    _, params, cfg = ref_and_params
    toks = _tokens()
    stacked = esm2.apply(params, cfg, toks, need_head_weights=True, return_contacts=True)
    streaming = esm2.apply(params, cfg, toks, return_contacts=True)
    assert "attentions" not in streaming
    np.testing.assert_allclose(
        np.asarray(streaming["contacts"]), np.asarray(stacked["contacts"]),
        atol=1e-5, rtol=1e-5,
    )


def test_esm2_selective_repr_layers(ref_and_params):
    """In-scan selective layer collection equals full-stack selection."""
    _, params, cfg = ref_and_params
    toks = _tokens()
    full = esm2.apply(params, cfg, toks, return_representations=True)
    sel = esm2.apply(params, cfg, toks, repr_layers=(0, 2, cfg.num_layers))
    reps = sel["representations"]
    assert set(reps.keys()) == {0, 2, cfg.num_layers}
    for i in reps:
        np.testing.assert_allclose(
            np.asarray(reps[i]),
            np.asarray(full["representations"][i]),
            atol=1e-6,
            err_msg=f"layer {i}",
        )
