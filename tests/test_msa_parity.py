"""MSA Transformer numeric parity vs. the reference torch implementation."""

import argparse

import numpy as np
import pytest

from tests.conftest import add_reference_to_path

add_reference_to_path()

import torch  # noqa: E402
import jax  # noqa: E402

from esm.model.msa_transformer import MSATransformer as RefMSA  # noqa: E402
from esm.data import Alphabet as RefAlphabet  # noqa: E402

from esm_tpu.data import Alphabet  # noqa: E402
from esm_tpu.io.convert import convert_msa_transformer  # noqa: E402
from esm_tpu.models import msa_transformer  # noqa: E402


@pytest.fixture(scope="module")
def ref_and_params():
    torch.manual_seed(2)
    args = argparse.Namespace(
        layers=2,
        embed_dim=48,
        ffn_embed_dim=96,
        attention_heads=4,
        dropout=0.1,
        attention_dropout=0.1,
        activation_dropout=0.1,
        max_tokens_per_msa=2**14,
        max_tokens=2**14,
        max_positions=1024,
        embed_positions_msa=True,
    )
    ref_alphabet = RefAlphabet.from_architecture("msa_transformer")
    ref = RefMSA(args, ref_alphabet)
    ref.eval()
    with torch.no_grad():
        ref.contact_head.regression.weight.normal_()
        ref.contact_head.regression.bias.normal_()
    params = convert_msa_transformer(ref.state_dict())
    cfg = msa_transformer.MSATransformerConfig.from_alphabet(
        Alphabet.from_architecture("msa_transformer"),
        num_layers=2,
        embed_dim=48,
        ffn_embed_dim=96,
        attention_heads=4,
    )
    return ref, params, cfg


def _msa_tokens(ragged=True):
    alphabet = Alphabet.from_architecture("msa_transformer")
    msa1 = [("s1", "KALTARQQEV"), ("s2", "KALT-RQQEV"), ("s3", "K-LTARQQ-V")]
    msa2 = [("t1", "LAGVS"), ("t2", "LA-VS")]
    batch = [msa1, msa2] if ragged else [msa1]
    _, _, toks = alphabet.get_batch_converter()(batch)
    return toks


@pytest.mark.parametrize("ragged", [True, False])
def test_msa_forward_parity(ref_and_params, ragged):
    ref, params, cfg = ref_and_params
    toks = _msa_tokens(ragged)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(toks).long(),
            repr_layers=list(range(cfg.num_layers + 1)),
            return_contacts=True,
        )
    out = msa_transformer.apply(
        params, cfg, toks, return_contacts=True, return_representations=True
    )

    np.testing.assert_allclose(
        np.asarray(out["logits"]), out_ref["logits"].numpy(), atol=3e-5, rtol=1e-5
    )
    for i in range(cfg.num_layers + 1):
        np.testing.assert_allclose(
            np.asarray(out["representations"][i]),
            out_ref["representations"][i].numpy(),
            atol=3e-5,
            rtol=1e-5,
            err_msg=f"layer {i}",
        )
    np.testing.assert_allclose(
        np.asarray(out["row_attentions"]),
        out_ref["row_attentions"].numpy(),
        atol=3e-5,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["col_attentions"]),
        out_ref["col_attentions"].numpy(),
        atol=3e-5,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["contacts"]), out_ref["contacts"].numpy(), atol=3e-5, rtol=1e-5
    )


def test_msa_single_row(ref_and_params):
    """Degenerate 1-row MSA exercises the column-attention shortcut
    (reference esm/axial_attention.py:189-200)."""
    ref, params, cfg = ref_and_params
    alphabet = Alphabet.from_architecture("msa_transformer")
    _, _, toks = alphabet.get_batch_converter()([[("s1", "KALTARQQEV")]])
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(toks).long())
    out = msa_transformer.apply(params, cfg, toks)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), out_ref["logits"].numpy(), atol=3e-5, rtol=1e-5
    )


def test_chunked_axial_attention_matches(ref_and_params):
    """Row/column chunking changes memory, not numerics (reference
    esm/axial_attention.py chunked inference paths)."""
    import jax.numpy as jnp

    from esm_tpu.ops.axial_attention import column_self_attention, row_self_attention

    _, params, cfg = ref_and_params
    lp = jax.tree.map(lambda x: x[0], params["layers"])
    g = np.random.RandomState(11)
    b, r, c = 2, 7, 9
    x = jnp.asarray(g.randn(b, r, c, cfg.embed_dim).astype(np.float32))
    mask = np.zeros((b, r, c), bool)
    mask[1, :, 7:] = True
    mask = jnp.asarray(mask)

    row_p = lp["row_self_attention"]["layer"]
    full, full_probs = row_self_attention(
        row_p, x, num_heads=cfg.attention_heads, padding_mask=mask
    )
    for ck in (2, 3, 7):
        out, probs = row_self_attention(
            row_p, x, num_heads=cfg.attention_heads, padding_mask=mask,
            max_rows_per_chunk=ck,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=2e-5)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(full_probs), atol=2e-5)

    col_p = lp["column_self_attention"]["layer"]
    full, full_probs = column_self_attention(
        col_p, x, num_heads=cfg.attention_heads, padding_mask=mask
    )
    for ck in (2, 4, 9):
        out, probs = column_self_attention(
            col_p, x, num_heads=cfg.attention_heads, padding_mask=mask,
            max_cols_per_chunk=ck,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=2e-5)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(full_probs), atol=2e-5)


def test_msa_selective_repr_layers(ref_and_params):
    _, params, cfg = ref_and_params
    toks = _msa_tokens(False)
    full = msa_transformer.apply(params, cfg, toks, return_representations=True)
    sel = msa_transformer.apply(params, cfg, toks, repr_layers=(0, 1, cfg.num_layers))
    for i, arr in sel["representations"].items():
        np.testing.assert_allclose(
            np.asarray(arr), np.asarray(full["representations"][i]),
            atol=1e-6, err_msg=f"layer {i}",
        )
