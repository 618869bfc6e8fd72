"""ESM-1 / ESM-1b numeric parity vs. the reference torch ProteinBertModel."""

import argparse

import numpy as np
import pytest

from tests.conftest import add_reference_to_path

add_reference_to_path()

import torch  # noqa: E402

from esm.model.esm1 import ProteinBertModel  # noqa: E402
from esm.data import Alphabet as RefAlphabet  # noqa: E402

from esm_tpu.data import Alphabet  # noqa: E402
from esm_tpu.io.convert import convert_esm1  # noqa: E402
from esm_tpu.models import esm1  # noqa: E402


def _make_ref(arch: str):
    torch.manual_seed(1)
    if arch == "roberta_large":
        args = argparse.Namespace(
            arch="roberta_large",
            layers=3,
            embed_dim=64,
            ffn_embed_dim=128,
            attention_heads=4,
            max_positions=1024,
            emb_layer_norm_before=True,
            token_dropout=False,
            final_bias=True,
        )
        alphabet = RefAlphabet.from_architecture("ESM-1b")
    else:
        args = argparse.Namespace(
            arch="protein_bert_base",
            layers=3,
            embed_dim=64,
            ffn_embed_dim=128,
            attention_heads=4,
            final_bias=True,
            token_dropout=False,
        )
        alphabet = RefAlphabet.from_architecture("ESM-1")
    model = ProteinBertModel(args, alphabet)
    model.eval()
    with torch.no_grad():
        model.contact_head.regression.weight.normal_()
        model.contact_head.regression.bias.normal_()
        if arch != "roberta_large":
            model.embed_out.normal_()
            model.embed_out_bias.normal_()
    return model, args


@pytest.mark.parametrize("arch", ["roberta_large", "protein_bert_base"])
def test_esm1_forward_parity(arch):
    ref, args = _make_ref(arch)
    version = "ESM-1b" if arch == "roberta_large" else "ESM-1"
    alphabet = Alphabet.from_architecture(version)

    params = convert_esm1(ref.state_dict(), model_version=version)
    cfg = esm1.ESM1Config.from_alphabet(
        alphabet,
        model_version=version,
        num_layers=args.layers,
        embed_dim=args.embed_dim,
        ffn_embed_dim=args.ffn_embed_dim,
        attention_heads=args.attention_heads,
        emb_layer_norm_before=getattr(args, "emb_layer_norm_before", False),
        token_dropout=False,
    )

    batch = [("a", "KALTARQQEVFDLIRD"), ("b", "LAGVS")]
    _, _, toks = alphabet.get_batch_converter()(batch)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(toks).long(),
            repr_layers=list(range(args.layers + 1)),
            return_contacts=True,
        )
    out = esm1.apply(
        params, cfg, toks, need_head_weights=True, return_contacts=True,
        return_representations=True,
    )

    np.testing.assert_allclose(
        np.asarray(out["logits"]), out_ref["logits"].numpy(), atol=3e-5, rtol=1e-5
    )
    for i in range(args.layers + 1):
        np.testing.assert_allclose(
            np.asarray(out["representations"][i]),
            out_ref["representations"][i].numpy(),
            atol=3e-5,
            rtol=1e-5,
            err_msg=f"layer {i}",
        )
    np.testing.assert_allclose(
        np.asarray(out["attentions"]), out_ref["attentions"].numpy(), atol=3e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["contacts"]), out_ref["contacts"].numpy(), atol=3e-5, rtol=1e-5
    )


@pytest.mark.parametrize("arch", ["roberta_large", "protein_bert_base"])
def test_esm1_streaming_contacts_match(arch):
    """Streaming in-scan contacts equal the stacked path (incl. the ESM-1
    bias_kv null-column strip)."""
    ref, args = _make_ref(arch)
    version = "ESM-1b" if arch == "roberta_large" else "ESM-1"
    alphabet = Alphabet.from_architecture(version)
    params = convert_esm1(ref.state_dict(), model_version=version)
    cfg = esm1.ESM1Config.from_alphabet(
        alphabet,
        model_version=version,
        num_layers=args.layers,
        embed_dim=args.embed_dim,
        ffn_embed_dim=args.ffn_embed_dim,
        attention_heads=args.attention_heads,
        emb_layer_norm_before=getattr(args, "emb_layer_norm_before", False),
    )
    _, _, toks = alphabet.get_batch_converter()([("a", "KALTARQQEVFDLIRD"), ("b", "LAGVS")])
    stacked = esm1.apply(params, cfg, toks, need_head_weights=True, return_contacts=True)
    streaming = esm1.apply(params, cfg, toks, return_contacts=True)
    assert "attentions" not in streaming
    np.testing.assert_allclose(
        np.asarray(streaming["contacts"]), np.asarray(stacked["contacts"]),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("arch", ["roberta_large", "protein_bert_base"])
def test_esm1_selective_repr_layers(arch):
    ref, args = _make_ref(arch)
    version = "ESM-1b" if arch == "roberta_large" else "ESM-1"
    alphabet = Alphabet.from_architecture(version)
    params = convert_esm1(ref.state_dict(), model_version=version)
    cfg = esm1.ESM1Config.from_alphabet(
        alphabet, model_version=version, num_layers=args.layers,
        embed_dim=args.embed_dim, ffn_embed_dim=args.ffn_embed_dim,
        attention_heads=args.attention_heads,
        emb_layer_norm_before=getattr(args, "emb_layer_norm_before", False),
    )
    _, _, toks = alphabet.get_batch_converter()([("a", "KALTARQQEVFDLIRD")])
    full = esm1.apply(params, cfg, toks, return_representations=True)
    sel = esm1.apply(params, cfg, toks, repr_layers=(0, 1, args.layers))
    for i, arr in sel["representations"].items():
        np.testing.assert_allclose(
            np.asarray(arr), np.asarray(full["representations"][i]),
            atol=1e-6, err_msg=f"layer {i}",
        )
