"""CLI flows: esm-extract end-to-end on example FASTA with a local checkpoint,
variant scoring strategies vs. reference math."""

import argparse
import pathlib

import numpy as np
import pytest
import torch

from tests.conftest import add_reference_to_path

add_reference_to_path()

from esm.model.esm2 import ESM2 as RefESM2  # noqa: E402

from esm_tpu import pretrained  # noqa: E402

FASTA = "/root/reference/examples/data/few_proteins.fasta"


@pytest.fixture(scope="module")
def fake_ckpt(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ckpt")
    torch.manual_seed(0)
    ref = RefESM2(num_layers=2, embed_dim=32, attention_heads=2)
    state = {
        (
            f"encoder.sentence_encoder.{k}"
            if not k.startswith("lm_head")
            else f"encoder.{k}"
        ): v
        for k, v in ref.state_dict().items()
    }
    cfg = argparse.Namespace(
        encoder_layers=2, encoder_embed_dim=32, encoder_attention_heads=2,
        token_dropout=True,
    )
    path = tmp_path / "esm2_t2_cli_UR50D.pt"
    torch.save({"cfg": {"model": cfg}, "model": state}, path)
    torch.save(
        {
            "model": {
                "contact_head.regression.weight": torch.randn(1, 4),
                "contact_head.regression.bias": torch.randn(1),
            }
        },
        tmp_path / "esm2_t2_cli_UR50D-contact-regression.pt",
    )
    return str(path)


def test_extract_cli(fake_ckpt, tmp_path):
    from esm_tpu.cli import extract

    args = extract.create_parser().parse_args(
        [
            fake_ckpt,
            FASTA,
            str(tmp_path / "out"),
            "--repr_layers", "0", "-1",
            "--include", "mean", "per_tok", "bos", "contacts",
        ]
    )
    extract.run(args)

    import esm_tpu

    seqs = dict(esm_tpu.read_fasta(FASTA))
    model, alphabet = pretrained.load_model_and_alphabet_local(fake_ckpt)
    for label, seq in seqs.items():
        f = tmp_path / "out" / f"{label}.pt"
        assert f.exists(), label
        data = torch.load(f, weights_only=False)
        assert set(data["representations"].keys()) == {0, 2}
        assert data["representations"][2].shape == (len(seq), 32)
        assert data["mean_representations"][2].shape == (32,)
        assert data["contacts"].shape == (len(seq), len(seq))
        # mean must equal direct forward mean over real tokens
        _, _, toks = alphabet.get_batch_converter()([(label, seq)])
        out = model(toks, repr_layers=[2])
        expect = np.asarray(out["representations"][2])[0, 1 : len(seq) + 1].mean(0)
        np.testing.assert_allclose(
            data["mean_representations"][2].numpy(), expect, atol=2e-5, rtol=1e-3
        )


def test_variant_scoring_strategies(fake_ckpt, tmp_path):
    import pandas as pd

    from esm_tpu.cli import predict_variants

    seq = "KALTARQQEVFDLIRD"
    df = pd.DataFrame({"mutant": ["K1A", "A2G", "D16K"], "dms": [0.1, -1.2, 0.7]})
    dms_in = tmp_path / "dms.csv"
    df.to_csv(dms_in, index=False)

    for strategy in ["wt-marginals", "masked-marginals", "pseudo-ppl"]:
        out_csv = tmp_path / f"out_{strategy}.csv"
        args = predict_variants.create_parser().parse_args(
            [
                "--model-location", fake_ckpt,
                "--sequence", seq,
                "--dms-input", str(dms_in),
                "--dms-output", str(out_csv),
                "--offset-idx", "1",
                "--scoring-strategy", strategy,
                "--eval-column", "dms",
            ]
        )
        predict_variants.run(args)
        out = pd.read_csv(out_csv)
        assert fake_ckpt in out.columns
        assert np.isfinite(out[fake_ckpt]).all()

    # wt-marginals must match direct computation
    import jax

    model, alphabet = pretrained.load_model_and_alphabet_local(fake_ckpt)
    _, _, toks = alphabet.get_batch_converter()([("p", seq)])
    logp = np.asarray(jax.nn.log_softmax(model(toks)["logits"], axis=-1))
    wt, mt = alphabet.get_idx("K"), alphabet.get_idx("A")
    expect = logp[0, 1, mt] - logp[0, 1, wt]
    got = pd.read_csv(tmp_path / "out_wt-marginals.csv")[fake_ckpt][0]
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_structural_split_dataset_offline(tmp_path):
    """ESMStructuralSplitDataset reads synthesized splits/pkl trees (the
    download path needs network; item/format semantics match esm/data.py:381-493)."""
    import pickle

    import numpy as np

    from esm_tpu.data import ESMStructuralSplitDataset

    base = tmp_path / "structural-data"
    (base / "splits" / "superfamily" / "1").mkdir(parents=True)
    (base / "pkl" / "1a").mkdir(parents=True)
    names = ["d1abc_1", "d1axy_2"]
    (base / "splits" / "superfamily" / "1" / "train.txt").write_text("\n".join(names))
    for name in names:
        item = {
            "seq": "KALTA",
            "ssp": "HHHHH",
            "dist": np.zeros((5, 5), np.float32),
            "coords": np.zeros((5, 3), np.float32),
        }
        with open(base / "pkl" / "1a" / f"{name}.pkl", "wb") as f:
            pickle.dump(item, f)

    ds = ESMStructuralSplitDataset(
        split_level="superfamily", cv_partition="1", split="train",
        root_path=str(tmp_path),
    )
    assert len(ds) == 2
    item = ds[0]
    assert item["seq"] == "KALTA" and item["dist"].shape == (5, 5)


def test_extract_cli_bucketed_matches(fake_ckpt, tmp_path):
    """--bucket pads batches to shape buckets; outputs must be identical."""
    from esm_tpu.cli import extract

    base = ["--repr_layers", "-1", "--include", "mean", "per_tok", "contacts", "--npz"]
    a1 = extract.create_parser().parse_args(
        [fake_ckpt, FASTA, str(tmp_path / "plain")] + base
    )
    extract.run(a1)
    a2 = extract.create_parser().parse_args(
        [fake_ckpt, FASTA, str(tmp_path / "bucketed"), "--bucket"] + base
    )
    extract.run(a2)

    import esm_tpu

    for label, _ in esm_tpu.read_fasta(FASTA):
        p = np.load(tmp_path / "plain" / f"{label}.npz")
        b = np.load(tmp_path / "bucketed" / f"{label}.npz")
        assert set(p.files) == set(b.files)
        for k in p.files:
            if p[k].dtype.kind in "fc":
                np.testing.assert_allclose(b[k], p[k], atol=1e-5, err_msg=f"{label}/{k}")


def test_contact_precision_metric():
    from esm_tpu.metrics import contact_precision, contacts_from_distance_map

    L = 40
    rng = np.random.RandomState(0)
    dist = rng.uniform(3, 20, (L, L)).astype(np.float32)
    dist = (dist + dist.T) / 2
    dist[5, 35] = dist[35, 5] = 4.0  # one long-range contact
    targets = contacts_from_distance_map(dist)
    assert targets[5, 35] == 1.0

    # a perfect predictor scores 1.0 on the contacts it ranks first
    pred = np.where(targets > 0, 1.0, 0.0) + rng.uniform(0, 0.01, (L, L))
    n_true = int(np.triu(targets, k=24).sum())
    p = contact_precision(pred, targets, minsep=24, topk=n_true)
    assert p == 1.0
    # an anti-predictor scores ~0
    p_bad = contact_precision(-pred, targets, minsep=24, topk=n_true)
    assert p_bad < 0.5
    # NaN distances are not contacts
    dist[2, 30] = np.nan
    assert contacts_from_distance_map(dist)[2, 30] == 0.0


def test_atlas_manifests():
    from esm_tpu.data import atlas

    tarballs = list(atlas.tarball_urls())
    assert len(tarballs) == 100  # 10 pTM bins x 10 pLDDT bins
    assert all(u.startswith("https://dl.fbaipublicfiles.com/esmatlas/") for u in tarballs)
    assert "ptm_0.90_to_1.00__plddt_0.90_to_1.00.tar" in tarballs[-1]
    assert len(list(atlas.tarball_urls("high_quality_clust30"))) == 1
    assert atlas.fetch_structure_api_url("MGYP000000000001").endswith(".pdb")
    assert len(atlas.foldseek_db_urls()) == 2 and len(atlas.metadata_urls()) == 2


@pytest.mark.slow
def test_multichain_sample_and_score():
    """Direct multichain API coverage (reference multichain_util.py:80-135)."""
    import jax

    from esm_tpu.data import Alphabet
    from esm_tpu.models import inverse_folding as ifm
    from esm_tpu.models.inverse_folding import multichain

    alphabet = Alphabet.from_architecture("invariant_gvp")
    cfg = ifm.GVPTransformerConfig.from_alphabet(
        alphabet,
        encoder_embed_dim=32, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_embed_dim=64, decoder_embed_dim=32, decoder_layers=1,
        decoder_attention_heads=2, decoder_ffn_embed_dim=64,
        gvp_top_k_neighbors=4, gvp_node_hidden_dim_scalar=16,
        gvp_node_hidden_dim_vector=4, gvp_edge_hidden_dim_scalar=8,
        gvp_edge_hidden_dim_vector=1, gvp_num_encoder_layers=1,
    )
    params = ifm.init(jax.random.PRNGKey(0), cfg)

    def helix(L, shift):
        t = np.arange(L)[:, None].astype(np.float32)
        ca = np.concatenate([np.cos(t*0.6)*2.3, np.sin(t*0.6)*2.3, t*1.5], -1) + shift
        return np.stack([ca + [1.2, 0, 0], ca, ca + [0, 1.2, 0]], 1).astype(np.float32)

    coords = {"A": helix(9, 0.0), "B": helix(7, 8.0)}
    seq = multichain.sample_sequence_in_complex(
        params, cfg, alphabet, coords, target_chain_id="A", seed=3
    )
    assert len(seq) == 9

    ll, ll_withcoord = multichain.score_sequence_in_complex(
        params, cfg, alphabet, coords, target_chain_id="A", target_seq="KALTARQQE"
    )
    assert np.isfinite(float(ll)) and np.isfinite(float(ll_withcoord))
    # scoring must ignore the spacer/other-chain positions: score of chain B
    # conditioned the other way also finite and generally different
    ll_b, _ = multichain.score_sequence_in_complex(
        params, cfg, alphabet, coords, target_chain_id="B", target_seq="KALTARQ"
    )
    assert np.isfinite(float(ll_b))


@pytest.mark.slow
def test_pretrain_mlm_example(tmp_path):
    """examples/pretrain_mlm.py: loss decreases on the example FASTA and the
    orbax checkpoint round-trips (the training story end-to-end on the mesh).
    Runs in a fresh subprocess (see conftest.run_pretrain_example)."""
    import jax
    import orbax.checkpoint as ocp

    from tests.conftest import run_pretrain_example

    from esm_tpu.io.checkpoint import load_params

    ckpt, out = run_pretrain_example(
        tmp_path, ["--remat", "--save-every", "8"], steps=8
    )
    assert "step     8" in out and "saved params" in out

    losses = [float(l.split()[3]) for l in out.splitlines() if l.startswith("step")]
    assert losses[-1] < losses[0], out

    # the standalone params checkpoint equals the params inside the saved
    # train state (save/restore round-trip, bare orbax restores)
    restored = load_params(str(pathlib.Path(ckpt).resolve()))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(str(pathlib.Path(f"{ckpt}-state").resolve()))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored, state["params"],
    )
