"""Pipelined bulk-inference executor (esm_tpu/runtime/pipeline.py).

The pipeline must be a pure scheduling change: same outputs as the serial
loop, dispatch in item order, bounded in-flight batches, and the reference
fold CLI's per-batch skip semantics (scripts/fold.py:163-178) via
on_batch_error.
"""

import threading
import time

import numpy as np
import pytest

from esm_tpu.runtime import run_pipeline


def test_pipeline_matches_serial():
    items = list(range(23))
    consumed = {}

    def prepare(x):
        return x * 10

    def dispatch(p):
        return p + 1

    def consume(idx, item, prepared, result):
        consumed[idx] = (item, prepared, result)

    stats = run_pipeline(items, prepare, dispatch, consume, prefetch=3, in_flight=2, writers=3)
    assert stats.batches == len(items) and stats.failed == 0
    assert consumed == {i: (i, i * 10, i * 10 + 1) for i in items}


def test_pipeline_dispatch_order_and_bounded_in_flight():
    order = []
    in_flight = 0
    peak = 0
    lock = threading.Lock()

    def dispatch(p):
        nonlocal in_flight, peak
        order.append(p)
        with lock:
            in_flight += 1
            peak = max(peak, in_flight)
        return p

    def consume(idx, item, prepared, result):
        nonlocal in_flight
        time.sleep(0.005)
        with lock:
            in_flight -= 1

    run_pipeline(range(16), lambda x: x, dispatch, consume, in_flight=2, writers=4)
    assert order == list(range(16))  # device programs enqueued in order
    assert peak <= 2


@pytest.mark.parametrize("stage", ["prepare", "dispatch", "consume"])
def test_pipeline_error_propagation(stage):
    def prepare(x):
        if stage == "prepare" and x == 5:
            raise ValueError("boom-prepare")
        return x

    def dispatch(p):
        if stage == "dispatch" and p == 5:
            raise ValueError("boom-dispatch")
        return p

    def consume(idx, item, prepared, result):
        if stage == "consume" and item == 5:
            raise ValueError("boom-consume")

    with pytest.raises(ValueError, match="boom"):
        run_pipeline(range(10), prepare, dispatch, consume)


def test_pipeline_on_batch_error_skips():
    done = []

    def dispatch(p):
        if p % 3 == 0:
            raise RuntimeError("RESOURCE_EXHAUSTED: fake OOM")
        return p

    def consume(idx, item, prepared, result):
        done.append(item)

    skipped = []

    def on_err(idx, item, err):
        assert "RESOURCE_EXHAUSTED" in str(err)
        skipped.append(item)
        return True

    stats = run_pipeline(range(9), lambda x: x, dispatch, consume, on_batch_error=on_err)
    assert sorted(done) == [1, 2, 4, 5, 7, 8]
    assert sorted(skipped) == [0, 3, 6]
    assert stats.failed == 3 and stats.batches == 6


def test_pipeline_on_batch_error_rethrow():
    def on_err(idx, item, err):
        return False  # not an OOM: abort the run

    with pytest.raises(RuntimeError, match="hard"):
        run_pipeline(
            range(4),
            lambda x: x,
            lambda p: (_ for _ in ()).throw(RuntimeError("hard")),
            lambda *a: None,
            on_batch_error=on_err,
        )


def test_extract_pipelined_matches_serial(tmp_path):
    """The CLI's pipelined default writes byte-identical results to --serial."""
    import argparse

    import torch

    from tests.conftest import add_reference_to_path

    add_reference_to_path()
    from esm.model.esm2 import ESM2 as RefESM2

    from esm_tpu.cli import extract

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
    ckpt = tmp_path / "esm2_t2_rt_UR50D.pt"
    torch.save({"cfg": {"model": cfg}, "model": state}, ckpt)
    torch.save({"model": {}}, tmp_path / "esm2_t2_rt_UR50D-contact-regression.pt")

    fasta = "/root/reference/examples/data/few_proteins.fasta"
    base = [str(ckpt), fasta, "", "--repr_layers", "-1", "--include", "mean",
            "per_tok", "--npz", "--toks_per_batch", "256"]

    for mode, extra in (("pipe", []), ("serial", ["--serial"])):
        argv = list(base)
        argv[2] = str(tmp_path / mode)
        extract.run(extract.create_parser().parse_args(argv + extra))

    import esm_tpu

    labels = [label for label, _ in esm_tpu.read_fasta(fasta)]
    assert labels
    for label in labels:
        a = np.load(tmp_path / "pipe" / f"{label}.npz")
        b = np.load(tmp_path / "serial" / f"{label}.npz")
        assert set(a.files) == set(b.files)
        for k in a.files:
            if a[k].dtype.kind in "fc":
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{label}/{k}")


def test_extract_device_means_match_host(tmp_path):
    """--include mean/bos without per_tok reduces on device; must equal the
    host-side mean over real tokens (incl. truncation and --bucket padding)."""
    import argparse

    import torch

    from tests.conftest import add_reference_to_path

    add_reference_to_path()
    from esm.model.esm2 import ESM2 as RefESM2

    from esm_tpu.cli import extract

    torch.manual_seed(1)
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
    ckpt = tmp_path / "esm2_t2_dm_UR50D.pt"
    torch.save({"cfg": {"model": cfg}, "model": state}, ckpt)
    torch.save({"model": {}}, tmp_path / "esm2_t2_dm_UR50D-contact-regression.pt")

    fasta = tmp_path / "in.fasta"
    fasta.write_text(
        ">a\nMKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVATPRGYVLAGG\n"
        ">b\nKALTARQQEVFDLIRD\n"
        ">c\nLAGVSERTIDPKQNFYMHWCLAGVSERTID\n"
    )
    # truncation shorter than sequence 'a' exercises min(len, trunc) on device
    common = [str(ckpt), str(fasta), "", "--npz", "--repr_layers", "0", "-1",
              "--truncation_seq_length", "24", "--bucket"]

    a1 = extract.create_parser().parse_args(
        common[:3] + ["--include", "mean", "bos"] + common[3:]
    )
    a1.output_dir = tmp_path / "device"
    extract.run(a1)

    a2 = extract.create_parser().parse_args(
        common[:3] + ["--include", "mean", "bos", "per_tok"] + common[3:]
    )
    a2.output_dir = tmp_path / "host"
    extract.run(a2)

    for label in ("a", "b", "c"):
        d = np.load(tmp_path / "device" / f"{label}.npz")
        h = np.load(tmp_path / "host" / f"{label}.npz")
        for layer in (0, 2):
            np.testing.assert_allclose(
                d[f"mean_representations_{layer}"],
                h[f"mean_representations_{layer}"],
                atol=1e-5, rtol=1e-5, err_msg=f"{label} mean L{layer}",
            )
            np.testing.assert_array_equal(
                d[f"bos_representations_{layer}"],
                h[f"bos_representations_{layer}"],
                err_msg=f"{label} bos L{layer}",
            )


def test_pipeline_abort_stops_producer():
    """A fatal error must stop the prepare thread promptly instead of
    tokenizing every remaining item."""
    prepared_count = [0]

    def prepare(x):
        prepared_count[0] += 1
        time.sleep(0.002)
        return x

    def dispatch(p):
        if p == 3:
            raise RuntimeError("fatal")
        return p

    with pytest.raises(RuntimeError, match="fatal"):
        run_pipeline(range(500), prepare, dispatch, lambda *a: None, prefetch=2)
    assert prepared_count[0] < 50  # not all 500
