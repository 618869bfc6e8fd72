"""Native C++ data loader (esm_tpu/native): parity with the pure-Python
paths on adversarial FASTA inputs, and the LUT batch tokenizer vs.
BatchConverter."""

import numpy as np
import pytest

from esm_tpu import native
from esm_tpu.data import Alphabet
from esm_tpu.data.fasta import FastaBatchedDataset

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _python_from_file(path, monkeypatch):
    """Force the pure-Python fallback parser."""
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(native, "parse_fasta", lambda _: None)
        return FastaBatchedDataset.from_file(path)


TRICKY = (
    "junk-before-header\n"       # reference quirk: attaches to record 1
    ">seq1 description here\n"
    "MKTV\n"
    "  RQER \n"                  # per-line strip keeps interior, trims edges
    "\n"                         # blank line
    ">\n"                        # empty header -> seqnum by 0-based line idx
    "AAAA\r\n"                   # CRLF
    ">   \n"                     # whitespace-only header -> seqnum too
    "CCCC\n"
    ">last"                      # header at EOF, no newline, no sequence
)


def _write(tmp_path, text, name="t.fasta"):
    p = tmp_path / name
    p.write_bytes(text.encode())
    return p


def test_parse_parity_tricky(tmp_path, monkeypatch):
    p = _write(tmp_path, TRICKY)
    ds_native = FastaBatchedDataset.from_file(p)
    ds_python = _python_from_file(p, monkeypatch)
    assert ds_native.sequence_labels == ds_python.sequence_labels
    assert ds_native.sequence_strs == ds_python.sequence_strs
    # spot-check the documented semantics
    assert ds_native.sequence_labels[0] == "seq1 description here"
    assert ds_native.sequence_strs[0] == "junk-before-headerMKTVRQER"
    assert ds_native.sequence_labels[1] == "seqnum000000005"
    assert ds_native.sequence_strs[1] == "AAAA"
    assert ds_native.sequence_labels[2] == "seqnum000000007"
    assert ds_native.sequence_labels[3] == "last"
    assert ds_native.sequence_strs[3] == ""


@pytest.mark.parametrize(
    "text",
    [
        "",                                  # empty file
        "no header at all\njust junk\n",     # zero records
        ">a\nAC\n",                          # minimal
        ">a\rAC\rGT\r",                      # lone-\r (old Mac) newlines
        ">a\nAC",                            # no trailing newline
        ">a\nAC\n>b\n>c\nGG\n",              # empty record in the middle
    ],
)
def test_parse_parity_cases(tmp_path, monkeypatch, text):
    p = _write(tmp_path, text)
    if text.count(">") == 0 and text:
        # both parsers yield zero records
        assert len(FastaBatchedDataset.from_file(p)) == 0
        assert len(_python_from_file(p, monkeypatch)) == 0
        return
    ds_native = FastaBatchedDataset.from_file(p)
    ds_python = _python_from_file(p, monkeypatch)
    assert ds_native.sequence_labels == ds_python.sequence_labels
    assert ds_native.sequence_strs == ds_python.sequence_strs


def test_duplicate_labels_raise(tmp_path):
    p = _write(tmp_path, ">a\nAC\n>a\nGT\n")
    with pytest.raises(AssertionError):
        FastaBatchedDataset.from_file(p)


def test_tokenize_batch_matches_batch_converter(tmp_path):
    alphabet = Alphabet.from_architecture("ESM-1b")
    seqs = ["MKTVRQERLK", "ACDEFGHIKLMNPQRSTVWY", "GG", "KLMNPQRSTVWYACDE"]
    text = "".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs))
    p = _write(tmp_path, text)
    ds = FastaBatchedDataset.from_file(p)
    assert hasattr(ds, "_seq_buf")

    trunc = 12
    converter = alphabet.get_batch_converter(trunc)
    _, _, want = converter([(l, s) for l, s in ds])

    # the alphabet's byte LUT (lazily built by encode)
    alphabet.encode("A")
    toks = native.tokenize_batch(
        ds._seq_buf,
        ds._seq_off,
        np.arange(len(ds)),
        alphabet._byte_lut,
        truncation=trunc,
        bos=alphabet.cls_idx if alphabet.prepend_bos else -1,
        eos=alphabet.eos_idx if alphabet.append_eos else -1,
        pad=alphabet.padding_idx,
        stride=want.shape[1],
    )
    np.testing.assert_array_equal(toks, np.asarray(want))


def test_tokenize_batch_unknown_byte_falls_back():
    seq = np.frombuffer(b"AC1DE", dtype=np.uint8)  # '1' is unmapped
    off = np.array([0, 5], dtype=np.int64)
    alphabet = Alphabet.from_architecture("ESM-1b")
    alphabet.encode("A")
    out = native.tokenize_batch(
        seq, off, [0], alphabet._byte_lut, bos=0, eos=2, pad=1
    )
    assert out is None


def test_large_roundtrip(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    aas = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    lines = []
    for i in range(500):
        n = int(rng.randint(1, 400))
        s = bytes(aas[rng.randint(0, 20, n)]).decode()
        # split across multiple lines like real FASTA
        lines.append(f">rec{i} x={i}\n")
        lines.extend(s[j:j + 60] + "\n" for j in range(0, len(s), 60))
    p = _write(tmp_path, "".join(lines))
    ds_native = FastaBatchedDataset.from_file(p)
    ds_python = _python_from_file(p, monkeypatch)
    assert ds_native.sequence_labels == ds_python.sequence_labels
    assert ds_native.sequence_strs == ds_python.sequence_strs
