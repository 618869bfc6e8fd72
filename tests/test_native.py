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


def _python_from_file(path):
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


def test_parse_parity_tricky(tmp_path):
    p = _write(tmp_path, TRICKY)
    ds_native = FastaBatchedDataset.from_file(p)
    ds_python = _python_from_file(p)
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
def test_parse_parity_cases(tmp_path, text):
    p = _write(tmp_path, text)
    if text.count(">") == 0 and text:
        # both parsers yield zero records
        assert len(FastaBatchedDataset.from_file(p)) == 0
        assert len(_python_from_file(p)) == 0
        return
    ds_native = FastaBatchedDataset.from_file(p)
    ds_python = _python_from_file(p)
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

    toks = native.tokenize_batch(
        ds._seq_buf,
        ds._seq_off,
        np.arange(len(ds)),
        alphabet.byte_lut(),
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
    out = native.tokenize_batch(
        seq, off, [0], alphabet.byte_lut(), bos=0, eos=2, pad=1
    )
    assert out is None


def test_large_roundtrip(tmp_path):
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
    ds_python = _python_from_file(p)
    assert ds_native.sequence_labels == ds_python.sequence_labels
    assert ds_native.sequence_strs == ds_python.sequence_strs


def test_non_ascii_falls_back_to_exact_semantics(tmp_path):
    """Non-ASCII content must bypass the native path: byte offsets stop
    matching char offsets, and Python str.strip / strict text decode
    semantics differ (code-review findings on the first native version)."""
    # multi-byte UTF-8 in a header: labels after it must not shift
    p = tmp_path / "u.fasta"
    p.write_bytes(">prot\xc3\xa9ine one\nAC\n>second\nGT\n".encode("latin-1"))
    assert native.parse_fasta(p) is None
    ds = FastaBatchedDataset.from_file(p)
    assert ds.sequence_labels == ["protéine one", "second"]
    assert ds.sequence_strs == ["AC", "GT"]

    # invalid UTF-8 raises (text-mode parity), not silently mangled
    p2 = tmp_path / "bad.fasta"
    p2.write_bytes(b">a\nAC\xffGT\n")
    assert native.parse_fasta(p2) is None
    with pytest.raises(UnicodeDecodeError):
        FastaBatchedDataset.from_file(p2)


def test_ascii_separator_strip_parity(tmp_path):
    """\\x1c-\\x1f are stripped by Python str.strip(); the native trim must
    match."""
    p = _write(tmp_path, ">a\nAC\x1c\nGT\x1f\n")
    ds_native = FastaBatchedDataset.from_file(p)
    ds_python = _python_from_file(p)
    assert ds_native.sequence_strs == ds_python.sequence_strs == ["ACGT"]


def test_file_growth_between_passes_is_safe(tmp_path, monkeypatch):
    """If the file grows between the sizing and fill passes (concurrently
    appended shard), the C side must bounds-check and the wrapper must fall
    back — no out-of-bounds write."""
    import ctypes

    p = tmp_path / "grow.fasta"
    p.write_text(">a\nAC\n")
    lib = native._load()
    real = lib.esm_fasta_parse
    grown = {"done": False}

    def evil(path, n, lb, sb, label_buf, label_off, seq_buf, seq_off):
        if label_buf and not grown["done"]:
            # grow the file after sizing, before the fill pass
            grown["done"] = True
            p.write_text(">a\n" + "A" * 100000 + "\n>b\n" + "C" * 50000 + "\n")
        return real(path, n, lb, sb, label_buf, label_off, seq_buf, seq_off)

    monkeypatch.setattr(lib, "esm_fasta_parse", evil)
    assert native.parse_fasta(p) is None  # refused, not corrupted
    # and the subsequent (un-patched) parse sees the new content
    monkeypatch.undo()
    ds = FastaBatchedDataset.from_file(p)
    assert ds.sequence_labels == ["a", "b"]
    assert len(ds.sequence_strs[0]) == 100000
