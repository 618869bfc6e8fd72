"""Tokenizer parity: exact token tables and encodings vs. the reference
(mirrors reference tests/test_alphabet.py expectations, plus a direct
cross-check against the reference Alphabet implementation)."""

import numpy as np
import pytest

from esm_tpu.data import Alphabet
from tests.conftest import add_reference_to_path


def test_esm1b_alphabet_golden():
    a = Alphabet.from_architecture("ESM-1b")
    # Exact expected ids (same golden values as reference tests/test_alphabet.py)
    assert a.cls_idx == 0
    assert a.padding_idx == 1
    assert a.eos_idx == 2
    assert a.unk_idx == 3
    assert a.mask_idx == 32
    assert len(a) == 33
    assert a.get_tok(4) == "L"
    assert a.encode("LAGVS") == [4, 5, 6, 7, 8]
    # special token parsing
    assert a.encode("LA<mask>VS") == [4, 5, 32, 7, 8]
    # spaced tokens
    assert a.encode("L A G V S") == [4, 5, 6, 7, 8]


def test_esm1_alphabet_golden():
    a = Alphabet.from_architecture("ESM-1")
    assert a.padding_idx == 1
    assert a.eos_idx == 2
    assert a.unk_idx == 3
    assert a.get_tok(0) == "<null_0>"
    assert a.cls_idx == len(a) - 3
    assert a.mask_idx == len(a) - 2


@pytest.mark.parametrize(
    "arch", ["ESM-1", "ESM-1b", "msa_transformer", "invariant_gvp"]
)
def test_alphabet_matches_reference(arch):
    add_reference_to_path()
    from esm.data import Alphabet as RefAlphabet

    ours = Alphabet.from_architecture(arch)
    ref = RefAlphabet.from_architecture(arch)
    assert ours.all_toks == ref.all_toks
    assert ours.tok_to_idx == ref.tok_to_idx
    assert ours.prepend_bos == ref.prepend_bos
    assert ours.append_eos == ref.append_eos
    for s in ["LAGVS", "L A<mask> GVS", "KALTARQQEVFDLIRD", "XBUZO.-"]:
        assert ours.encode(s) == ref.encode(s), s


def test_batch_converter_matches_reference():
    add_reference_to_path()
    from esm.data import Alphabet as RefAlphabet

    ours = Alphabet.from_architecture("ESM-1b")
    ref = RefAlphabet.from_architecture("ESM-1b")
    batch = [("a", "KALTARQQEVFDLIRD"), ("b", "LAGVS"), ("c", "K A <mask> S")]
    _, _, ref_toks = ref.get_batch_converter()(batch)
    _, _, our_toks = ours.get_batch_converter()(batch)
    np.testing.assert_array_equal(our_toks, ref_toks.numpy())

    # truncation
    _, _, ref_toks = ref.get_batch_converter(truncation_seq_length=4)(batch)
    _, _, our_toks = ours.get_batch_converter(truncation_seq_length=4)(batch)
    np.testing.assert_array_equal(our_toks, ref_toks.numpy())


def test_msa_batch_converter_matches_reference():
    add_reference_to_path()
    from esm.data import Alphabet as RefAlphabet

    ours = Alphabet.from_architecture("msa_transformer")
    ref = RefAlphabet.from_architecture("msa_transformer")
    msa1 = [("s1", "LAGVS"), ("s2", "LAG-S"), ("s3", "-AGVS")]
    msa2 = [("t1", "KALT"), ("t2", "KA-T")]
    _, _, ref_toks = ref.get_batch_converter()([msa1, msa2])
    _, _, our_toks = ours.get_batch_converter()([msa1, msa2])
    np.testing.assert_array_equal(our_toks, ref_toks.numpy())


def test_pad_to_multiple():
    a = Alphabet.from_architecture("ESM-1b")
    from esm_tpu.data import BatchConverter

    bc = BatchConverter(a, pad_to_multiple=128)
    _, _, toks = bc([("a", "LAGVS")])
    assert toks.shape[1] == 128
    assert toks[0, 0] == a.cls_idx
    assert toks[0, 6] == a.eos_idx
    assert (toks[0, 7:] == a.padding_idx).all()


def test_encode_fast_path_matches_slow():
    """The byte-LUT fast path must agree with the reference-faithful
    tokenizer on every input class (and fall back where it can't apply)."""
    import random

    import pytest

    for arch in ("ESM-1", "ESM-1b", "msa_transformer", "invariant_gvp"):
        a = Alphabet.from_architecture(arch)
        slow = lambda s: [a.tok_to_idx[t] for t in a.tokenize(s)]
        random.seed(0)
        chars = [t for t in a.all_toks if len(t) == 1]
        for _ in range(25):
            s = "".join(random.choice(chars) for _ in range(random.randrange(0, 80)))
            assert a.encode(s) == slow(s), (arch, s)
        # special tokens / whitespace route through the slow path
        for s in ("LA<mask>VS", "L A G V S", "<mask>LAG", ""):
            assert a.encode(s) == slow(s), (arch, s)
        with pytest.raises(KeyError):
            a.encode("LAJGV")  # unknown residue: reference-faithful KeyError


def test_tokenizer_fuzz_vs_reference():
    """Randomized differential test: for every architecture, random residue
    strings (with interleaved special tokens and spaces for the HF-style
    tokenizer) must encode identically to the reference esm.data.Alphabet."""
    import random

    import numpy as np
    import sys

    sys.path.insert(0, "/root/reference")
    from esm.data import Alphabet as RefAlphabet

    from esm_tpu.data import Alphabet

    rng = random.Random(0)
    residues = "LAGVSERTIDPKQNFYMHWCXBUZO"
    for arch in ("ESM-1", "ESM-1b", "msa_transformer", "invariant_gvp"):
        ours, ref = Alphabet.from_architecture(arch), RefAlphabet.from_architecture(arch)
        assert ours.tok_to_idx == ref.tok_to_idx, arch
        for _ in range(50):
            n = rng.randint(1, 40)
            parts = []
            for _ in range(n):
                r = rng.random()
                if r < 0.08:
                    parts.append("<mask>")
                elif r < 0.12:
                    parts.append("<unk>")
                else:
                    parts.append(rng.choice(residues))
            s = "".join(parts)
            assert ours.tokenize(s) == ref.tokenize(s), (arch, s)
            np.testing.assert_array_equal(
                np.asarray(ours.encode(s)), np.asarray(ref.encode(s)), err_msg=f"{arch} {s}"
            )
