"""MSA reading + greedy diversity subsampling (esm_tpu/data/msa.py).

Oracle: a direct per-step recomputation of the documented selection rule
(mean hamming distance to the selected set, earliest-row tie-break), checked
against the vectorized running-sum implementation.
"""

import numpy as np
import pytest

from esm_tpu.data import greedy_select, read_msa, remove_insertions

AAS = "ACDEFGHIKLMNPQRSTVWY"


def _random_msa(rng, n, L):
    return [
        (f"seq{i}", "".join(rng.choice(list(AAS)) for _ in range(L)))
        for i in range(n)
    ]


def _oracle_select(msa, num_seqs, mode):
    # Exact arithmetic (Fraction) so ties resolve by candidate order, not by
    # float accumulation order.
    from fractions import Fraction

    rows = np.array([list(s) for _, s in msa], dtype="S1").view(np.uint8)
    L = rows.shape[1]
    sel = [0]
    while len(sel) < num_seqs:
        rem = [i for i in range(len(msa)) if i not in sel]
        means = [
            sum(Fraction(int((rows[i] != rows[j]).sum()), L) for j in sel)
            / len(sel)
            for i in rem
        ]
        opt = max(means) if mode == "max" else min(means)
        sel.append(rem[means.index(opt)])
    return sorted(sel)


@pytest.mark.parametrize("mode", ["max", "min"])
def test_greedy_select_matches_bruteforce(mode):
    rng = np.random.RandomState(0)
    msa = _random_msa(rng, n=40, L=23)
    got = greedy_select(msa, num_seqs=10, mode=mode)
    want = [msa[i] for i in _oracle_select(msa, 10, mode)]
    assert got == want


def test_greedy_select_with_duplicate_rows():
    # Duplicates force distance ties — the earliest row must win.
    rng = np.random.RandomState(1)
    base = _random_msa(rng, n=6, L=11)
    msa = base + [(f"dup{i}", s) for i, (_, s) in enumerate(base)]
    got = greedy_select(msa, num_seqs=5)
    want = [msa[i] for i in _oracle_select(msa, 5, "max")]
    assert got == want


def test_greedy_select_passthrough_and_validation():
    msa = [("a", "AC"), ("b", "AD")]
    assert greedy_select(msa, num_seqs=2) == msa
    assert greedy_select(msa, num_seqs=5) == msa
    with pytest.raises(ValueError):
        greedy_select(msa, num_seqs=1, mode="median")


def test_greedy_select_keeps_query_and_original_order():
    rng = np.random.RandomState(2)
    msa = _random_msa(rng, n=30, L=17)
    got = greedy_select(msa, num_seqs=8)
    assert len(got) == 8
    assert msa[0] in got  # query retained
    positions = [msa.index(p) for p in got]
    assert positions == sorted(positions)


def test_read_msa_removes_insertions(tmp_path):
    p = tmp_path / "toy.a3m"
    p.write_text(">query\nMKVL\n>hit1\nM-kVL*\n>hit2\nm.KV.L\n")
    msa = read_msa(p)
    assert msa == [("query", "MKVL"), ("hit1", "M-VL"), ("hit2", "KVL")]
    assert remove_insertions("Ab.C*d") == "AC"


def test_spearman_matches_scipy():
    from scipy.stats import spearmanr

    from esm_tpu.metrics import spearman

    rng = np.random.RandomState(0)
    for _ in range(5):
        x = rng.randint(0, 8, 200).astype(float)  # heavy ties
        y = x * 0.5 + rng.randn(200)
        x[rng.randint(0, 200, 5)] = np.nan  # dropped pairs
        keep = np.isfinite(x)
        want = spearmanr(x[keep], y[keep]).statistic
        assert abs(spearman(x, y) - want) < 1e-12

    with pytest.raises(ValueError):
        spearman([1.0], [2.0])
    with pytest.raises(ValueError):
        spearman([1.0, 2.0], [1.0, 2.0, 3.0])
