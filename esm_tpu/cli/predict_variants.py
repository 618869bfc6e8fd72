"""Zero-shot variant effect prediction (DMS scoring).

Reference semantics: examples/variant-prediction/predict.py — strategies
wt-marginals (one pass), masked-marginals (one masked pass per position),
pseudo-ppl (per-variant masked scan); MSA Transformer path masks positions in
the first MSA row only.

TPU-first: the reference's per-position python loop of forward passes becomes
batched masked forwards — positions are masked in parallel across the batch
axis (same math, ~batch× fewer dispatches).
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def create_parser():
    parser = argparse.ArgumentParser(
        description="Label a deep mutational scan with predictions from an ensemble of ESM models."
    )
    parser.add_argument(
        "--model-location", type=str, help="PyTorch model file OR name of pretrained model",
        nargs="+", required=True,
    )
    parser.add_argument("--sequence", type=str, help="wild-type protein sequence the DMS variants mutate")
    parser.add_argument("--dms-input", type=pathlib.Path, help="input CSV with one row per variant")
    parser.add_argument("--mutation-col", type=str, default="mutant", help="column with mutations (like P76A)")
    parser.add_argument("--dms-output", type=pathlib.Path, help="where to write the input CSV augmented with a score column per model")
    parser.add_argument("--offset-idx", type=int, default=0, help="index of the first residue in the mutation notation (e.g. 1 when P76A means sequence position 75)")
    parser.add_argument(
        "--scoring-strategy", type=str, default="wt-marginals",
        choices=["wt-marginals", "pseudo-ppl", "masked-marginals"],
    )
    parser.add_argument("--msa-path", type=pathlib.Path, help="a3m alignment to subsample (MSA Transformer scoring only)")
    parser.add_argument("--msa-samples", type=int, default=400, help="number of sequences from the start of the MSA")
    parser.add_argument("--mask-batch", type=int, default=64, help="positions scored per device batch (masked-marginals)")
    parser.add_argument("--msa-mask-batch", type=int, default=8, help="positions per device batch for the MSA Transformer (each position replicates the whole MSA)")
    parser.add_argument("--nogpu", action="store_true")
    parser.add_argument(
        "--eval-column", type=str, default=None,
        help="DMS measurement column: after scoring, print each model's "
        "|spearman rho| against it (and the ensemble's, with multiple models)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="weight-only int8 quantization (15B zero-shot scoring on one chip)",
    )
    return parser


def wt_marginal_score(token_probs, idx, wt_enc, mt_enc, prepend_bos=1):
    """score = logp[mt] - logp[wt] at 0-based residue ``idx`` of one
    sequence's (T, V) log-probs (reference predict.py:107-115). The single
    source of this arithmetic — the esm-serve /score endpoint uses it too."""
    return float(
        token_probs[prepend_bos + idx, mt_enc]
        - token_probs[prepend_bos + idx, wt_enc]
    )


def label_row(row, sequence, token_probs, alphabet, offset_idx):
    """(reference predict.py:107-115)"""
    wt, idx, mt = row[0], int(row[1:-1]) - offset_idx, row[-1]
    assert sequence[idx] == wt, "The listed wildtype does not match the provided sequence"
    return wt_marginal_score(
        token_probs[0], idx, alphabet.get_idx(wt), alphabet.get_idx(mt),
        prepend_bos=1,
    )


def masked_marginals(model, alphabet, tokens, mask_batch: int = 64):
    """Batched masked-marginals: positions masked in parallel across the batch
    axis (math identical to reference predict.py:205-215)."""
    import jax

    L = tokens.shape[1]
    rows = []
    for start in range(0, L, mask_batch):
        idxs = np.arange(start, min(start + mask_batch, L))
        batch = np.repeat(tokens, len(idxs), axis=0)
        batch[np.arange(len(idxs)), idxs] = alphabet.mask_idx
        out = model(batch)
        logp = jax.nn.log_softmax(out["logits"], axis=-1)
        rows.append(np.asarray(logp)[np.arange(len(idxs)), idxs])
    return np.concatenate(rows, axis=0)[None]  # (1, L, V)


def msa_masked_marginals(model, alphabet, tokens, mask_batch: int = 8):
    """MSA variant: mask position i of the FIRST row only
    (reference predict.py:161-178)."""
    import jax

    L = tokens.shape[2]
    rows = []
    for start in range(0, L, mask_batch):
        idxs = np.arange(start, min(start + mask_batch, L))
        batch = np.repeat(tokens, len(idxs), axis=0)
        batch[np.arange(len(idxs)), 0, idxs] = alphabet.mask_idx
        out = model(batch)
        logp = jax.nn.log_softmax(out["logits"], axis=-1)
        rows.append(np.asarray(logp)[np.arange(len(idxs)), 0, idxs])
    return np.concatenate(rows, axis=0)[None]


def compute_pppl(row, sequence, model, alphabet, offset_idx, mask_batch: int = 64):
    """(reference predict.py:118-144), batched over positions."""
    import jax

    wt, idx, mt = row[0], int(row[1:-1]) - offset_idx, row[-1]
    assert sequence[idx] == wt
    sequence = sequence[:idx] + mt + sequence[idx + 1 :]
    _, _, tokens = alphabet.get_batch_converter()([("protein1", sequence)])

    total = 0.0
    # reference iterates i in range(1, len(sequence) - 1)
    positions = np.arange(1, len(sequence) - 1)
    for start in range(0, len(positions), mask_batch):
        idxs = positions[start : start + mask_batch]
        batch = np.repeat(tokens, len(idxs), axis=0)
        batch[np.arange(len(idxs)), idxs] = alphabet.mask_idx
        logp = jax.nn.log_softmax(model(batch)["logits"], axis=-1)
        logp = np.asarray(logp)
        for k, i in enumerate(idxs):
            total += logp[k, i, alphabet.get_idx(sequence[i])]
    return float(total)


def read_msa(path, nseq):
    # data.msa.read_msa removes lowercase AND '.'/'*' insertion characters
    # (reference predict.py remove_insertions) — keep-insertions-only
    # stripping leaves '.' rows unaligned or mis-tokenized
    from ..data import read_msa as _read_msa

    return _read_msa(path)[:nseq]


def run(args):
    import jax
    import pandas as pd

    from .. import pretrained

    if args.nogpu:
        jax.config.update("jax_platforms", "cpu")

    df = pd.read_csv(args.dms_input)

    for model_location in args.model_location:
        model, alphabet = pretrained.load_model_and_alphabet(model_location)
        if args.int8:
            model = model.quantized()
        batch_converter = alphabet.get_batch_converter()

        if model.kind == "msa":
            data = [read_msa(args.msa_path, args.msa_samples)]
            assert args.scoring_strategy == "masked-marginals", (
                "MSA Transformer only supports masked marginal strategy"
            )
            _, _, tokens = batch_converter(data)
            token_probs = msa_masked_marginals(model, alphabet, tokens, args.msa_mask_batch)
            df[model_location] = df.apply(
                lambda row: label_row(
                    row[args.mutation_col], args.sequence, token_probs, alphabet, args.offset_idx
                ),
                axis=1,
            )
        else:
            _, _, tokens = batch_converter([("protein1", args.sequence)])
            if args.scoring_strategy == "wt-marginals":
                logp = jax.nn.log_softmax(model(tokens)["logits"], axis=-1)
                token_probs = np.asarray(logp)
                df[model_location] = df.apply(
                    lambda row: label_row(
                        row[args.mutation_col], args.sequence, token_probs, alphabet, args.offset_idx
                    ),
                    axis=1,
                )
            elif args.scoring_strategy == "masked-marginals":
                token_probs = masked_marginals(model, alphabet, tokens, args.mask_batch)
                df[model_location] = df.apply(
                    lambda row: label_row(
                        row[args.mutation_col], args.sequence, token_probs, alphabet, args.offset_idx
                    ),
                    axis=1,
                )
            elif args.scoring_strategy == "pseudo-ppl":
                df[model_location] = df.apply(
                    lambda row: compute_pppl(
                        row[args.mutation_col], args.sequence, model, alphabet,
                        args.offset_idx, args.mask_batch,
                    ),
                    axis=1,
                )

    df.to_csv(args.dms_output)

    if args.eval_column:
        # Zero-shot evaluation in one flag (the reference computes this in a
        # separate notebook): |spearman rho| between each model's scores and
        # a measurement column — the paper's headline metric
        # (examples/variant-prediction/README.md "rho per protein").
        from ..metrics import spearman

        if args.eval_column not in df.columns:
            raise SystemExit(
                f"--eval-column {args.eval_column!r} not in {args.dms_input}"
            )
        target = df[args.eval_column].to_numpy(dtype=float)
        for model_location in args.model_location:
            rho = spearman(df[model_location].to_numpy(dtype=float), target)
            print(f"{model_location}: |rho| vs {args.eval_column} = {abs(rho):.4f}")
        if len(args.model_location) > 1:
            ens = np.mean(
                [df[m].to_numpy(dtype=float) for m in args.model_location], axis=0
            )
            rho = spearman(ens, target)
            print(f"ensemble({len(args.model_location)}): |rho| = {abs(rho):.4f}")


def main():
    run(create_parser().parse_args())


if __name__ == "__main__":
    main()
