"""Inverse-folding sequence scoring CLI.

Reference semantics: examples/inverse_folding/score_log_likelihoods.py —
score sequences from a FASTA against a backbone, CSV output.
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path


def create_parser():
    parser = argparse.ArgumentParser(
        description="Score sequences based on a given structure."
    )
    parser.add_argument("pdbfile", type=str, help="input filepath, either .pdb or .cif")
    parser.add_argument("seqfile", type=str, help="input filepath for variant sequences in fasta format")
    parser.add_argument("--chain", type=str, help="chain id for the chain of interest", default=None)
    parser.add_argument("--outpath", type=str, help="output filepath for scores of variant sequences", default="output/sequence_scores.csv")
    parser.add_argument("--model", type=str, default="esm_if1_gvp4_t16_142M_UR50")
    parser.add_argument(
        "--multichain-backbone", action="store_true",
        help="use the backbones of all chains in the input for conditioning"
    )
    parser.add_argument("--nogpu", action="store_true")
    return parser


def run(args):
    import jax

    from .. import pretrained
    from ..data import read_fasta
    from ..models.inverse_folding import multichain, util

    if args.nogpu:
        jax.config.update("jax_platforms", "cpu")

    model, alphabet = pretrained.load_model_and_alphabet(args.model)

    seqs = list(read_fasta(args.seqfile))
    outpath = Path(args.outpath)
    outpath.parent.mkdir(parents=True, exist_ok=True)

    with open(outpath, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["seqid", "log_likelihood", "log_likelihood_withcoord"])
        if args.multichain_backbone:
            structure = util.load_structure(args.pdbfile)
            coords, native_seqs = multichain.extract_coords_from_complex(structure)
            target_chain = args.chain or next(iter(coords))
            for header, seq in seqs:
                ll, llc = multichain.score_sequence_in_complex(
                    model.params, model.cfg, alphabet, coords, target_chain, seq
                )
                writer.writerow([header, ll, llc])
                print(f"{header}: {ll:.3f} (full) {llc:.3f} (with coords)")
        else:
            coords, _ = util.load_coords(args.pdbfile, args.chain)
            for header, seq in seqs:
                ll, llc = model.score_sequence(coords, seq)
                writer.writerow([header, ll, llc])
                print(f"{header}: {ll:.3f} (full) {llc:.3f} (with coords)")
    print(f"Results saved to {outpath}")


def main():
    run(create_parser().parse_args())


if __name__ == "__main__":
    main()
