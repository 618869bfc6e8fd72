"""Unsupervised contact prediction (script form of the reference's
examples/contact_prediction.ipynb): predict contacts for sequences from an MSA
file with ESM-2 or the MSA Transformer and report long-range precision@L."""

import argparse

import numpy as np

import esm_tpu
from esm_tpu import pretrained
from esm_tpu.metrics import contact_precision as compute_precisions


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="esm2_t33_650M_UR50D")
    parser.add_argument("--fasta", default="/root/reference/examples/data/few_proteins.fasta")
    parser.add_argument("--msa", default=None, help=".a3m file for the MSA Transformer")
    parser.add_argument("--msa-depth", type=int, default=64)
    parser.add_argument(
        "--msa-select", choices=["greedy", "first"], default="greedy",
        help="subsampling: diversity-maximizing greedy_select (the reference "
        "notebook's methodology) or the first N rows",
    )
    parser.add_argument(
        "--targets-npz", default=None,
        help=".npz of {label: LxL binary contact map} to score precision@L against",
    )
    args = parser.parse_args()
    targets = dict(np.load(args.targets_npz)) if args.targets_npz else None

    model, alphabet = pretrained.load_model_and_alphabet(args.model)

    if model.kind == "msa":
        assert args.msa, "MSA Transformer needs --msa"
        full_msa = esm_tpu.read_msa(args.msa)
        if args.msa_select == "greedy":
            msa = esm_tpu.greedy_select(full_msa, num_seqs=args.msa_depth)
        else:
            msa = full_msa[: args.msa_depth]
        _, _, tokens = alphabet.get_batch_converter()([msa])
        contacts = np.asarray(model(tokens, return_contacts=True)["contacts"])[0]
        print(f"{msa[0][0]}: predicted {contacts.shape} contact map")
    else:
        seqs = list(esm_tpu.read_fasta(args.fasta))
        _, _, tokens = alphabet.get_batch_converter()(seqs)
        contacts = np.asarray(model(tokens, return_contacts=True)["contacts"])
        for k, (label, seq) in enumerate(seqs):
            c = contacts[k, : len(seq), : len(seq)]
            if targets is not None and label in targets:
                p_at_l = compute_precisions(c, targets[label])
                print(f"{label}: long-range precision@L = {p_at_l:.3f}")
                continue
            print(f"{label}: top contact pairs:")
            L = len(seq)
            i, j = np.triu_indices(L, k=6)
            order = np.argsort(-c[i, j])[:10]
            for o in order:
                print(f"  {i[o]:4d} - {j[o]:4d}  p={c[i[o], j[o]]:.3f}")


if __name__ == "__main__":
    main()
