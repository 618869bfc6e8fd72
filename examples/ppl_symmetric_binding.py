"""Protein-programming-language example (script form of the reference's
examples/protein-programming-language/programs/symmetric_binding.py): a
symmetric ring of identical binder protomers, each scaffolding the same
constant binding-site motif.

The reference fetches PDB 1y6k (IL-10) from RCSB and slices the epitope at
residues 31-40. This environment has no network, so pass a locally
downloaded PDB file; the residue-range default matches the reference."""

import argparse
import logging

from esm_tpu import pretrained
from esm_tpu.apps import ppl

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pdbfile", help="structure holding the binding-site motif (reference uses 1y6k)")
    parser.add_argument("--chain", default=None)
    parser.add_argument("--site-start", type=int, default=31, help="first motif residue (author numbering)")
    parser.add_argument("--site-end", type=int, default=40, help="one past the last motif residue")
    parser.add_argument("--num-binding-sites", type=int, default=3)
    parser.add_argument("--flank-length", type=int, default=45)
    parser.add_argument("--steps", type=int, default=2000)
    args = parser.parse_args()

    site = ppl.pdb_file_to_atomview(args.pdbfile, chain=args.chain)
    program = ppl.symmetric_binding(
        site,
        residue_range=(args.site_start, args.site_end),
        num_binding_sites=args.num_binding_sites,
        flank_length=args.flank_length,
    )

    cfg, params, alphabet = pretrained.esmfold_v1()
    callback = ppl.ESMFoldCallback(params, cfg, num_recycles=1)

    state = ppl.run_simulated_annealing(
        program,
        callback,
        initial_temperature=1.0,
        annealing_rate=0.97,
        total_num_steps=args.steps,
    )
    print("best energy:", state.best_energy)
    print("best sequence:", state.best_sequence)


if __name__ == "__main__":
    main()
