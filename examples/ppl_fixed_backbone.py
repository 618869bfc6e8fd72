"""Protein-programming-language example (script form of the reference's
examples/protein-programming-language/programs/fixed_backbone.py): redesign a
sequence for a known backbone by minimizing cRMSD/dRMSD to a PDB template
while maximizing pTM/pLDDT. Template loading is biotite-free
(esm_tpu.data.pdb); pass any local PDB file."""

import argparse
import logging

from esm_tpu import pretrained
from esm_tpu.apps import ppl

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pdbfile", help="template PDB (e.g. a 6mrs download)")
    parser.add_argument("--chain", default=None)
    parser.add_argument("--steps", type=int, default=2000)
    args = parser.parse_args()

    template = ppl.pdb_file_to_atomview(args.pdbfile, chain=args.chain)
    sequence_length = len(ppl.sequence_from_atomview(template))

    cfg, params, alphabet = pretrained.esmfold_v1()
    callback = ppl.ESMFoldCallback(params, cfg, num_recycles=1)

    program = ppl.ProgramNode(
        sequence_segment=ppl.FixedLengthSequenceSegment(sequence_length),
        energy_function_terms=[
            ppl.MaximizePTM(),
            ppl.MaximizePLDDT(),
            ppl.MinimizeSurfaceHydrophobics(),
            ppl.MinimizeCRmsd(template=template, backbone_only=True),
            ppl.MinimizeDRmsd(template=template, backbone_only=True),
        ],
    )

    state = ppl.run_simulated_annealing(
        program,
        callback,
        initial_temperature=1.0,
        annealing_rate=0.97,
        total_num_steps=args.steps,
    )
    print("best sequence:", state.best_sequence)
    print("best energy:", state.best_energy)


if __name__ == "__main__":
    main()
