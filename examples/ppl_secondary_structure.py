"""Protein-programming-language example (script form of the reference's
examples/protein-programming-language/programs/secondary_structure.py):
hallucinate a two-segment protein while steering each segment's secondary
structure ('a' helix, 'b' strand, 'c' coil)."""

import argparse
import logging

from esm_tpu import pretrained
from esm_tpu.apps import ppl

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--node1-sse", default="a", choices=["a", "b", "c"])
    parser.add_argument("--node2-sse", default="b", choices=["a", "b", "c"])
    parser.add_argument("--segment-length", type=int, default=50)
    parser.add_argument("--steps", type=int, default=2000)
    args = parser.parse_args()

    cfg, params, alphabet = pretrained.esmfold_v1()
    callback = ppl.ESMFoldCallback(params, cfg, num_recycles=1)

    program = ppl.secondary_structure(
        args.node1_sse, args.node2_sse, segment_length=args.segment_length
    )

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
