"""Protein-programming-language example (script form of the reference's
examples/protein-programming-language/programs/symmetric_monomer.py): design
a single chain of N identical repeats arranged in a symmetric ring,
maximizing pTM/pLDDT with a symmetry energy."""

import argparse
import logging

import jax

from esm_tpu import pretrained
from esm_tpu.apps import ppl

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--protomer-length", type=int, default=50)
    parser.add_argument("--num-protomers", type=int, default=3)
    parser.add_argument("--steps", type=int, default=2000)
    args = parser.parse_args()

    cfg, params, alphabet = pretrained.esmfold_v1()
    callback = ppl.ESMFoldCallback(params, cfg, num_recycles=1)

    program = ppl.symmetric_monomer(
        args.num_protomers, protomer_length=args.protomer_length
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
