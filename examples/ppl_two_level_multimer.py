"""Protein-programming-language example (script form of the reference's
examples/protein-programming-language/programs/symmetric_two_level_multimer.py):
two-level symmetry — a shared protomer repeated into symmetric chains, and
the chains arranged into a symmetric multimer (chain breaks via the +1000
residue-index skip)."""

import argparse
import logging

from esm_tpu import pretrained
from esm_tpu.apps import ppl

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-chains", type=int, default=2)
    parser.add_argument("--protomers-per-chain", type=int, default=3)
    parser.add_argument("--protomer-length", type=int, default=50)
    parser.add_argument("--steps", type=int, default=2000)
    args = parser.parse_args()

    cfg, params, alphabet = pretrained.esmfold_v1()
    callback = ppl.ESMFoldCallback(params, cfg, num_recycles=1)

    program = ppl.symmetric_two_level_multimer(
        args.num_chains, args.protomers_per_chain, args.protomer_length
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
