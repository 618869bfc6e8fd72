"""Fixed-backbone LM design example (script form of the reference's
examples/lm-design): run an MCMC chain over the masked-LM energy.

The whole chain executes on-device as one scan — pick num_iter freely."""

import argparse

import jax

from esm_tpu import pretrained
from esm_tpu.apps import lm_design


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="esm2_t33_650M_UR50D")
    parser.add_argument("--seed-seq", default="MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVATPRGYVLAGG")
    parser.add_argument("--num-iter", type=int, default=5000)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--temperature", type=float, default=0.1)
    args = parser.parse_args()

    model, alphabet = pretrained.load_model_and_alphabet(args.model)
    designer = lm_design.Designer(model.params, model.cfg, alphabet)
    seqs, energies, acc = designer.design(
        args.seed_seq,
        lm_design.DesignConfig(
            num_iter=args.num_iter, temperature=args.temperature
        ),
        batch=args.batch,
    )
    print(f"acceptance rate: {acc:.2%}")
    for i, s in enumerate(seqs):
        # energies[t] is the energy of the state ENTERING step t; the final
        # accepted design's energy is one step ahead of the trace
        print(f"design {i}: E_trace_end={float(energies[-1, i]):.4f}  {s}")


if __name__ == "__main__":
    main()
