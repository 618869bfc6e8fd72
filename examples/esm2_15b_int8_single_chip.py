"""ESM2-15B inference on ONE 16 GB TPU chip via weight-only int8.

The reference serves 15B on a single GPU only with fairscale FSDP CPU offload
(examples/esm2_infer_fairscale_fsdp_cpu_offloading.py) — weights stream
host<->device every layer. Here weights stay device-resident at half size:
symmetric per-output-channel int8 for every linear kernel, dequantized in the
matmul epilogue (esm_tpu/quantization.py). 15.1 GB of parameters, 4.3 seq/s
at L=1022 on one v5e chip.

For multi-chip sharding instead (TP/FSDP over a mesh), see
examples/esm2_infer_sharded.py — the two compose (int8 params shard too).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="esm2_t48_15B_UR50D")
    parser.add_argument(
        "--sequence",
        default="MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVATPRGYVLAGG",
    )
    args = parser.parse_args()

    import jax.numpy as jnp

    from esm_tpu import pretrained

    model, alphabet = pretrained.load_model_and_alphabet(args.model)
    model = model.with_options(compute_dtype=jnp.bfloat16, use_flash=True)
    model = model.quantized()  # weight-only int8: ~30 GB -> ~15 GB

    _, _, tokens = alphabet.get_batch_converter()([("protein", args.sequence)])
    out = model(tokens, repr_layers=[model.num_layers])
    emb = np.asarray(out["representations"][model.num_layers])
    print(f"logits {out['logits'].shape}; mean embedding[:4] =",
          emb[0, 1:-1].mean(0)[:4])


if __name__ == "__main__":
    main()
