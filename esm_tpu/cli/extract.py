"""esm-extract: bulk embedding extraction from FASTA.

Reference semantics: scripts/extract.py — token-budget batching, negative
repr-layer resolution, per-sequence output files with per_tok/mean/bos
selections truncated to real length, optional contacts.

Outputs are .pt files (torch.save, bit-compatible with the reference tooling)
by default, or .npz with --npz.
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def create_parser():
    parser = argparse.ArgumentParser(
        description="Run a protein LM over every sequence in a FASTA file and "
        "save the selected embeddings/outputs to one file per sequence"
    )
    parser.add_argument(
        "model_location",
        type=str,
        help="registry name of a released model (downloaded and cached), or a "
        "path to a local .pt checkpoint",
    )
    parser.add_argument("fasta_file", type=pathlib.Path, help="input sequences, FASTA format")
    parser.add_argument("output_dir", type=pathlib.Path, help="directory that receives one output file per sequence")
    parser.add_argument("--toks_per_batch", type=int, default=4096, help="token budget per batch (caps max_len * batch_size)")
    parser.add_argument(
        "--repr_layers",
        type=int,
        default=[-1],
        nargs="+",
        help="which layers' hidden states to save; 0..num_layers inclusive, "
        "negatives count back from the last layer",
    )
    parser.add_argument(
        "--include",
        type=str,
        nargs="+",
        choices=["mean", "per_tok", "bos", "contacts"],
        help="what to write per sequence: full per-residue embeddings, their "
        "mean over the sequence, the BOS embedding, and/or the contact map",
        required=True,
    )
    parser.add_argument(
        "--truncation_seq_length",
        type=int,
        default=1022,
        help="clip sequences to at most this many residues before the forward pass",
    )
    parser.add_argument("--npz", action="store_true", help="write .npz instead of torch .pt files")
    parser.add_argument(
        "--fp32-precision", action="store_true",
        help="force float32 matmul precision (parity-grade numerics on TPU; slower)",
    )
    parser.add_argument("--nogpu", action="store_true", help="run on the host CPU even when an accelerator is present")
    parser.add_argument(
        "--profile-trace", type=str, default=None, metavar="LOGDIR",
        help="capture a jax.profiler trace of the run (view in TensorBoard)",
    )
    parser.add_argument(
        "--bucket", action="store_true",
        help="pad batches to shape buckets (T to 128-multiples, B to powers "
        "of two) so bulk jobs reuse a few compiled programs instead of "
        "recompiling per exact batch shape (recommended on TPU)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="weight-only int8 quantization (halves parameter HBM; 15B fits "
        "one 16GB chip — the reference needs FSDP CPU offload for that)",
    )
    parser.add_argument(
        "--serial", action="store_true",
        help="disable the host/device pipeline (tokenize, forward, readback "
        "and write strictly in sequence, like the reference CLI)",
    )
    parser.add_argument(
        "--writers", type=int, default=2,
        help="output-writer threads for the pipelined path",
    )
    return parser


def run(args):
    import jax

    from .. import pretrained
    from ..data import FastaBatchedDataset

    if args.nogpu:
        jax.config.update("jax_platforms", "cpu")
    if args.fp32_precision:
        # TPU fp32 matmuls round through bf16 by default; HIGHEST precision is
        # required for parity-grade outputs (see PARITY.md)
        jax.config.update("jax_default_matmul_precision", "float32")

    model, alphabet = pretrained.load_model_and_alphabet(args.model_location)
    if args.int8:
        model = model.quantized()
    if args.profile_trace:
        jax.profiler.start_trace(args.profile_trace)

    dataset = FastaBatchedDataset.from_file(args.fasta_file)
    batches = dataset.get_batch_indices(args.toks_per_batch, extra_toks_per_seq=1)
    batch_converter = alphabet.get_batch_converter(
        args.truncation_seq_length, pad_to_multiple=8
    )
    print(f"Read {args.fasta_file} with {len(dataset)} sequences")

    args.output_dir.mkdir(parents=True, exist_ok=True)
    return_contacts = "contacts" in args.include

    assert all(-(model.num_layers + 1) <= i <= model.num_layers for i in args.repr_layers)
    repr_layers = [
        (i + model.num_layers + 1) % (model.num_layers + 1) for i in args.repr_layers
    ]

    def bucketed(toks):
        """Pad (B, T) up to shape buckets so heterogeneous FASTA batches reuse
        a handful of compiled programs instead of one per exact shape (XLA
        recompiles per shape; on TPU a compile costs minutes). T pads to the
        next multiple of 128, B to the next power of two — padded rows are
        copies of row 0 (numerically inert, discarded on output)."""
        b, t = toks.shape
        tp = min(-(-t // 128) * 128, _round_up_cap)
        bp = 1 << (b - 1).bit_length()
        toks = np.pad(np.asarray(toks), ((0, 0), (0, tp - t)),
                      constant_values=alphabet.padding_idx)
        if bp != b:
            toks = np.concatenate([toks, np.repeat(toks[:1], bp - b, axis=0)])
        return toks, b

    _round_up_cap = -(-(args.truncation_seq_length + 2) // 128) * 128

    def prepare(batch):
        labels, strs, toks = batch_converter([dataset[i] for i in batch])
        if args.bucket:
            toks, _ = bucketed(toks)
        return labels, strs, toks

    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("trunc",))
    def _device_means(reps, lengths, trunc):
        """Masked mean over real tokens (positions 1..len), on device.

        Readback over the host link is the bulk-extraction bottleneck when
        only reduced representations are requested: this shrinks the pulled
        tensor from (B, T, D) to (B, D) per layer."""
        t0 = next(iter(reps.values()))
        pos = jnp.arange(t0.shape[1])
        n = jnp.minimum(lengths, trunc)
        mask = ((pos[None, :] >= 1) & (pos[None, :] < (n + 1)[:, None]))[..., None]
        return {
            layer: jnp.sum(t * mask, axis=1) / n[:, None].astype(t.dtype)
            for layer, t in reps.items()
        }

    want_per_tok = "per_tok" in args.include
    want_mean = "mean" in args.include
    want_bos = "bos" in args.include

    dispatched = [0]

    def dispatch(prepared):
        labels, strs, toks = prepared
        # progress is printed here (the caller thread dispatches in batch
        # order) so lines stay monotonic even with concurrent writer threads
        dispatched[0] += 1
        print(
            f"Processing {dispatched[0]} of {len(batches)} batches ({len(labels)} sequences)"
        )
        # async XLA dispatch: returns device values without blocking
        out = model(toks, repr_layers=repr_layers, return_contacts=return_contacts)
        reps = out["representations"]
        result = {}
        if want_per_tok:
            result["representations"] = reps
        if want_bos:
            result["bos"] = {layer: t[:, 0] for layer, t in reps.items()}
        if want_mean:
            if want_per_tok:
                pass  # host computes the mean from the per-token pull below
            else:
                lengths = np.ones((toks.shape[0],), np.int32)  # padded rows
                lengths[: len(strs)] = [len(s) for s in strs]
                result["mean"] = _device_means(
                    reps, jnp.asarray(lengths), args.truncation_seq_length
                )
        if return_contacts:
            result["contacts"] = out["contacts"]
        return result

    def consume(batch_idx, batch, prepared, out):
        labels, strs, _ = prepared
        _write_batch(labels, strs, out)

    def _write_batch(labels, strs, out):
        # np.asarray on a device value is the synchronization point (readback)
        representations = {
            layer: np.asarray(t) for layer, t in out.get("representations", {}).items()
        }
        device_means = {
            layer: np.asarray(t) for layer, t in out.get("mean", {}).items()
        }
        device_bos = {layer: np.asarray(t) for layer, t in out.get("bos", {}).items()}
        if return_contacts:
            contacts = np.asarray(out["contacts"])

        for i, label in enumerate(labels):
            output_file = args.output_dir / f"{label}.{'npz' if args.npz else 'pt'}"
            output_file.parent.mkdir(parents=True, exist_ok=True)
            truncate_len = min(args.truncation_seq_length, len(strs[i]))
            result = {"label": label}
            if "per_tok" in args.include:
                result["representations"] = {
                    layer: t[i, 1 : truncate_len + 1].copy()
                    for layer, t in representations.items()
                }
            if "mean" in args.include:
                result["mean_representations"] = (
                    {
                        layer: t[i, 1 : truncate_len + 1].mean(0)
                        for layer, t in representations.items()
                    }
                    if want_per_tok
                    else {layer: t[i].copy() for layer, t in device_means.items()}
                )
            if "bos" in args.include:
                result["bos_representations"] = {
                    layer: t[i].copy() for layer, t in device_bos.items()
                }
            if return_contacts:
                result["contacts"] = contacts[i, :truncate_len, :truncate_len].copy()

            if args.npz:
                flat = {"label": label}
                for key in ("representations", "mean_representations", "bos_representations"):
                    if key in result:
                        for layer, t in result[key].items():
                            flat[f"{key}_{layer}"] = t
                if "contacts" in result:
                    flat["contacts"] = result["contacts"]
                np.savez(output_file, **flat)
            else:
                import torch

                torch_result = {
                    k: (
                        {kk: torch.from_numpy(np.asarray(vv)) for kk, vv in v.items()}
                        if isinstance(v, dict)
                        else (torch.from_numpy(np.asarray(v)) if not isinstance(v, str) else v)
                    )
                    for k, v in result.items()
                }
                torch.save(torch_result, output_file)

    if args.serial:
        # reference-style strictly sequential loop (scripts/extract.py:88-131)
        for batch_idx, batch in enumerate(batches):
            prepared = prepare(batch)
            consume(batch_idx, batch, prepared, dispatch(prepared))
    else:
        from ..runtime import run_pipeline

        stats = run_pipeline(
            batches, prepare, dispatch, consume,
            prefetch=2, in_flight=2, writers=args.writers,
        )
        print("Pipeline:", stats.summary())

    if args.profile_trace:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {args.profile_trace}")
    print(f"Saved results to {args.output_dir}")


def main():
    args = create_parser().parse_args()
    run(args)


if __name__ == "__main__":
    main()
