"""Masked-LM pretraining / fine-tuning loop on a TPU mesh.

The reference framework is inference-only (SURVEY.md §1 — no trainer); this
example shows the full training story this framework adds: FASTA data with
token-budget batching and shape buckets, BERT-style masking, a pjit-sharded
AdamW step over a (data, fsdp, tp) mesh, gradient rematerialization for
depth-independent activation memory, and orbax checkpoint save.

Runs on any device set — virtual CPU mesh for a smoke test:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/pretrain_mlm.py --fasta my.fasta --steps 20 --cpu

or a real TPU slice (drop --cpu; the mesh factorization adapts to the
device count).
"""

from __future__ import annotations

import argparse
import itertools
import time


def create_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fasta", required=True, help="training sequences (FASTA)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--toks-per-batch", type=int, default=8192)
    p.add_argument("--truncation-seq-length", type=int, default=1022)
    p.add_argument("--num-layers", type=int, default=6)
    p.add_argument("--embed-dim", type=int, default=320)
    p.add_argument("--attention-heads", type=int, default=20)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--warmup-steps", type=int, default=10)
    p.add_argument(
        "--init-from", default=None,
        help="warm-start from a released checkpoint name/path (fine-tuning) "
        "instead of random init",
    )
    p.add_argument(
        "--remat", action="store_true",
        help="rematerialize layer bodies on backward (activation memory "
        "independent of depth; ~constant-factor extra compute)",
    )
    p.add_argument("--checkpoint-dir", default=None, help="orbax save path (final params)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    return p


def run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from esm_tpu import training
    from esm_tpu.data import Alphabet, FastaBatchedDataset
    from esm_tpu.models import esm2
    from esm_tpu.parallel.mesh import MeshConfig, make_mesh
    from esm_tpu.parallel.sharding import batch_sharding, shard_params

    n_dev = len(jax.devices())
    mesh = make_mesh(MeshConfig.for_devices(n_dev))
    print(f"devices: {n_dev}, mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    alphabet = Alphabet.from_architecture("ESM-1b")
    if args.init_from:
        from esm_tpu import pretrained

        model, alphabet = pretrained.load_model_and_alphabet(args.init_from)
        import dataclasses

        cfg = dataclasses.replace(model.cfg, remat=args.remat)
        params = model.params
        print(f"warm start from {args.init_from} ({cfg.num_layers} layers)")
    else:
        cfg = esm2.ESM2Config.from_alphabet(
            alphabet,
            num_layers=args.num_layers,
            embed_dim=args.embed_dim,
            attention_heads=args.attention_heads,
            remat=args.remat,
        )
        params = esm2.init(jax.random.PRNGKey(args.seed), cfg)

    dataset = FastaBatchedDataset.from_file(args.fasta)
    batches = dataset.get_batch_indices(args.toks_per_batch, extra_toks_per_seq=2)
    converter = alphabet.get_batch_converter(
        args.truncation_seq_length, pad_to_multiple=128
    )
    print(f"{len(dataset)} sequences, {len(batches)} batches/epoch")

    warmup = min(args.warmup_steps, max(1, args.steps // 5))
    tx = training.make_optimizer(
        args.lr, warmup_steps=warmup, total_steps=max(args.steps, warmup + 1)
    )
    state = training.init_state(params, tx)
    state = training.TrainState(
        shard_params(mesh, state.params), state.opt_state, state.step
    )

    rng = jax.random.PRNGKey(args.seed + 1)
    bsh = batch_sharding(mesh)
    dp = mesh.devices.shape[0] * mesh.devices.shape[1]  # data*fsdp rows
    t0 = time.perf_counter()
    tokens_seen = 0
    for step, batch in zip(range(args.steps), itertools.cycle(batches)):
        _, _, toks = converter([dataset[i] for i in batch])
        # pad the batch dim to a multiple of the data-parallel rows
        if toks.shape[0] % dp:
            pad = dp - toks.shape[0] % dp
            toks = np.concatenate([toks, np.repeat(toks[:1], pad, axis=0)])
        rng, step_rng = jax.random.split(rng)
        tokens_dev = jax.device_put(jnp.asarray(toks), bsh)
        state, metrics = training.train_step(state, cfg, tx, step_rng, tokens_dev)
        tokens_seen += int(np.prod(toks.shape))
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            loss = float(metrics["loss"])
            acc = float(metrics["acc"])
            rate = tokens_seen / (time.perf_counter() - t0)
            print(
                f"step {step + 1:5d}  loss {loss:7.4f}  masked-acc {acc:6.3f}  "
                f"{rate / 1e3:8.1f}k tok/s"
            )

    if args.checkpoint_dir:
        from esm_tpu.io.checkpoint import save_params

        save_params(args.checkpoint_dir, state.params)
        print(f"saved params to {args.checkpoint_dir}")
    return state


if __name__ == "__main__":
    run(create_parser().parse_args())
