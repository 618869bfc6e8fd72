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
    p.add_argument(
        "--save-every", type=int, default=0,
        help="also save the FULL train state (params+optimizer+step) every N "
        "steps to the sibling dir <checkpoint-dir>-state for --resume",
    )
    p.add_argument(
        "--resume", action="store_true",
        help="restore <checkpoint-dir>-state and continue; per-step rng is "
        "folded from the step index, so the resumed run is bit-exact",
    )
    p.add_argument(
        "--accum-steps", type=int, default=1,
        help="gradient accumulation: split each batch into N sequential "
        "microbatches (exact big-batch equivalence)",
    )
    p.add_argument("--grad-clip", type=float, default=None, help="global-norm gradient clip")
    p.add_argument(
        "--lora", type=int, default=0, metavar="RANK",
        help="parameter-efficient fine-tuning: freeze the base model and "
        "train rank-RANK LoRA adapters on the attention/MLP linears "
        "(esm_tpu.lora) — optimizer state covers only the adapters",
    )
    p.add_argument(
        "--lora-alpha", type=float, default=None,
        help="LoRA alpha; the adapter delta is scaled by alpha/rank "
        "(default: alpha = rank, i.e. scale 1)",
    )
    p.add_argument(
        "--lora-int8-base", action="store_true",
        help="with --lora: store the frozen base weight-only int8 "
        "(QLoRA-style; the int8 kernels feed the MXU directly) instead of "
        "the default bf16",
    )
    p.add_argument(
        "--lora-full-remat", action="store_true",
        help="with --lora: save NOTHING per layer on the forward "
        "(remat_policy='full') — minimum activation memory, ~1/3 extra "
        "FLOPs; fits 2x the batch at 3B (BENCH_NOTES)",
    )
    p.add_argument(
        "--adafactor", action="store_true",
        help="factored second-moment optimizer (state ~params/1000 instead "
        "of 2x params) — the long-context single-chip configuration: 650M "
        "L=8192 trains on one chip where AdamW runs out of memory",
    )
    p.add_argument(
        "--bf16-moments", action="store_true",
        help="store AdamW first moments in bfloat16 (halves optimizer HBM)",
    )
    p.add_argument(
        "--stop-after", type=int, default=0,
        help="exit after this step (simulated pre-emption; LR schedule still "
        "targets --steps, so a later --resume continues bit-exactly)",
    )
    p.add_argument("--eval-fasta", default=None, help="held-out FASTA for masked-ppl eval")
    p.add_argument("--eval-every", type=int, default=0, help="eval every N steps (and at the end)")
    p.add_argument(
        "--shuffle", action="store_true",
        help="deterministically shuffle batch order each epoch (seeded by "
        "(seed, epoch), so --resume stays bit-exact)",
    )
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
    mesh_cfg = MeshConfig.for_devices(n_dev)
    mesh = make_mesh(mesh_cfg)
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

    lora_mod = lora_scale = None
    if args.lora:
        import dataclasses

        from esm_tpu import lora as lora_mod

        if args.accum_steps > 1:
            raise SystemExit(
                "--lora does not compose with --accum-steps yet; LoRA's "
                "memory savings usually make accumulation unnecessary"
            )
        # the measured single-chip LoRA configuration (BENCH_NOTES "LoRA
        # fine-tuning"): bf16 compute + flash attention + remat, frozen base
        # stored bf16 (or int8) — a frozen base needs no fp32 master copy.
        # This is what makes `--init-from esm2_t36_3B_UR50D --lora 16` fit
        # one 16 GB chip.
        cfg = dataclasses.replace(
            cfg, compute_dtype=jnp.bfloat16, use_flash=True, remat=True,
            remat_policy="full" if args.lora_full_remat else "dots",
        )
        if args.lora_int8_base:
            from esm_tpu.quantization import quantize_params

            params = quantize_params(params)
        else:
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                params,
            )
        lora_scale = (
            args.lora_alpha if args.lora_alpha is not None else float(args.lora)
        ) / args.lora

    est_b = max(
        mesh_cfg.data * mesh_cfg.fsdp * args.accum_steps,
        args.toks_per_batch // (args.truncation_seq_length + 2),
    )
    try:
        if args.lora:
            from esm_tpu.parallel.memory_plan import plan_train_lora

            mp = plan_train_lora(
                cfg, mesh_cfg, est_b, args.truncation_seq_length + 2,
                rank=args.lora,
                base_dtype_bytes=1 if args.lora_int8_base else 2,
                remat_policy=cfg.remat_policy,
            )
            print(
                f"memory plan (LoRA, est. B={est_b}): "
                f"{mp['per_device_bytes']/1e9:.1f} GB/device of "
                f"{mp['hbm_bytes']/1e9:.1f} -> {mp['verdict']}"
                + ("  (hint: --lora-full-remat / --lora-int8-base)"
                   if mp["verdict"] != "fits" else "")
            )
        else:
            from esm_tpu.parallel.memory_plan import plan_train

            mp = plan_train(
                cfg, mesh_cfg, est_b, args.truncation_seq_length + 2,
                accum_steps=args.accum_steps,
                mu_dtype_bytes=2 if args.bf16_moments else 4,
            )
            print(
                f"memory plan (est. B={est_b}): {mp['per_device_bytes']/1e9:.1f} "
                f"GB/device of {mp['hbm_bytes']/1e9:.1f} -> {mp['verdict']}"
                + ("  (hint: --accum-steps / --bf16-moments / more devices)"
                   if mp["verdict"] != "fits" else "")
            )
    except Exception:  # the plan is advisory; never block training on it
        pass

    from esm_tpu.parallel.scaling import warn_if_inefficient

    # ICI-vs-MXU balance check for the chosen mesh (ARCHITECTURE.md scaling
    # model, in code): warns when the factorization is comm-bound or has no
    # nominal-MXU headroom at this width
    warn_if_inefficient(
        cfg, mesh_cfg, batch=est_b, seqlen=args.truncation_seq_length + 2,
        mode="train",
    )

    warmup = min(args.warmup_steps, max(1, args.steps // 5))
    tx = training.make_optimizer(
        args.lr, warmup_steps=warmup, total_steps=max(args.steps, warmup + 1),
        grad_clip_norm=args.grad_clip,
        mu_dtype=jnp.bfloat16 if args.bf16_moments else None,
        factored=args.adafactor,
    )
    # init on the already-sharded params so the optimizer moments are created
    # with the same mesh placement (zeros_like inherits sharding)
    placed_params = shard_params(mesh, params)
    if args.lora:
        from jax.sharding import NamedSharding, PartitionSpec

        adapters = lora_mod.init_lora(
            jax.random.PRNGKey(args.seed + 3), params, rank=args.lora
        )
        # adapters are tiny: replicate them on the mesh
        adapters = jax.device_put(
            adapters, NamedSharding(mesh, PartitionSpec())
        )
        n_base = sum(int(x.size) for x in jax.tree.leaves(params))
        print(
            f"LoRA rank {args.lora}: {lora_mod.num_params(adapters) / 1e6:.2f}M "
            f"trainable adapters on a frozen {n_base / 1e6:.0f}M base"
            + (" (int8)" if args.lora_int8_base else "")
        )
        state = training.init_state(adapters, tx)
    else:
        state = training.init_state(placed_params, tx)

    start_step = 0
    # sibling of the params dir: orbax's force-save replaces the whole params
    # directory, so the resumable state must not live inside it
    state_dir = f"{args.checkpoint_dir}-state" if args.checkpoint_dir else None
    if args.resume:
        from esm_tpu.io.checkpoint import load_train_state
        import os

        if not (state_dir and os.path.isdir(state_dir)):
            raise SystemExit(f"--resume: no saved state at {state_dir}")
        restored = load_train_state(state_dir, state)
        # re-place every restored leaf onto the fresh state's sharding
        # (leaves the optimizer init left unplaced get replicated on the mesh)
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(mesh, PartitionSpec())
        state = jax.tree.map(
            lambda ref, x: jax.device_put(
                jnp.asarray(x),
                ref.sharding
                if isinstance(ref.sharding, NamedSharding)
                else replicated,
            ),
            state, restored,
        )
        start_step = int(state.step)
        print(f"resumed from {state_dir} at step {start_step}")

    rng = jax.random.PRNGKey(args.seed + 1)
    bsh = batch_sharding(mesh)
    dp = mesh.devices.shape[0] * mesh.devices.shape[1]  # data*fsdp rows
    batch_mult = dp * args.accum_steps

    eval_batches = None
    if args.eval_fasta:
        eval_ds = FastaBatchedDataset.from_file(args.eval_fasta)
        eval_idx = eval_ds.get_batch_indices(args.toks_per_batch, extra_toks_per_seq=2)
        eval_batches = [converter([eval_ds[i] for i in b])[2] for b in eval_idx]

    def pad_batch(toks, mult):
        real_b = toks.shape[0]
        if real_b % mult:
            pad = mult - real_b % mult
            toks = np.concatenate([toks, np.repeat(toks[:1], pad, axis=0)])
        return toks, real_b

    def run_eval(step):
        nll = cnt = 0.0
        # patch once per eval call, not per batch — the adapters are
        # constant across the loop
        eval_params = (
            lora_mod.patch(placed_params, state.params, scale=lora_scale)
            if args.lora
            else state.params
        )
        for j, toks in enumerate(eval_batches):
            # eval never accumulates, so pad to the data-parallel rows only;
            # eval_step returns per-sequence sums — drop the padded rows so
            # the aggregate perplexity is exact
            padded, real_b = pad_batch(toks, dp)
            sums = training.eval_step(
                eval_params, cfg,
                jax.random.fold_in(jax.random.PRNGKey(args.seed + 2), j),
                jax.device_put(jnp.asarray(padded), bsh),
            )
            nll += float(np.sum(np.asarray(sums["nll_sum"])[:real_b]))
            cnt += float(np.sum(np.asarray(sums["count"])[:real_b]))
        print(f"step {step:5d}  eval masked-ppl {np.exp(nll / max(cnt, 1)):8.3f}")

    perm_cache = {}

    def batch_for_step(step):
        """Batch order is a pure function of (seed, step): epoch-seeded
        permutations when --shuffle, plain cycling otherwise — either way a
        resumed run sees exactly the data the uninterrupted run would."""
        epoch, idx = divmod(step, len(batches))
        if not args.shuffle:
            return batches[idx]
        if epoch not in perm_cache:
            perm_cache.clear()  # only the current epoch's permutation is live
            perm_cache[epoch] = np.random.default_rng(
                (args.seed, epoch)
            ).permutation(len(batches))
        return batches[perm_cache[epoch][idx]]

    t0 = time.perf_counter()
    tokens_seen = 0
    last_step = start_step
    for step in range(start_step, args.steps):
        batch = batch_for_step(step)
        last_step = step + 1
        _, _, toks = converter([dataset[i] for i in batch])
        # pad the batch dim to a multiple of the data-parallel rows (times
        # microbatch count, so every microbatch shards evenly)
        toks, _ = pad_batch(toks, batch_mult)
        # rng from the step index (not a split chain): resume stays bit-exact
        step_rng = jax.random.fold_in(rng, step)
        tokens_dev = jax.device_put(jnp.asarray(toks), bsh)
        if args.lora:
            state, metrics = training.train_step_lora(
                state, placed_params, cfg, tx, step_rng, tokens_dev,
                scale=lora_scale,
            )
        elif args.accum_steps > 1:
            state, metrics = training.train_step_accum(
                state, cfg, tx, step_rng, tokens_dev,
                accum_steps=args.accum_steps,
            )
        else:
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
        if state_dir and args.save_every and (step + 1) % args.save_every == 0:
            from esm_tpu.io.checkpoint import save_train_state

            save_train_state(state_dir, state)
            print(f"saved train state at step {step + 1}")
        if eval_batches is not None and args.eval_every and (step + 1) % args.eval_every == 0:
            run_eval(step + 1)
        if args.stop_after and step + 1 >= args.stop_after:
            print(f"stopping after step {step + 1} (--stop-after)")
            break

    if eval_batches is not None and (
        not args.eval_every or last_step % args.eval_every
    ):
        run_eval(last_step)
    if args.checkpoint_dir:
        from esm_tpu.io.checkpoint import save_params

        if args.lora:
            try:
                # deployment artifact: adapters folded into the base kernels
                # (runs at exactly the base model's inference cost)
                final = lora_mod.merge(
                    placed_params, state.params, scale=lora_scale
                )
                save_params(args.checkpoint_dir, final)
                print(f"saved MERGED params to {args.checkpoint_dir}")
            except ValueError:
                # int8 base refuses merging; ship the adapters — inference
                # patches them next to the frozen base (esm_tpu.lora.patch)
                save_params(args.checkpoint_dir, state.params)
                print(
                    f"saved LoRA adapters to {args.checkpoint_dir} "
                    "(int8 base stays unmerged; apply with lora.patch)"
                )
        else:
            save_params(args.checkpoint_dir, state.params)
            print(f"saved params to {args.checkpoint_dir}")
    return state


if __name__ == "__main__":
    run(create_parser().parse_args())
