"""ESMFold structure fine-tuning on custom backbones.

The reference ships ESMFold inference-only (esm/esmfold/v1/esmfold.py);
this example closes the loop for the folding family: AF2-style losses
(backbone FAPE + distogram + pLDDT supervision — esm_tpu/models/esmfold/
losses.py) on (sequence, backbone) pairs read straight from PDB/mmCIF
files, against the frozen ESM-2 LM, with optional LoRA adapters so a
full-size trunk fine-tunes on a single chip.

Smoke test on CPU with a random-init tiny model:
  python examples/esmfold_finetune.py --pdbs my_structures/ --steps 10 --cpu

Real fine-tuning starts from a converted checkpoint:
  python examples/esmfold_finetune.py --pdbs my_structures/ \
      --init-from esmfold_3B_v1 --lora --steps 500
"""

from __future__ import annotations

import argparse
import glob
import os
import time


def create_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--pdbs", required=True,
        help="directory of (or glob over) .pdb/.cif backbone files",
    )
    p.add_argument("--chain", default=None, help="chain id (default: all atoms)")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num-recycles", type=int, default=0)
    p.add_argument(
        "--init-from", default=None,
        help="warm-start from an esmfold checkpoint name/path "
        "(esm_tpu.pretrained.load_esmfold) instead of a random-init tiny model",
    )
    p.add_argument("--lora", action="store_true", help="LoRA adapters only")
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--lm-aux-weight", type=float, default=0.0,
                   help=">0 adds the masked-LM auxiliary (15%% masking)")
    p.add_argument("--cpu", action="store_true")
    return p


def load_backbones(pattern, chain):
    """(seqs, coords list) from PDB/mmCIF files; NaN/missing atoms allowed —
    they become coord_mask zeros."""
    from esm_tpu.models.inverse_folding.util import load_coords

    paths = (
        sorted(glob.glob(os.path.join(pattern, "*")))
        if os.path.isdir(pattern)
        else sorted(glob.glob(pattern))
    )
    seqs, coords = [], []
    for path in paths:
        if not path.endswith((".pdb", ".cif", ".mmcif")):
            continue
        xyz, seq = load_coords(path, chain)
        seqs.append(seq)
        coords.append(xyz)
    if not seqs:
        raise SystemExit(f"no .pdb/.cif files under {pattern}")
    return seqs, coords


def main(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    import optax

    from esm_tpu import lora, training
    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2, esmfold as ef
    from esm_tpu.models.esmfold import losses as fl
    from esm_tpu.models.esmfold.structure_module import StructureModuleConfig
    from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig

    seqs, raw_coords = load_backbones(args.pdbs, args.chain)
    print(f"loaded {len(seqs)} backbones, lengths {[len(s) for s in seqs]}")

    if args.init_from:
        from esm_tpu.pretrained import load_esmfold

        cfg, params, _ = load_esmfold(args.init_from)
    else:
        alphabet = Alphabet.from_architecture("ESM-1b")
        cfg = ef.ESMFoldConfig(
            esm=esm2.ESM2Config.from_alphabet(
                alphabet, num_layers=3, embed_dim=64, attention_heads=4
            ),
            trunk=FoldingTrunkConfig(
                num_blocks=2,
                sequence_state_dim=64,
                pairwise_state_dim=32,
                sequence_head_width=16,
                pairwise_head_width=16,
                max_recycles=max(1, args.num_recycles + 1),
                structure_module=StructureModuleConfig(
                    c_s=64, c_z=32, c_ipa=8, c_resnet=16,
                    no_heads_ipa=4, no_blocks=2,
                ),
            ),
        )
        params = ef.init_esmfold(
            jax.random.PRNGKey(0), cfg, Alphabet.from_architecture("ESM-1b")
        )

    # single-chain encodings aligned with the coords (no linker/offset)
    aa, mask, residx, _, _ = ef.batch_encode_sequences(
        seqs, residue_index_offset=None, chain_linker=None
    )
    L = aa.shape[1]
    coords = np.zeros((len(seqs), L, 3, 3), np.float32)
    coord_mask = np.zeros((len(seqs), L), np.float32)
    for i, xyz in enumerate(raw_coords):
        n = xyz.shape[0]
        finite = np.isfinite(xyz).all((-2, -1))
        coords[i, :n] = np.nan_to_num(xyz)
        coord_mask[i, :n] = finite.astype(np.float32)

    trainable, frozen = training.split_fold_params(params)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))
    weights = fl.FoldLossWeights(lm=args.lm_aux_weight)

    if args.lora:
        adapters = lora.init_lora(
            jax.random.PRNGKey(1), trainable, rank=args.lora_rank,
            targets=lambda path: True,  # every linear in trunk + heads
        )
        n_adapt = sum(x.size for x in jax.tree.leaves(adapters))
        n_full = sum(x.size for x in jax.tree.leaves(trainable))
        print(f"LoRA: {n_adapt:,} adapter params over {n_full:,} frozen")
        state = training.init_state(adapters, tx)
    else:
        state = training.init_state(trainable, tx)

    B = args.batch_size
    rng = np.random.RandomState(0)
    order = np.arange(len(seqs))
    t0 = time.time()
    for step in range(args.steps):
        if step % max(1, len(seqs) // B) == 0:
            rng.shuffle(order)
        idx = order[(step * B) % len(seqs) : (step * B) % len(seqs) + B]
        if len(idx) < B:
            idx = order[:B]
        batch = dict(
            aa=jnp.asarray(aa[idx]),
            mask=jnp.asarray(mask[idx], jnp.float32),
            coords=jnp.asarray(coords[idx]),
            coord_mask=jnp.asarray(coord_mask[idx]),
        )
        pattern = None
        if args.lm_aux_weight > 0:
            pattern = jnp.asarray(
                (rng.rand(*batch["aa"].shape) < 0.15).astype(np.int32)
            )
        if args.lora:
            state, m = training.train_step_fold_lora(
                state, trainable, frozen, cfg, tx,
                batch["aa"], batch["mask"], batch["coords"], batch["coord_mask"],
                masking_pattern=pattern, weights=weights,
                num_recycles=args.num_recycles,
            )
        else:
            state, m = training.train_step_fold(
                state, frozen, cfg, tx,
                batch["aa"], batch["mask"], batch["coords"], batch["coord_mask"],
                masking_pattern=pattern, weights=weights,
                num_recycles=args.num_recycles,
            )
        if step % 10 == 0 or step == args.steps - 1:
            print(
                f"step {step:4d} loss {float(m['loss']):.4f} "
                f"fape {float(m['fape']):.4f} "
                f"disto {float(m['distogram_ce']):.4f} "
                f"lddt_ca {float(m['lddt_ca']):.3f} "
                f"({time.time() - t0:.1f}s)"
            )

    if args.lora:
        merged = lora.merge(trainable, state.params)
        print("merged LoRA adapters into the trunk for deployment "
              f"({sum(x.size for x in jax.tree.leaves(merged)):,} params)")


if __name__ == "__main__":
    main(create_parser().parse_args())
