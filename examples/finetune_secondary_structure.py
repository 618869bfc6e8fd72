"""Supervised fine-tuning: per-residue secondary-structure prediction.

The reference ships the structural split dataset and a notebook that only
*explores* it (examples/esm_structural_dataset.ipynb; esm/data.py:381-493) —
training a downstream head is left to the reader. This example is that
training story on TPU: a per-token classifier over the LM's final hidden
states, trained with the same mesh-sharded machinery as the MLM loop.

  python examples/finetune_secondary_structure.py --download ...   # real SCOPe data
  python examples/finetune_secondary_structure.py --synthetic 64   # self-contained demo

By default only the head trains (the LM is frozen — one forward, no LM
grads); pass --train-lm to fine-tune end to end.
"""

from __future__ import annotations

import argparse


def create_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--split-level", default="superfamily")
    p.add_argument("--cv-partition", default="4")
    p.add_argument("--root-path", default=None, help="dataset cache root")
    p.add_argument("--download", action="store_true", help="download the SCOPe tarballs")
    p.add_argument(
        "--synthetic", type=int, default=0, metavar="N",
        help="skip the dataset: N synthetic (seq, ssp) pairs whose structure "
        "label is a function of local residue identity",
    )
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--num-layers", type=int, default=6)
    p.add_argument("--embed-dim", type=int, default=320)
    p.add_argument("--attention-heads", type=int, default=20)
    p.add_argument("--init-from", default=None, help="warm-start LM from a checkpoint name/path")
    p.add_argument("--train-lm", action="store_true", help="fine-tune the LM too (default: frozen)")
    p.add_argument("--truncation-seq-length", type=int, default=1022)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    return p


def synthetic_items(n, seed=0, min_len=30, max_len=80):
    """Residue-driven labels: helix-formers -> H, strand-formers -> E, else C
    (a learnable stand-in for real DSSP strings)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    aas = "LAGVSERTIDPKQNFYMHWC"
    to_ss = {c: ("H" if c in "AELM" else "E" if c in "VIYFW" else "C") for c in aas}
    items = []
    for _ in range(n):
        L = int(rng.integers(min_len, max_len))
        seq = "".join(aas[i] for i in rng.integers(0, 20, L))
        items.append({"seq": seq, "ssp": "".join(to_ss[c] for c in seq)})
    return items


def run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from functools import partial

    from esm_tpu import training
    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2

    alphabet = Alphabet.from_architecture("ESM-1b")
    if args.init_from:
        from esm_tpu import pretrained

        model, alphabet = pretrained.load_model_and_alphabet(args.init_from)
        cfg, lm_params = model.cfg, model.params
    else:
        cfg = esm2.ESM2Config.from_alphabet(
            alphabet,
            num_layers=args.num_layers,
            embed_dim=args.embed_dim,
            attention_heads=args.attention_heads,
        )
        lm_params = esm2.init(jax.random.PRNGKey(args.seed), cfg)

    if args.synthetic:
        items = synthetic_items(args.synthetic, args.seed)
    else:
        from esm_tpu.data import ESMStructuralSplitDataset

        kw = dict(root_path=args.root_path) if args.root_path else {}
        ds = ESMStructuralSplitDataset(
            split_level=args.split_level, cv_partition=args.cv_partition,
            split="train", download=args.download, **kw,
        )
        items = [ds[i] for i in range(len(ds))]
    classes = sorted({c for it in items for c in it["ssp"]})
    cls_idx = {c: i for i, c in enumerate(classes)}
    print(f"{len(items)} chains, {len(classes)} SS classes: {''.join(classes)}")

    converter = alphabet.get_batch_converter(
        args.truncation_seq_length, pad_to_multiple=32
    )

    def make_batch(batch_items):
        _, _, toks = converter([("x", it["seq"]) for it in batch_items])
        toks = np.asarray(toks)
        labels = np.full(toks.shape, -1, np.int32)  # -1 = ignore (pad/bos/eos)
        for i, it in enumerate(batch_items):
            ssp = it["ssp"][: args.truncation_seq_length]
            labels[i, 1 : 1 + len(ssp)] = [cls_idx[c] for c in ssp]
        return jnp.asarray(toks), jnp.asarray(labels)

    k_head = jax.random.PRNGKey(args.seed + 1)
    d, n_cls = cfg.embed_dim, len(classes)
    head = {
        "kernel": jax.random.normal(k_head, (d, n_cls)) * (d ** -0.5),
        "bias": jnp.zeros((n_cls,)),
    }

    def ssp_logits(head, lm_params, tokens):
        out = esm2.apply(lm_params, cfg, tokens, repr_layers=(cfg.num_layers,))
        reps = out["representations"][cfg.num_layers]
        return reps.astype(jnp.float32) @ head["kernel"] + head["bias"]

    def loss_fn(trainable, frozen_lm, tokens, labels):
        head_p = trainable["head"]
        lm_p = trainable.get("lm", frozen_lm)
        logits = ssp_logits(head_p, lm_p, tokens)
        w = (labels >= 0).astype(jnp.float32)
        safe = jnp.maximum(labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(w.sum(), 1.0)
        loss = (nll * w).sum() / denom
        acc = ((jnp.argmax(logits, -1) == labels) * w).sum() / denom
        return loss, acc

    tx = optax.adamw(args.lr, weight_decay=0.01, mask=training.decay_mask)
    trainable = {"head": head}
    if args.train_lm:
        trainable["lm"] = lm_params
    opt_state = tx.init(trainable)

    # frozen LM passed as an explicit (non-donated) argument — closing over it
    # would bake a SECOND full copy of the params into the executable as a
    # constant; with --train-lm the frozen tree is unused, so pass an empty
    # placeholder rather than aliasing the donated trainable["lm"] buffers
    frozen_lm = {} if args.train_lm else lm_params

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(trainable, opt_state, frozen_lm, tokens, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen_lm, tokens, labels
        )
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss, acc

    rng = np.random.default_rng(args.seed + 2)
    for i in range(args.steps):
        idx = rng.integers(0, len(items), args.batch_size)
        tokens, labels = make_batch([items[j] for j in idx])
        trainable, opt_state, loss, acc = step(
            trainable, opt_state, frozen_lm, tokens, labels
        )
        if (i + 1) % args.log_every == 0 or i + 1 == args.steps:
            print(f"step {i + 1:5d}  loss {float(loss):.4f}  Q{n_cls}-acc {float(acc):.3f}")
    return trainable, classes, float(acc)


if __name__ == "__main__":
    run(create_parser().parse_args())
