"""Masked-LM training step (beyond the inference-only reference).

The reference ships no trainer (SURVEY §1); this module adds the standard
ESM-style masked-language-model objective so the framework can fine-tune /
pretrain on TPU meshes: BERT-style 15% masking (80% <mask> / 10% random /
10% keep), cross-entropy on masked positions, optax optimizer, pjit-sharded
train step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .models import esm2


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def decay_mask(params) -> Any:
    """Weight-decay mask for AdamW: decay matmul kernels only — biases,
    LayerNorm scales, embeddings and the LM-head bias are excluded (the
    standard BERT/ESM recipe)."""
    def f(path, leaf):
        last = path[-1]
        name = getattr(last, "key", None) or str(last)
        return name == "kernel" and getattr(leaf, "ndim", 0) >= 2

    return jax.tree_util.tree_map_with_path(f, params)


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    warmup_steps: int = 2000,
    total_steps: int = 100_000,
    grad_clip_norm: Optional[float] = None,
    mu_dtype: Optional[Any] = None,
    factored: bool = False,
) -> optax.GradientTransformation:
    """AdamW with warmup-cosine schedule. ``grad_clip_norm`` prepends global-norm
    clipping; ``mu_dtype`` (e.g. ``jnp.bfloat16``) halves the first-moment HBM —
    on one 16 GB chip that is the difference between B=4 and B=8 at 650M.
    ``factored=True`` switches to adafactor (row/col second-moment stats,
    optimizer state ~params/1000): the long-context single-chip configuration
    — 650M L=8192 trains on one chip where AdamW misses by 321 MB
    (BENCH_NOTES; model it with ``memory_plan.plan_train(factored=True)``)."""
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, total_steps
    )
    if factored:
        tx = optax.adafactor(
            schedule, weight_decay_rate=weight_decay or None,
            # same decay scope as the adamw branch: >=2D kernels only —
            # without the mask adafactor would decay LN scales/biases too
            weight_decay_mask=decay_mask if weight_decay else None,
        )
    else:
        tx = optax.adamw(
            schedule, b1=0.9, b2=0.98, eps=1e-8, weight_decay=weight_decay,
            mask=decay_mask, mu_dtype=mu_dtype,
        )
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


def init_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def mask_tokens(
    rng: jax.Array,
    tokens: jax.Array,
    *,
    mask_idx: int,
    padding_idx: int,
    special_mask: jax.Array,
    num_standard: int = 20,
    standard_offset: int = 4,
    mask_prob: float = 0.15,
) -> Tuple[jax.Array, jax.Array]:
    """BERT-style corruption. Returns (corrupted_tokens, target_mask).
    Padding positions are never selected (``padding_idx``), independent of
    whatever the caller puts in ``special_mask``."""
    r_select, r_kind, r_rand = jax.random.split(rng, 3)
    eligible = ~special_mask & (tokens != padding_idx)
    selected = (jax.random.uniform(r_select, tokens.shape) < mask_prob) & eligible

    kind = jax.random.uniform(r_kind, tokens.shape)
    random_aa = standard_offset + jax.random.randint(
        r_rand, tokens.shape, 0, num_standard
    )
    corrupted = jnp.where(selected & (kind < 0.8), mask_idx, tokens)
    corrupted = jnp.where(selected & (kind >= 0.8) & (kind < 0.9), random_aa, corrupted)
    return corrupted.astype(tokens.dtype), selected


def _mlm_terms(
    params, cfg, corrupted, targets, target_mask, apply_fn=None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-position masked-CE terms: (nll·w, correct·w, w), each (B, T)."""
    out = (apply_fn or esm2.apply)(params, cfg, corrupted)
    logits = out["logits"]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = target_mask.astype(nll.dtype)
    correct = (jnp.argmax(logits, -1) == targets) * w
    return nll * w, correct, w


def mlm_loss_sums(
    params,
    cfg: esm2.ESM2Config,
    corrupted: jax.Array,
    targets: jax.Array,
    target_mask: jax.Array,
    apply_fn=None,
) -> Tuple[jax.Array, dict]:
    """Unnormalized masked-CE: returns (sum of per-position NLL over masked
    positions, {"correct": …, "count": …}). Linear in the batch, so sums from
    microbatches add exactly — the basis for gradient accumulation."""
    nll_w, correct, w = _mlm_terms(
        params, cfg, corrupted, targets, target_mask, apply_fn
    )
    return jnp.sum(nll_w), {"correct": jnp.sum(correct), "count": jnp.sum(w)}


def mlm_loss(
    params,
    cfg: esm2.ESM2Config,
    corrupted: jax.Array,
    targets: jax.Array,
    target_mask: jax.Array,
    apply_fn=None,
) -> Tuple[jax.Array, dict]:
    nll_sum, aux = mlm_loss_sums(
        params, cfg, corrupted, targets, target_mask, apply_fn
    )
    denom = jnp.maximum(aux["count"], 1.0)
    loss = nll_sum / denom
    acc = aux["correct"] / denom
    return loss, {"loss": loss, "acc": acc, "num_masked": aux["count"]}


def _mlm_step(state, cfg, tx, rng, tokens, apply_fn=None):
    """Shared body of the train steps: corrupt, grad, optimizer update."""
    corrupted, target_mask = _corrupt_batch(cfg, rng, tokens)
    (_, metrics), grads = jax.value_and_grad(mlm_loss, has_aux=True)(
        state.params, cfg, corrupted, tokens, target_mask, apply_fn
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), metrics


@partial(jax.jit, static_argnames=("cfg", "tx"), donate_argnums=(0,))
def train_step(
    state: TrainState,
    cfg: esm2.ESM2Config,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    tokens: jax.Array,
) -> Tuple[TrainState, dict]:
    """One MLM step on a (B, T) token batch. Shardings flow from the placed
    state/tokens (pjit via jit + NamedSharding inputs)."""
    return _mlm_step(state, cfg, tx, rng, tokens)


def _corrupt_batch(cfg, rng, tokens):
    special = (
        (tokens == cfg.padding_idx)
        | (tokens == cfg.cls_idx)
        | (tokens == cfg.eos_idx)
    )
    return mask_tokens(
        rng,
        tokens,
        mask_idx=cfg.mask_idx,
        padding_idx=cfg.padding_idx,
        special_mask=special,
    )


@partial(
    jax.jit, static_argnames=("cfg", "tx", "accum_steps"), donate_argnums=(0,)
)
def train_step_accum(
    state: TrainState,
    cfg: esm2.ESM2Config,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    tokens: jax.Array,
    *,
    accum_steps: int,
) -> Tuple[TrainState, dict]:
    """Gradient-accumulation MLM step: the (B, T) batch is split into
    ``accum_steps`` microbatches processed sequentially under ``lax.scan``, so
    peak activation memory is that of B/accum_steps sequences. EXACTLY
    equivalent to ``train_step`` on the full batch (not just approximately):
    the scan accumulates grads of the *unnormalized* NLL sum plus the masked
    count, and normalizes once at the end — the same function of the batch."""
    if tokens.shape[0] % accum_steps:
        raise ValueError(
            f"batch {tokens.shape[0]} not divisible by accum_steps={accum_steps}"
        )
    corrupted, target_mask = _corrupt_batch(cfg, rng, tokens)
    micro = jax.tree.map(
        lambda x: x.reshape(accum_steps, -1, *x.shape[1:]),
        (corrupted, tokens, target_mask),
    )

    def body(carry, xs):
        g_acc, nll_acc, correct_acc, count_acc = carry
        c, t, m = xs
        (nll_sum, aux), g = jax.value_and_grad(mlm_loss_sums, has_aux=True)(
            state.params, cfg, c, t, m
        )
        g_acc = jax.tree.map(jnp.add, g_acc, g)
        f32 = lambda x: x.astype(jnp.float32)
        return (
            g_acc,
            nll_acc + f32(nll_sum),
            correct_acc + f32(aux["correct"]),
            count_acc + f32(aux["count"]),
        ), None

    zeros = jax.tree.map(jnp.zeros_like, state.params)
    zero = jnp.zeros((), jnp.float32)
    (g_sum, nll_sum, correct, count), _ = jax.lax.scan(
        body, (zeros, zero, zero, zero), micro
    )
    denom = jnp.maximum(count, 1.0)
    grads = jax.tree.map(lambda g: g / denom, g_sum)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = {"loss": nll_sum / denom, "acc": correct / denom, "num_masked": count}
    return TrainState(new_params, new_opt, state.step + 1), metrics


@partial(jax.jit, static_argnames=("cfg", "tx"), donate_argnums=(0,))
def train_step_msa(
    state: TrainState,
    cfg,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    tokens: jax.Array,
) -> Tuple[TrainState, dict]:
    """One MLM step for the MSA Transformer: the same BERT-style objective
    over (B, R, C) MSA token batches (masking is uniform across rows and
    columns; per-row cls tokens and padding are never selected). ``cfg`` is
    an MSATransformerConfig — its result-dict contract matches esm2.apply, so
    the shared step body drives it unchanged."""
    from .models import msa_transformer

    return _mlm_step(state, cfg, tx, rng, tokens, msa_transformer.apply)


@partial(
    jax.jit, static_argnames=("cfg", "tx", "scale", "apply_fn"),
    donate_argnums=(0,),
)
def train_step_lora(
    state: TrainState,
    base_params,
    cfg: esm2.ESM2Config,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    tokens: jax.Array,
    *,
    scale: float = 1.0,
    apply_fn=None,
) -> Tuple[TrainState, dict]:
    """One parameter-efficient MLM step: ``state.params`` is the ADAPTER tree
    (esm_tpu/lora.py), ``base_params`` the frozen base (fp32/bf16 or
    weight-only int8 — the QLoRA-style configuration). Gradients and
    optimizer state cover only the factors: the loss patches
    ``stop_gradient(base)`` with the adapters, so the optimizer's moments are
    O(adapters), not O(params) — the single-chip memory win that lets the
    base stay bf16/int8 and the batch grow (BENCH_NOTES "LoRA fine-tuning").
    ``scale`` is the LoRA alpha/rank factor (static). ``apply_fn`` (static)
    swaps the model family — e.g. ``msa_transformer.apply`` with an
    MSATransformerConfig and (B, R, C) tokens for MSA-Transformer LoRA."""
    from . import lora as _lora

    corrupted, target_mask = _corrupt_batch(cfg, rng, tokens)
    frozen = jax.lax.stop_gradient(base_params)

    def loss_fn(adapters):
        p = _lora.patch(frozen, adapters, scale=scale)
        return mlm_loss(p, cfg, corrupted, tokens, target_mask, apply_fn)

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_adapters = optax.apply_updates(state.params, updates)
    return TrainState(new_adapters, new_opt, state.step + 1), metrics


def if_loss_sums(params, cfg, coords, padding_mask, confidence, tokens):
    """Teacher-forced sequence cross-entropy sums for the GVP-Transformer
    (ESM-IF1): the batched, jittable form of the reference's per-sequence
    scoring objective (esm/inverse_folding/util.py:106-121) — the training
    loss for fine-tuning sequence design on custom backbones. Inputs are
    CoordBatchConverter outputs; returns (Σ nll over non-pad targets,
    {"correct", "count"}) so microbatch sums add exactly."""
    from .models.inverse_folding import model as if_model

    prev = tokens[:, :-1]
    target = tokens[:, 1:]
    logits = if_model.apply(
        params, cfg, coords, padding_mask, confidence, prev
    )  # (B, V, T) — reference layout
    logp = jax.nn.log_softmax(logits, axis=1)
    nll = -jnp.take_along_axis(logp, target[:, None, :], axis=1)[:, 0]
    w = (target != cfg.padding_idx).astype(nll.dtype)
    correct = (jnp.argmax(logits, axis=1) == target) * w
    return jnp.sum(nll * w), {"correct": jnp.sum(correct), "count": jnp.sum(w)}


def _if_step(state, cfg, tx, batch, loss_params_fn, grads_wrt):
    coords, padding_mask, confidence, tokens = batch

    def loss_fn(leaves):
        nll, aux = if_loss_sums(
            loss_params_fn(leaves), cfg, coords, padding_mask, confidence, tokens
        )
        denom = jnp.maximum(aux["count"], 1.0)
        loss = nll / denom
        return loss, {"loss": loss, "acc": aux["correct"] / denom,
                      "num_targets": aux["count"]}

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(grads_wrt)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), metrics


@partial(jax.jit, static_argnames=("cfg", "tx"), donate_argnums=(0,))
def train_step_if(
    state: TrainState,
    cfg,
    tx: optax.GradientTransformation,
    coords: jax.Array,
    padding_mask: jax.Array,
    confidence: jax.Array,
    tokens: jax.Array,
) -> Tuple[TrainState, dict]:
    """One inverse-folding fine-tuning step (full parameters): teacher-forced
    CE on (backbone, sequence) pairs. The reference ships no trainer for any
    family; this closes the loop for ESM-IF1 — design models fine-tuned on
    project-specific backbones. Batch tensors come from CoordBatchConverter."""
    return _if_step(
        state, cfg, tx, (coords, padding_mask, confidence, tokens),
        loss_params_fn=lambda p: p, grads_wrt=state.params,
    )


@partial(jax.jit, static_argnames=("cfg", "tx", "scale"), donate_argnums=(0,))
def train_step_if_lora(
    state: TrainState,
    base_params,
    cfg,
    tx: optax.GradientTransformation,
    coords: jax.Array,
    padding_mask: jax.Array,
    confidence: jax.Array,
    tokens: jax.Array,
    *,
    scale: float = 1.0,
) -> Tuple[TrainState, dict]:
    """Parameter-efficient variant of :func:`train_step_if`: ``state.params``
    is a LoRA adapter tree over the frozen ``base_params`` (esm_tpu/lora.py —
    the adapters cover the encoder/decoder attention+MLP linears by default)."""
    from . import lora as _lora

    frozen = jax.lax.stop_gradient(base_params)
    return _if_step(
        state, cfg, tx, (coords, padding_mask, confidence, tokens),
        loss_params_fn=lambda a: _lora.patch(frozen, a, scale=scale),
        grads_wrt=state.params,
    )


def split_fold_params(params):
    """Split ESMFold params into (trainable, frozen) for the fold train
    steps. The LM and the ``af2_to_esm`` int32 lookup table are frozen: the
    reference's ESMFold trains trunk+heads against a frozen ESM-2 (esm_s is
    stop-gradiented in esmfold.apply, mirroring esm/esmfold/v1/esmfold.py:198),
    and an integer table cannot be differentiated anyway."""
    frozen = {k: params[k] for k in ("esm", "af2_to_esm")}
    trainable = {k: v for k, v in params.items() if k not in frozen}
    return trainable, frozen


def _fold_step(state, frozen, cfg, tx, batch, loss_params_fn, grads_wrt,
               weights, num_recycles):
    from .models import esmfold as ef
    from .models.esmfold import losses as fl

    if weights is None:
        weights = fl.FoldLossWeights()
    aa, mask, coords, coord_mask, masking_pattern = batch

    def loss_fn(leaves):
        params = {**frozen, **loss_params_fn(leaves)}
        structure = ef.apply(
            params, cfg, aa, mask=mask, masking_pattern=masking_pattern,
            num_recycles=num_recycles,
        )
        return fl.fold_loss(
            structure, cfg, aa, mask, coords, coord_mask,
            weights=weights, masking_pattern=masking_pattern,
        )

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(grads_wrt)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), metrics


@partial(
    jax.jit,
    static_argnames=("cfg", "tx", "weights", "num_recycles"),
    donate_argnums=(0,),
)
def train_step_fold(
    state: TrainState,
    frozen,
    cfg,
    tx: optax.GradientTransformation,
    aa: jax.Array,
    mask: jax.Array,
    coords: jax.Array,
    coord_mask: jax.Array,
    *,
    masking_pattern: Optional[jax.Array] = None,
    weights=None,
    num_recycles: int = 0,
) -> Tuple[TrainState, dict]:
    """One ESMFold structure fine-tuning step: backbone FAPE + distogram CE
    + pLDDT-head CE (models/esmfold/losses.py) on (sequence, backbone) pairs
    — the fourth model family the trainer covers end to end. ``state.params``
    holds the trainable subtree and ``frozen`` the rest, both from
    :func:`split_fold_params`; ``cfg`` is the ESMFoldConfig; ``coords`` is
    (B, L, 3, 3) ground-truth N/CA/C in Å, ``coord_mask`` (B, L) marks
    resolved residues. Pass ``masking_pattern`` (+ weights.lm > 0) to add the
    paper's masked-LM auxiliary on the trunk's lm_head."""
    return _fold_step(
        state, frozen, cfg, tx, (aa, mask, coords, coord_mask, masking_pattern),
        loss_params_fn=lambda p: p, grads_wrt=state.params,
        weights=weights, num_recycles=num_recycles,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "tx", "weights", "num_recycles", "scale"),
    donate_argnums=(0,),
)
def train_step_fold_lora(
    state: TrainState,
    base_trainable,
    frozen,
    cfg,
    tx: optax.GradientTransformation,
    aa: jax.Array,
    mask: jax.Array,
    coords: jax.Array,
    coord_mask: jax.Array,
    *,
    masking_pattern: Optional[jax.Array] = None,
    weights=None,
    num_recycles: int = 0,
    scale: float = 1.0,
) -> Tuple[TrainState, dict]:
    """Parameter-efficient variant of :func:`train_step_fold`:
    ``state.params`` is a LoRA adapter tree (esm_tpu/lora.py) over the frozen
    ``base_trainable`` subtree — adapters ride the trunk/head linears while
    the full ESMFold weights stay untouched for deploy-time merging."""
    from . import lora as _lora

    frozen_t = jax.lax.stop_gradient(base_trainable)
    return _fold_step(
        state, frozen, cfg, tx, (aa, mask, coords, coord_mask, masking_pattern),
        loss_params_fn=lambda a: _lora.patch(frozen_t, a, scale=scale),
        grads_wrt=state.params,
        weights=weights, num_recycles=num_recycles,
    )


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(
    params, cfg: esm2.ESM2Config, rng: jax.Array, tokens: jax.Array
) -> dict:
    """Masked-LM evaluation on one batch: corrupts with the same BERT recipe
    as training (deterministic given ``rng``) and returns PER-SEQUENCE sums
    {"nll_sum", "correct", "count"} (each (B,)), so callers aggregate an exact
    masked perplexity over any number of batches — ppl = exp(Σnll / Σcount) —
    and can drop rows added only to pad the batch shape."""
    corrupted, target_mask = _corrupt_batch(cfg, rng, tokens)
    nll_w, correct, w = _mlm_terms(params, cfg, corrupted, tokens, target_mask)
    return {
        "nll_sum": jnp.sum(nll_w, axis=-1),
        "correct": jnp.sum(correct, axis=-1),
        "count": jnp.sum(w, axis=-1),
    }


@partial(
    jax.jit, static_argnames=("cfg", "tx", "mesh", "seq_axis"), donate_argnums=(0,)
)
def train_step_seq(
    state: TrainState,
    cfg: esm2.ESM2Config,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    tokens: jax.Array,
    *,
    mesh,
    seq_axis: str = "tp",
) -> Tuple[TrainState, dict]:
    """Sequence-parallel MLM step: the forward/backward runs with the T axis
    sharded over ``seq_axis`` and ring attention (esm2.apply_seq_sharded), so
    per-chip activation memory is O(T/N) — the training path for context
    lengths one chip cannot hold (650M L=8192 OOMs single-chip, BENCH_NOTES).
    Same objective and grads as ``train_step`` (tests/test_sharding.py)."""
    apply_fn = partial(esm2.apply, ring=(mesh, seq_axis))
    return _mlm_step(state, cfg, tx, rng, tokens, apply_fn)


@partial(
    jax.jit,
    static_argnames=("cfg", "tx", "mesh", "num_microbatches"),
    donate_argnums=(0,),
)
def train_step_pp(
    state: TrainState,
    cfg: esm2.ESM2Config,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    tokens: jax.Array,
    *,
    mesh,
    num_microbatches: int,
) -> Tuple[TrainState, dict]:
    """Pipeline-parallel MLM step: identical objective to ``train_step``, but
    the forward (and, via scan/ppermute transposition, the backward) runs the
    layer stack as a GPipe pipeline over the mesh's ``pp`` axis — the grads
    and loss match the single-stage step exactly (tests/test_pipeline.py)."""
    apply_fn = partial(
        esm2.apply_pipelined, mesh=mesh, num_microbatches=num_microbatches
    )
    return _mlm_step(state, cfg, tx, rng, tokens, apply_fn)
