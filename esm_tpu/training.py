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
) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, total_steps
    )
    return optax.adamw(
        schedule, b1=0.9, b2=0.98, eps=1e-8, weight_decay=weight_decay,
        mask=decay_mask,
    )


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


def mlm_loss(
    params,
    cfg: esm2.ESM2Config,
    corrupted: jax.Array,
    targets: jax.Array,
    target_mask: jax.Array,
    apply_fn=None,
) -> Tuple[jax.Array, dict]:
    out = (apply_fn or esm2.apply)(params, cfg, corrupted)
    logits = out["logits"]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = target_mask.astype(nll.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum(nll * w) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == targets) * w) / denom
    return loss, {"loss": loss, "acc": acc, "num_masked": jnp.sum(w)}


def _mlm_step(state, cfg, tx, rng, tokens, apply_fn=None):
    """Shared body of the train steps: corrupt, grad, optimizer update."""
    special = (
        (tokens == cfg.padding_idx)
        | (tokens == cfg.cls_idx)
        | (tokens == cfg.eos_idx)
    )
    corrupted, target_mask = mask_tokens(
        rng,
        tokens,
        mask_idx=cfg.mask_idx,
        padding_idx=cfg.padding_idx,
        special_mask=special,
    )
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
