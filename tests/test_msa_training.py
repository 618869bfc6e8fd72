"""MSA Transformer MLM training steps (training.train_step_msa / LoRA).

The reference ships no trainer (SURVEY §1); these pin the MSA-family
training surface: the shared MLM step body drives msa_transformer.apply
over (B, R, C) batches, full-parameter and adapter-only.
"""

import jax
import jax.numpy as jnp
import numpy as np

from esm_tpu import lora, training
from esm_tpu.data import Alphabet
from esm_tpu.models import msa_transformer


def _setup():
    alphabet = Alphabet.from_architecture("msa_transformer")
    cfg = msa_transformer.MSATransformerConfig.from_alphabet(
        alphabet, num_layers=2, embed_dim=64, ffn_embed_dim=128,
        attention_heads=4,
    )
    params = msa_transformer.init(jax.random.PRNGKey(0), cfg)
    base = "KALTARQQEVFDLIRD"
    msas = [
        [("a", base), ("b", base[:5] + "L" + base[6:]), ("c", base)],
        [("d", base[:12]), ("e", "M" + base[1:12])],
    ]
    _, _, tokens = alphabet.get_batch_converter()(msas)
    return cfg, params, jnp.asarray(tokens)


def test_train_step_msa_overfits_tiny_batch():
    cfg, params, toks = _setup()
    assert toks.ndim == 3  # (B, R, C)
    tx = training.make_optimizer(3e-3, warmup_steps=1, total_steps=50)
    state = training.init_state(params, tx)
    losses = []
    for i in range(6):
        state, metrics = training.train_step_msa(
            state, cfg, tx, jax.random.fold_in(jax.random.PRNGKey(2), i), toks
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_train_step_lora_msa_family():
    """train_step_lora's apply_fn hook drives the MSA Transformer: adapters
    on the row/col attention + FFN linears train, the base stays frozen."""
    cfg, params, toks = _setup()
    adapters = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    tx = training.make_optimizer(5e-2, warmup_steps=1, total_steps=50)
    adapters0 = jax.tree.map(lambda x: np.asarray(x), adapters)
    base_before = jax.tree.map(lambda x: np.asarray(x), params)
    state = training.init_state(adapters, tx)
    losses = []
    for i in range(5):
        state, metrics = training.train_step_lora(
            state, params, cfg, tx,
            jax.random.fold_in(jax.random.PRNGKey(3), i), toks,
            apply_fn=msa_transformer.apply,
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(adapters0))
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(base_before)):
        np.testing.assert_array_equal(np.asarray(a), b)
