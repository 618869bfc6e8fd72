"""ESM-IF1 fine-tuning steps (training.train_step_if / train_step_if_lora).

The reference ships no trainer for any family (SURVEY §1); these pin the
inverse-folding training surface: the batched teacher-forced CE objective
matches the reference-semantics per-sequence scorer, full-parameter steps
optimize it, and the LoRA variant trains adapters only.
"""

import jax
import jax.numpy as jnp
import numpy as np

from esm_tpu import lora, training
from esm_tpu.data import Alphabet
from esm_tpu.models.inverse_folding import model as ifm
from esm_tpu.models.inverse_folding.init import init as if_init
from esm_tpu.models.inverse_folding.util import CoordBatchConverter

AA = list("ACDEFGHIKLMNPQRSTVWY")


def _setup():
    alphabet = Alphabet.from_architecture("invariant_gvp")
    cfg = ifm.GVPTransformerConfig.from_alphabet(
        alphabet,
        encoder_embed_dim=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_embed_dim=128,
        decoder_embed_dim=64,
        decoder_layers=2,
        decoder_attention_heads=4,
        decoder_ffn_embed_dim=128,
        gvp_top_k_neighbors=6,
        gvp_node_hidden_dim_scalar=32,
        gvp_node_hidden_dim_vector=8,
        gvp_edge_hidden_dim_scalar=16,
        gvp_edge_hidden_dim_vector=1,
        gvp_num_encoder_layers=1,
    )
    params = if_init(jax.random.PRNGKey(0), cfg)
    rnd = np.random.default_rng(0)
    items = []
    for length in (12, 9):  # ragged: exercises NaN batch padding + pad mask
        coords = (rnd.normal(size=(length, 3, 3)) * 3.0).astype(np.float32)
        seq = "".join(rnd.choice(AA, size=length))
        items.append((coords, None, seq))
    coords_b, conf, _, tokens, padding_mask = CoordBatchConverter(alphabet)(items)
    batch = (
        jnp.asarray(coords_b), jnp.asarray(padding_mask),
        jnp.asarray(conf), jnp.asarray(tokens),
    )
    return alphabet, cfg, params, items, batch


def test_if_loss_matches_reference_scorer():
    """The batched jittable objective equals the per-sequence scoring path
    (model.get_sequence_loss, itself parity-tested against the reference)."""
    alphabet, cfg, params, items, batch = _setup()
    coords_b, padding_mask, conf, tokens = batch
    nll_sum, aux = training.if_loss_sums(
        params, cfg, coords_b, padding_mask, conf, tokens
    )
    want_sum = want_cnt = 0.0
    for coords, _, seq in items:
        loss, pad = ifm.get_sequence_loss(params, cfg, alphabet, coords, seq)
        want_sum += float(np.sum(loss * ~pad))
        want_cnt += float(np.sum(~pad))
    assert np.isclose(float(nll_sum), want_sum, rtol=1e-4)
    assert float(aux["count"]) == want_cnt


def test_train_step_if_overfits_tiny_batch():
    _, cfg, params, _, batch = _setup()
    tx = training.make_optimizer(3e-3, warmup_steps=1, total_steps=50)
    state = training.init_state(params, tx)
    losses = []
    for _ in range(6):
        state, metrics = training.train_step_if(state, cfg, tx, *batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # a tiny model overfits one fixed batch


def test_train_step_if_lora_trains_adapters_only():
    _, cfg, params, _, batch = _setup()
    # default targets hit the encoder/decoder q/k/v/out/fc linears
    adapters = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    assert "q_proj" in adapters["decoder"]["layers"][0]["self_attn"]
    tx = training.make_optimizer(5e-2, warmup_steps=1, total_steps=50)
    adapters0 = jax.tree.map(lambda x: np.asarray(x), adapters)
    state = training.init_state(adapters, tx)
    base_before = jax.tree.map(lambda x: np.asarray(x), params)
    losses = []
    for _ in range(5):
        state, metrics = training.train_step_if_lora(
            state, params, cfg, tx, *batch
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


def test_if_lora_merge_matches_patch_on_list_stacked_tree():
    """merge() on the list-stacked IF adapter tree (the deploy artifact of
    train_step_if_lora) equals the unmerged patched model, and misaligned
    layer lists are rejected rather than silently truncated."""
    import pytest

    _, cfg, params, _, batch = _setup()
    coords_b, padding_mask, conf, tokens = batch
    adapters = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    # give B factors values so the adapters act
    flat, treedef = jax.tree_util.tree_flatten_with_path(adapters)
    keys = jax.random.split(jax.random.PRNGKey(2), len(flat))
    adapters = jax.tree.unflatten(treedef, [
        jax.random.normal(k, leaf.shape, leaf.dtype) * 0.05
        if path[-1].key == "lora_b" else leaf
        for (path, leaf), k in zip(flat, keys)
    ])
    patched, _ = training.if_loss_sums(
        lora.patch(params, adapters, scale=0.5), cfg,
        coords_b, padding_mask, conf, tokens,
    )
    merged, _ = training.if_loss_sums(
        lora.merge(params, adapters, scale=0.5), cfg,
        coords_b, padding_mask, conf, tokens,
    )
    base, _ = training.if_loss_sums(
        params, cfg, coords_b, padding_mask, conf, tokens
    )
    assert abs(float(patched) - float(base)) > 1e-4  # adapters act
    assert np.isclose(float(patched), float(merged), rtol=1e-4)

    short = dict(adapters)
    short["decoder"] = dict(adapters["decoder"])
    short["decoder"]["layers"] = adapters["decoder"]["layers"][:-1]
    with pytest.raises(ValueError, match="align"):
        lora.merge(params, short)
    with pytest.raises(ValueError, match="align"):
        lora.patch(params, short)
