"""LoRA parameter-efficient fine-tuning (esm_tpu/lora.py).

The reference ships no trainer (SURVEY §1); LoRA extends our trainer with
the frozen-base + rank-r-adapter recipe. These tests pin the semantics:
zero-init identity, flash/d-major path parity of the unmerged hooks,
merge==patch equivalence, the int8 (QLoRA-style) base path, and the
adapter-only training step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esm_tpu import lora, training
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2
from esm_tpu.quantization import quantize_params


def _setup(batch=4, **cfg_kw):
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=64, attention_heads=4, **cfg_kw
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    seqs = [
        ("s%d" % i, "KALTARQQEVFDLIRDHISQTGMPPTRAEIA"[: 12 + 3 * i])
        for i in range(batch)
    ]
    _, _, toks = alphabet.get_batch_converter(pad_to_multiple=8)(seqs)
    return cfg, params, jnp.asarray(toks)


def _randomize_b(adapters, key, scale=0.05):
    """Give every lora_b a nonzero value so the adapters actually act."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(adapters)
    keys = jax.random.split(key, len(flat))
    out = []
    for (path, leaf), k in zip(flat, keys):
        if path[-1].key == "lora_b":
            out.append(jax.random.normal(k, leaf.shape, leaf.dtype) * scale)
        else:
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)


def test_zero_init_patch_is_identity():
    """B=0 at init => the patched model IS the base model, bit for bit."""
    cfg, params, toks = _setup()
    adapters = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    base = esm2.apply(params, cfg, toks)["logits"]
    patched = esm2.apply(lora.patch(params, adapters), cfg, toks)["logits"]
    np.testing.assert_array_equal(np.asarray(base), np.asarray(patched))


def test_patched_flash_and_dmajor_match_exact():
    """Nonzero adapters through the flash path (d_head=16 < 128 => the
    d-major projections, covering the lora hooks in _linear_dmajor /
    _linear_from_dmajor) == the exact XLA path."""
    cfg, params, toks = _setup()
    adapters = _randomize_b(
        lora.init_lora(jax.random.PRNGKey(1), params, rank=4),
        jax.random.PRNGKey(2),
    )
    patched = lora.patch(params, adapters, scale=2.0)
    exact = esm2.apply(patched, cfg, toks)["logits"]
    flash = esm2.apply(
        patched, dataclasses.replace(cfg, use_flash=True), toks
    )["logits"]
    # adapters must change the model (else this parity test is vacuous)
    base = esm2.apply(params, cfg, toks)["logits"]
    assert float(jnp.max(jnp.abs(exact - base))) > 1e-3
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(flash), atol=2e-4, rtol=1e-4
    )


def test_merge_matches_patch():
    cfg, params, toks = _setup()
    adapters = _randomize_b(
        lora.init_lora(jax.random.PRNGKey(1), params, rank=8),
        jax.random.PRNGKey(2),
    )
    patched = esm2.apply(lora.patch(params, adapters, scale=0.5), cfg, toks)
    merged = esm2.apply(lora.merge(params, adapters, scale=0.5), cfg, toks)
    np.testing.assert_allclose(
        np.asarray(patched["logits"]), np.asarray(merged["logits"]),
        atol=1e-4, rtol=1e-4,
    )


def test_int8_base_runs_unmerged_and_refuses_merge():
    """QLoRA-style configuration: weight-only int8 base + float adapters.
    The patched forward must track the float-base patched forward within
    int8 quantization error, and merge() must refuse (it would requantize
    the frozen base)."""
    cfg, params, toks = _setup()
    adapters = _randomize_b(
        lora.init_lora(jax.random.PRNGKey(1), params, rank=4),
        jax.random.PRNGKey(2),
    )
    q_params = quantize_params(params, min_size=1)
    kinds = {
        str(x.dtype) for x in jax.tree.leaves(q_params) if x.ndim >= 2
    }
    assert "int8" in kinds  # the quantization actually happened
    f = esm2.apply(lora.patch(params, adapters), cfg, toks)["logits"]
    qf = esm2.apply(lora.patch(q_params, adapters), cfg, toks)["logits"]
    # int8 per-channel error at 2 tiny layers: loose but non-vacuous bound
    assert float(jnp.max(jnp.abs(f - qf))) < 0.5
    with pytest.raises(ValueError, match="int8"):
        lora.merge(q_params, adapters)


def test_targets_subset_and_param_count():
    cfg, params, _ = _setup()
    adapters = lora.init_lora(
        jax.random.PRNGKey(1), params, rank=4, targets={"q_proj", "v_proj"}
    )
    attn = adapters["layers"]["self_attn"]
    assert set(attn) == {"q_proj", "v_proj"}
    assert set(adapters["layers"]) == {"self_attn"}
    d, r, L = cfg.embed_dim, 4, cfg.num_layers
    assert lora.num_params(adapters) == 2 * L * (d * r + r * d)
    # stacked layer axis preserved on the factors
    assert attn["q_proj"]["lora_a"].shape == (L, d, r)
    assert attn["q_proj"]["lora_b"].shape == (L, r, d)


def test_train_step_lora_trains_adapters_only():
    cfg, params, toks = _setup(batch=8)
    adapters = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    tx = training.make_optimizer(5e-2, warmup_steps=1, total_steps=50)
    # the step donates its input state; keep an undonated copy to diff against
    adapters0 = jax.tree.map(lambda x: np.asarray(x), adapters)
    state = training.init_state(adapters, tx)
    base_before = jax.tree.map(lambda x: np.asarray(x), params)

    losses = []
    for i in range(6):
        state, metrics = training.train_step_lora(
            state, params, cfg, tx, jax.random.fold_in(jax.random.PRNGKey(3), i),
            toks,
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # adapters moved; the frozen base did not
    moved = [
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(adapters0))
    ]
    assert any(moved)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(base_before)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # optimizer state covers only the adapters (the memory win): every
    # optimizer leaf is no bigger than the largest adapter factor
    adapter_sizes = {x.size for x in jax.tree.leaves(state.params)}
    for leaf in jax.tree.leaves(state.opt_state):
        assert leaf.size <= max(adapter_sizes)
    # and the objective is actually optimizable through the patch: by step 6
    # the masked-LM loss on the fixed batch should have dropped
    assert losses[-1] < losses[0]


def test_full_remat_policy_matches_dots():
    """remat_policy="full" (save nothing per layer — the 15B-LoRA single-chip
    setting) recomputes the same math: one train step must produce the same
    loss and updated adapters as the "dots" policy."""
    cfg, params, toks = _setup()
    adapters = lora.init_lora(jax.random.PRNGKey(1), params, rank=4)
    tx = training.make_optimizer(1e-2, warmup_steps=1, total_steps=10)
    rng = jax.random.PRNGKey(5)
    results = {}
    for policy in ("dots", "full"):
        cfg_p = dataclasses.replace(cfg, remat=True, remat_policy=policy)
        state = training.init_state(
            jax.tree.map(lambda x: jnp.array(x), adapters), tx
        )
        state, metrics = training.train_step_lora(
            state, params, cfg_p, tx, rng, toks
        )
        results[policy] = (float(metrics["loss"]), state.params)
    assert np.isclose(results["dots"][0], results["full"][0], atol=1e-6)
    for a, b in zip(
        jax.tree.leaves(results["dots"][1]), jax.tree.leaves(results["full"][1])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lora_on_esmfold_trunk_block():
    """The adapter mechanism is model-agnostic: every linear node of an
    ESMFold trunk block — including the tri-mul gating projections that are
    consumed FUSED through ops.common.materialize_kernel, not linear() —
    honors patched adapters (zero-B identity, nonzero-B changes the output)."""
    from esm_tpu.models.esmfold.blocks import triangular_self_attention_block
    from esm_tpu.models.esmfold.init import _KeyGen, init_trunk_block

    c_s, c_z, L = 64, 32, 12
    params = init_trunk_block(
        _KeyGen(jax.random.PRNGKey(0)), c_s, c_z,
        seq_head_width=16, pair_head_width=16,
    )
    s = jax.random.normal(jax.random.PRNGKey(1), (1, L, c_s))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, L, L, c_z)) * 0.1
    run = lambda p: triangular_self_attention_block(
        p, s, z, seq_heads=c_s // 16, pair_heads=c_z // 16
    )

    adapters = lora.init_lora(
        jax.random.PRNGKey(3), params, rank=2, targets=lambda path: True
    )
    # the fused tri-mul projections are among the adapted nodes
    assert "linear_a_g" in adapters["tri_mul_out"]
    s0, z0 = run(params)
    s1, z1 = run(lora.patch(params, adapters))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))

    live = _randomize_b(adapters, jax.random.PRNGKey(4))
    s2, z2 = run(lora.patch(params, live))
    assert float(jnp.max(jnp.abs(s2 - s0))) > 1e-4
    assert float(jnp.max(jnp.abs(z2 - z0))) > 1e-4


def test_patch_rejects_misaligned_adapters():
    _, params, _ = _setup()
    with pytest.raises(KeyError):
        lora.patch(params, {"not_a_node": {"lora_a": jnp.zeros((2, 2)),
                                           "lora_b": jnp.zeros((2, 2))}})
