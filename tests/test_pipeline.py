"""Pipeline parallelism: the GPipe microbatch pipeline over a ``pp`` mesh
axis must match the single-stage layer scan exactly — forward logits, MLM
loss, gradients, and the optimizer step — including composed with tp/fsdp
sharding inside each stage. Runs on the 8-device virtual CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2
from esm_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_apply,
    shard_params_pp,
    shard_stacked_params,
)


def _setup(batch=8, num_layers=4):
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=num_layers, embed_dim=64, attention_heads=4
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    seqs = [
        ("s%d" % i, "KALTARQQEVFDLIRDHISQTGMPPTRAEIA"[: 8 + 2 * i])
        for i in range(batch)
    ]
    _, _, toks = alphabet.get_batch_converter(pad_to_multiple=8)(seqs)
    return cfg, params, jnp.asarray(toks)


def test_pipelined_forward_matches_single_stage():
    cfg, params, toks = _setup()
    ref = np.asarray(esm2.apply(params, cfg, toks)["logits"])

    mesh = make_pp_mesh(pp=4)
    params_sh = shard_params_pp(mesh, params)
    out = esm2.apply_pipelined(
        params_sh, cfg, toks, mesh=mesh, num_microbatches=4
    )["logits"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_pipeline_composes_with_tp_fsdp():
    cfg, params, toks = _setup()
    ref = np.asarray(esm2.apply(params, cfg, toks)["logits"])

    mesh = make_pp_mesh(pp=2, fsdp=2, tp=2)
    params_sh = shard_params_pp(mesh, params)
    # layer stack carries pp on the layer axis AND tp/fsdp on matmul dims
    q_sh = params_sh["layers"]["self_attn"]["q_proj"]["kernel"].sharding
    assert str(q_sh.spec) == "PartitionSpec('pp', 'fsdp', 'tp')"
    out = esm2.apply_pipelined(
        params_sh, cfg, toks, mesh=mesh, num_microbatches=2
    )["logits"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_microbatch_count_one_and_batch_sized():
    cfg, params, toks = _setup()
    ref = np.asarray(esm2.apply(params, cfg, toks)["logits"])
    mesh = make_pp_mesh(pp=2)
    params_sh = shard_params_pp(mesh, params)
    for m in (1, toks.shape[0]):
        out = esm2.apply_pipelined(
            params_sh, cfg, toks, mesh=mesh, num_microbatches=m
        )["logits"]
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_pipeline_apply_validates():
    cfg, params, toks = _setup()
    mesh = make_pp_mesh(pp=4)
    with pytest.raises(ValueError, match="not divisible"):
        esm2.apply_pipelined(params, cfg, toks, mesh=mesh, num_microbatches=3)
    cfg6, params6, toks6 = _setup(num_layers=6)
    with pytest.raises(ValueError, match="layers not divisible"):
        esm2.apply_pipelined(
            params6, cfg6, toks6, mesh=mesh, num_microbatches=2
        )


@pytest.mark.slow
def test_pp_train_step_matches_single_stage():
    import optax

    from esm_tpu import training

    cfg, params, toks = _setup()
    tx = optax.adamw(1e-3)
    rng = jax.random.PRNGKey(7)

    # train_step donates its state: give it a copy so ``params`` stays live
    params_copy = jax.tree.map(jnp.copy, params)
    state_ref, metrics_ref = training.train_step(
        training.init_state(params_copy, tx), cfg, tx, rng, toks
    )
    loss_ref = float(metrics_ref["loss"])

    mesh = make_pp_mesh(pp=2, fsdp=2, tp=2)
    state_pp = training.init_state(shard_params_pp(mesh, params), tx)
    state_pp, metrics_pp = training.train_step_pp(
        state_pp, cfg, tx, rng, toks, mesh=mesh, num_microbatches=2
    )
    assert abs(float(metrics_pp["loss"]) - loss_ref) < 1e-5

    # grads (hence updated params) must match the single-stage step
    leaf_ref = np.asarray(state_ref.params["layers"]["fc1"]["kernel"])
    leaf_pp = np.asarray(state_pp.params["layers"]["fc1"]["kernel"])
    np.testing.assert_allclose(leaf_pp, leaf_ref, atol=1e-5, rtol=1e-5)
    emb_ref = np.asarray(state_ref.params["embed_tokens"]["weight"])
    emb_pp = np.asarray(state_pp.params["embed_tokens"]["weight"])
    np.testing.assert_allclose(emb_pp, emb_ref, atol=1e-5, rtol=1e-5)


def test_generic_pipeline_apply_identity_stage():
    # pipeline_apply drives any stage body: a per-layer affine stack is easy
    # to verify in closed form
    mesh = make_pp_mesh(pp=4)
    stacked = {"w": jnp.arange(1.0, 5.0).reshape(4, 1, 1)}
    x = jnp.arange(24.0).reshape(6, 2, 2)

    def stage_fn(local, state, aux):
        def body(h, p):
            return h * p["w"], None

        h, _ = jax.lax.scan(body, state, local)
        return h

    out = pipeline_apply(
        stage_fn,
        shard_stacked_params(mesh, stacked),
        x,
        mesh=mesh,
        num_microbatches=3,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 24.0, rtol=1e-6)
