"""Weight-only int8 quantization (esm_tpu/quantization.py).

The reference's 15B serving path is fairscale FSDP CPU offload
(examples/esm2_infer_fairscale_fsdp_cpu_offloading.py); here weights stay
device-resident at half size and flow through the same forward code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2
from esm_tpu.quantization import param_bytes, quantize_linear, quantize_params


def test_quantize_linear_roundtrip():
    g = np.random.RandomState(0)
    w = g.randn(64, 32).astype(np.float32) * 0.1
    p = quantize_linear({"kernel": jnp.asarray(w), "bias": jnp.zeros(32)})
    assert p["kernel"].dtype == jnp.int8
    deq = np.asarray(p["kernel"], np.float32) * np.asarray(p["scale"])[None, :]
    # symmetric per-channel int8: max error is scale/2 per channel
    err = np.abs(deq - w)
    assert (err <= np.asarray(p["scale"])[None, :] * 0.5 + 1e-8).all()


def test_quantized_esm2_forward_close():
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=64, attention_heads=4
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, min_size=1)

    # linear kernels are int8; embeddings/norms untouched
    assert qparams["layers"]["fc1"]["kernel"].dtype == jnp.int8
    assert qparams["embed_tokens"]["weight"].dtype == params["embed_tokens"]["weight"].dtype
    assert param_bytes(qparams) < 0.62 * param_bytes(params)

    g = np.random.RandomState(1)
    tokens = np.full((2, 18), alphabet.padding_idx, np.int32)
    tokens[:, 0] = alphabet.cls_idx
    tokens[0, 1:17] = g.randint(4, 24, 16)
    tokens[0, 17] = alphabet.eos_idx
    tokens[1, 1:9] = g.randint(4, 24, 8)
    tokens[1, 9] = alphabet.eos_idx

    full = esm2.apply(params, cfg, jnp.asarray(tokens))["logits"]
    quant = esm2.apply(qparams, cfg, jnp.asarray(tokens))["logits"]
    ref = np.asarray(full)
    err = np.abs(np.asarray(quant) - ref)
    # weight-only per-channel int8: small relative logits error
    assert err.max() < 0.15 * (np.abs(ref).max() + 1), err.max()
    # rankings preserved where it matters: argmax token agrees on >95% positions
    agree = (np.asarray(quant).argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.95, agree


def test_quantized_trunk_block_runs():
    """The fused tri-mul projection (concatenated kernels) dequantizes int8."""
    from esm_tpu.models.esmfold.init import _KeyGen, init_trunk_block
    from esm_tpu.ops.triangle import triangle_multiplicative_update

    kg = _KeyGen(jax.random.PRNGKey(2))
    params = init_trunk_block(kg, 64, 32)["tri_mul_out"]
    qp = quantize_params(params, min_size=1)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 6, 32))
    full = triangle_multiplicative_update(params, z, outgoing=True)
    quant = triangle_multiplicative_update(qp, z, outgoing=True)
    assert np.isfinite(np.asarray(quant)).all()
    assert np.abs(np.asarray(quant) - np.asarray(full)).max() < 0.2


def test_quantized_handle():
    from esm_tpu.pretrained import LMHandle

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=64, attention_heads=4
    )
    h = LMHandle("esm2", cfg, esm2.init(jax.random.PRNGKey(0), cfg), alphabet)
    hq = h.quantized(min_size=1)
    _, _, toks = alphabet.get_batch_converter()([("a", "KALTARQQEVF")])
    out = hq(toks)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_quantized_esm1_untied_head():
    """ESM-1's untied embed_out is consumed raw (esm1.py) — int8 params must
    dequantize there too (min_size=1 quantizes everything)."""
    from esm_tpu.models import esm1

    alphabet = Alphabet.from_architecture("ESM-1")
    cfg = esm1.ESM1Config.from_alphabet(
        alphabet, model_version="ESM-1", num_layers=2, embed_dim=64,
        ffn_embed_dim=128, attention_heads=4,
    )
    params = esm1.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, min_size=1)
    assert qparams["embed_out"]["kernel"].dtype == jnp.int8

    g = np.random.RandomState(2)
    tokens = np.full((1, 12), alphabet.padding_idx, np.int32)
    tokens[:, 0] = alphabet.cls_idx
    tokens[0, 1:] = g.randint(4, 24, 11)

    full = np.asarray(esm1.apply(params, cfg, jnp.asarray(tokens))["logits"])
    quant = np.asarray(esm1.apply(qparams, cfg, jnp.asarray(tokens))["logits"])
    assert np.abs(quant).max() < 10 * (np.abs(full).max() + 1)
    assert np.abs(quant - full).max() < 0.15 * (np.abs(full).max() + 1)


@pytest.mark.slow
def test_quantized_if_score_close():
    """int8 works across model families: GVP-Transformer scoring drifts only
    slightly (decode is weight-streaming-bound, int8 halves that traffic)."""
    from esm_tpu.models import inverse_folding as ifm

    alphabet = Alphabet.from_architecture("invariant_gvp")
    cfg = ifm.GVPTransformerConfig.from_alphabet(
        alphabet,
        encoder_embed_dim=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_embed_dim=128, decoder_embed_dim=64, decoder_layers=2,
        decoder_attention_heads=4, decoder_ffn_embed_dim=128,
        gvp_top_k_neighbors=6, gvp_node_hidden_dim_scalar=32,
        gvp_node_hidden_dim_vector=8, gvp_edge_hidden_dim_scalar=16,
        gvp_edge_hidden_dim_vector=1, gvp_num_encoder_layers=2,
    )
    params = ifm.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, min_size=1)

    L = 11
    t = np.arange(L)[:, None]
    ca = np.concatenate([np.cos(t * 0.6) * 2.3, np.sin(t * 0.6) * 2.3, t * 1.5], -1)
    coords = np.stack([ca + [1.2, 0, 0], ca, ca + [0, 1.2, 0]], 1).astype(np.float32)
    seq = "KALTARQQEVF"
    full, _ = ifm.score_sequence(params, cfg, alphabet, coords, seq)
    quant, _ = ifm.score_sequence(qparams, cfg, alphabet, coords, seq)
    assert np.isfinite(float(quant))
    assert abs(float(quant) - float(full)) < 0.3, (float(quant), float(full))


def test_quantized_flash_dmajor_matches_exact():
    """int8 weights through the native d-major flash projection path
    (ops.attention._linear_dmajor / _linear_from_dmajor apply the per-output-
    channel scales on the (B, E, T) / (B, T, F) slabs) must match the exact
    XLA path with the same quantized weights."""
    from esm_tpu.ops.attention import multihead_attention
    from esm_tpu.ops.common import init_linear_torch_default

    b, t, d, h = 2, 64, 128, 2
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    params = {
        name: init_linear_torch_default(ks[i], d, d)
        for i, name in enumerate(("q_proj", "k_proj", "v_proj", "out_proj"))
    }
    qparams = quantize_params(params, min_size=1)
    assert qparams["q_proj"]["kernel"].dtype == jnp.int8
    x = jax.random.normal(ks[4], (b, t, d), jnp.float32) * 0.3
    mask = jnp.zeros((b, t), bool).at[1, 50:].set(True)

    out_flash = multihead_attention(
        qparams, x, num_heads=h, key_padding_mask=mask, use_rotary=True,
        use_flash=True,
    ).out
    out_exact = multihead_attention(
        qparams, x, num_heads=h, key_padding_mask=mask, use_rotary=True,
        use_flash=False,
    ).out
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_exact), atol=3e-5
    )
