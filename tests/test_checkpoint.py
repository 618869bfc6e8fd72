"""Orbax save/load roundtrip, including sharded restore on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from esm_tpu.data import Alphabet
from esm_tpu.io.checkpoint import load_params, save_params
from esm_tpu.models import esm2
from esm_tpu.parallel.mesh import MeshConfig, make_mesh


def test_orbax_roundtrip(tmp_path):
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=64, attention_heads=4
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    path = tmp_path / "ckpt"
    save_params(str(path), params)

    restored = load_params(str(path), template=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # sharded restore on a mesh
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tp=2))
    restored_sh = load_params(str(path), template=params, mesh=mesh)
    q = restored_sh["layers"]["self_attn"]["q_proj"]["kernel"]
    assert not q.sharding.is_fully_replicated
    _, _, toks = alphabet.get_batch_converter()([("a", "KALTARQ")])
    out = esm2.apply(restored_sh, cfg, toks)
    out_ref = esm2.apply(params, cfg, toks)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(out_ref["logits"]), atol=2e-5
    )


def test_orbax_roundtrip_int8(tmp_path):
    """Quantized (int8 + scale) trees round-trip through orbax unchanged."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from esm_tpu.data import Alphabet
    from esm_tpu.io.checkpoint import load_params, save_params
    from esm_tpu.models import esm2
    from esm_tpu.quantization import quantize_params

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    qparams = quantize_params(esm2.init(jax.random.PRNGKey(0), cfg), min_size=1)
    save_params(str(tmp_path / "q"), qparams)
    restored = load_params(str(tmp_path / "q"), template=qparams)
    assert restored["layers"]["fc1"]["kernel"].dtype == jnp.int8
    for a, b in zip(jax.tree.leaves(qparams), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
