"""ESMFold component parity vs. the torch oracle.

Oracle: the openfold-derived EsmFold* modules vendored in the installed
`transformers` package — numerically identical to the openfold modules the
reference consumes (esm/esmfold/v1/tri_self_attn_block.py:6-13,
esm/esmfold/v1/trunk.py:11) and using the same state-dict names.
"""

import numpy as np
import pytest
import torch

from transformers.models.esm.configuration_esm import (
    StructureModuleConfig as HFSMConfig,
    TrunkConfig as HFTrunkConfig,
)
import transformers.models.esm.modeling_esmfold as hf

import jax
import jax.numpy as jnp

from esm_tpu.io import convert_esmfold as cv
from esm_tpu.models.esmfold import blocks
from esm_tpu.models.esmfold.structure_module import (
    StructureModuleConfig,
    structure_module_apply,
)
from esm_tpu.ops.triangle import triangle_attention, triangle_multiplicative_update

torch.manual_seed(0)

C_Z = 32
C_S = 64


def _trunk_config():
    return HFTrunkConfig(
        num_blocks=1,
        sequence_state_dim=C_S,
        pairwise_state_dim=C_Z,
        sequence_head_width=16,
        pairwise_head_width=16,
        dropout=0,
        structure_module=HFSMConfig(
            sequence_dim=32,
            pairwise_dim=C_Z,
            ipa_dim=8,
            resnet_dim=16,
            num_heads_ipa=4,
            num_qk_points=4,
            num_v_points=8,
            num_blocks=2,
        ),
    )


def _rand_z(b=2, l=7):
    g = np.random.RandomState(0)
    z = g.randn(b, l, l, C_Z).astype(np.float32)
    mask = np.ones((b, l), np.float32)
    mask[1, 5:] = 0
    return z, mask


def _randomize(mod):
    with torch.no_grad():
        for p in mod.parameters():
            p.normal_(0, 0.5)
    return mod


@pytest.mark.parametrize("outgoing", [True, False])
def test_triangle_multiplication_parity(outgoing):
    cfg = _trunk_config()
    ref = _randomize(hf.EsmFoldTriangleMultiplicativeUpdate(cfg, _outgoing=outgoing)).eval()
    z, mask = _rand_z()
    pair_mask = mask[:, :, None] * mask[:, None, :]
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(z), mask=torch.from_numpy(pair_mask))
    params = cv.convert_tri_mul(
        {f"m.{k}": v for k, v in ref.state_dict().items()}, "m"
    )
    out = triangle_multiplicative_update(
        params, jnp.asarray(z), outgoing=outgoing, mask=jnp.asarray(pair_mask)
    )
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=2e-5, rtol=1e-4)

    # fused-kernel variant (stage1/epilogue Pallas kernels, residual folded)
    from esm_tpu.ops.triangle import triangle_multiplicative_update_fused

    out_fused = triangle_multiplicative_update_fused(
        params, jnp.asarray(z), outgoing=outgoing, mask=jnp.asarray(pair_mask)
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), z + out_ref.numpy(), atol=2e-5, rtol=1e-4
    )

    # mask=None fast path (no mask stream in stage 1) == all-ones mask
    out_nomask = triangle_multiplicative_update_fused(
        params, jnp.asarray(z), outgoing=outgoing, mask=None
    )
    out_ones = triangle_multiplicative_update_fused(
        params, jnp.asarray(z), outgoing=outgoing,
        mask=jnp.ones_like(jnp.asarray(pair_mask)),
    )
    np.testing.assert_allclose(
        np.asarray(out_nomask), np.asarray(out_ones), atol=1e-6
    )


@pytest.mark.parametrize("starting", [True, False])
def test_triangle_attention_parity(starting):
    ref = _randomize(
        hf.EsmFoldTriangleAttention(C_Z, 16, C_Z // 16, starting=starting, inf=1e9)
    ).eval()
    z, mask = _rand_z()
    pair_mask = mask[:, :, None] * mask[:, None, :]
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(z), mask=torch.from_numpy(pair_mask))
    params = cv.convert_tri_att({f"m.{k}": v for k, v in ref.state_dict().items()}, "m")
    out = triangle_attention(
        params,
        jnp.asarray(z),
        num_heads=C_Z // 16,
        starting=starting,
        mask=jnp.asarray(pair_mask),
    )
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=2e-5, rtol=1e-4)


def test_trunk_block_parity():
    cfg = _trunk_config()
    ref = _randomize(hf.EsmFoldTriangularSelfAttentionBlock(cfg)).eval()
    g = np.random.RandomState(1)
    b, l = 2, 7
    s = g.randn(b, l, C_S).astype(np.float32)
    z, mask = _rand_z(b, l)
    with torch.no_grad():
        s_ref, z_ref = ref(
            torch.from_numpy(s), torch.from_numpy(z), mask=torch.from_numpy(mask)
        )
    params = cv.convert_trunk_block({f"m.{k}": v for k, v in ref.state_dict().items()}, "m")
    s_out, z_out = blocks.triangular_self_attention_block(
        params,
        jnp.asarray(s),
        jnp.asarray(z),
        seq_heads=C_S // 16,
        pair_heads=C_Z // 16,
        mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(s_out), s_ref.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z_out), z_ref.numpy(), atol=3e-5, rtol=1e-4)


def test_structure_module_parity():
    cfg = _trunk_config().structure_module
    ref = hf.EsmFoldStructureModule(cfg)
    _randomize(ref)
    ref.eval()
    g = np.random.RandomState(2)
    b, l = 2, 7
    s = g.randn(b, l, cfg.sequence_dim).astype(np.float32) * 0.5
    z = g.randn(b, l, l, cfg.pairwise_dim).astype(np.float32) * 0.5
    aatype = g.randint(0, 20, (b, l))
    mask = np.ones((b, l), np.float32)
    mask[1, 5:] = 0
    with torch.no_grad():
        out_ref = ref(
            {"single": torch.from_numpy(s), "pair": torch.from_numpy(z)},
            torch.from_numpy(aatype),
            torch.from_numpy(mask),
        )

    my_cfg = StructureModuleConfig(
        c_s=cfg.sequence_dim,
        c_z=cfg.pairwise_dim,
        c_ipa=cfg.ipa_dim,
        c_resnet=cfg.resnet_dim,
        no_heads_ipa=cfg.num_heads_ipa,
        no_qk_points=cfg.num_qk_points,
        no_v_points=cfg.num_v_points,
        no_blocks=cfg.num_blocks,
        no_transition_layers=cfg.num_transition_layers,
        no_resnet_blocks=cfg.num_resnet_blocks,
        no_angles=cfg.num_angles,
        trans_scale_factor=cfg.trans_scale_factor,
    )
    params = cv.convert_structure_module(
        {f"structure_module.{k}": v for k, v in ref.state_dict().items()}
    )
    out = structure_module_apply(
        params, my_cfg, jnp.asarray(s), jnp.asarray(z), jnp.asarray(aatype),
        jnp.asarray(mask),
    )

    np.testing.assert_allclose(
        np.asarray(out["positions"]), out_ref["positions"].numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["angles"]), out_ref["angles"].numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["states"]), out_ref["states"].numpy(), atol=1e-4, rtol=1e-3
    )
    # frames: compare translation part (quaternion sign conventions differ)
    np.testing.assert_allclose(
        np.asarray(out["frames"][..., 4:]),
        out_ref["frames"][..., 4:].numpy(),
        atol=1e-3,
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["sidechain_frames"]),
        out_ref["sidechain_frames"].numpy(),
        atol=1e-3,
        rtol=1e-3,
    )
