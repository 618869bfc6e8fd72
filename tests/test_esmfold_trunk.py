"""Folding trunk parity (with recycling) vs. the HF torch oracle, confidence
metric parity, and an end-to-end random-weights ESMFold smoke test."""

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
from esm_tpu.models.esmfold.structure_module import StructureModuleConfig
from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig, folding_trunk_apply

torch.manual_seed(3)

C_S, C_Z = 64, 32


def _configs(num_blocks=1, max_recycles=2):
    hf_cfg = HFTrunkConfig(
        num_blocks=num_blocks,
        sequence_state_dim=C_S,
        pairwise_state_dim=C_Z,
        sequence_head_width=16,
        pairwise_head_width=16,
        dropout=0,
        max_recycles=max_recycles,
        structure_module=HFSMConfig(
            sequence_dim=32,
            pairwise_dim=C_Z,
            ipa_dim=8,
            resnet_dim=16,
            num_heads_ipa=4,
            num_blocks=2,
        ),
    )
    sm = hf_cfg.structure_module
    my_cfg = FoldingTrunkConfig(
        num_blocks=num_blocks,
        sequence_state_dim=C_S,
        pairwise_state_dim=C_Z,
        sequence_head_width=16,
        pairwise_head_width=16,
        max_recycles=max_recycles,
        structure_module=StructureModuleConfig(
            c_s=sm.sequence_dim,
            c_z=sm.pairwise_dim,
            c_ipa=sm.ipa_dim,
            c_resnet=sm.resnet_dim,
            no_heads_ipa=sm.num_heads_ipa,
            no_qk_points=sm.num_qk_points,
            no_v_points=sm.num_v_points,
            no_blocks=sm.num_blocks,
            no_transition_layers=sm.num_transition_layers,
            no_resnet_blocks=sm.num_resnet_blocks,
            no_angles=sm.num_angles,
            trans_scale_factor=sm.trans_scale_factor,
        ),
    )
    return hf_cfg, my_cfg


@pytest.mark.parametrize("recycles", [0, 2])
def test_trunk_parity(recycles):
    hf_cfg, my_cfg = _configs()
    ref = hf.EsmFoldingTrunk(hf_cfg)
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0, 0.3)
    ref.eval()

    g = np.random.RandomState(4)
    b, l = 2, 7
    s = g.randn(b, l, C_S).astype(np.float32) * 0.3
    z = g.randn(b, l, l, C_Z).astype(np.float32) * 0.3
    aa = g.randint(0, 20, (b, l))
    residx = np.tile(np.arange(l, dtype=np.int64), (b, 1))
    mask = np.ones((b, l), np.float32)
    mask[1, 5:] = 0

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(s),
            torch.from_numpy(z),
            torch.from_numpy(aa),
            torch.from_numpy(residx),
            torch.from_numpy(mask),
            no_recycles=recycles,
        )

    params = cv.convert_trunk(
        {f"trunk.{k}": v for k, v in ref.state_dict().items()}, "trunk"
    )
    out = folding_trunk_apply(
        params,
        my_cfg,
        jnp.asarray(s),
        jnp.asarray(z),
        jnp.asarray(aa),
        jnp.asarray(residx.astype(np.int32)),
        jnp.asarray(mask),
        no_recycles=recycles,
    )

    np.testing.assert_allclose(
        np.asarray(out["s_s"]), out_ref["s_s"].numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["s_z"]), out_ref["s_z"].numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["positions"]), out_ref["positions"].numpy(), atol=2e-3, rtol=1e-3
    )


def test_confidence_metrics_match_oracle():
    from transformers.models.esm.openfold_utils import loss as hf_loss

    from esm_tpu.models.esmfold.protein import (
        compute_predicted_aligned_error,
        compute_tm,
    )

    g = np.random.RandomState(5)
    logits = g.randn(9, 9, 64).astype(np.float32)
    ptm_ref = hf_loss.compute_tm(torch.from_numpy(logits), max_bin=31, no_bins=64)
    ptm = compute_tm(jnp.asarray(logits), max_bin=31, no_bins=64)
    np.testing.assert_allclose(float(ptm), float(ptm_ref), atol=1e-5)

    pae_ref = hf_loss.compute_predicted_aligned_error(
        torch.from_numpy(logits), max_bin=31, no_bins=64
    )
    pae = compute_predicted_aligned_error(jnp.asarray(logits), max_bin=31, no_bins=64)
    np.testing.assert_allclose(
        np.asarray(pae["predicted_aligned_error"]),
        pae_ref["predicted_aligned_error"].numpy(),
        atol=1e-5,
    )


def test_atom14_to_atom37_matches_oracle():
    from transformers.models.esm.openfold_utils import feats as hf_feats

    from esm_tpu.models.esmfold.protein import atom14_to_atom37, make_atom14_masks

    g = np.random.RandomState(6)
    b, l = 2, 7
    aatype = g.randint(0, 21, (b, l))
    atom14 = g.randn(b, l, 14, 3).astype(np.float32)

    # oracle needs the batch dict from make_atom14_masks
    from transformers.models.esm.openfold_utils import data_transforms

    batch = {"aatype": torch.from_numpy(aatype)}
    data_transforms.make_atom14_masks(batch)
    ref = hf_feats.atom14_to_atom37(torch.from_numpy(atom14), batch)

    ours = atom14_to_atom37(jnp.asarray(atom14), jnp.asarray(aatype))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)

    masks = make_atom14_masks(jnp.asarray(aatype))
    np.testing.assert_array_equal(
        np.asarray(masks["atom14_atom_exists"]), batch["atom14_atom_exists"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(masks["residx_atom37_to_atom14"]),
        batch["residx_atom37_to_atom14"].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(masks["atom37_atom_exists"]), batch["atom37_atom_exists"].numpy()
    )


@pytest.mark.slow
def test_esmfold_end_to_end_smoke():
    """Random-weights ESMFold: infer a sequence + multimer, write PDBs."""
    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2
    from esm_tpu.models import esmfold as ef

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = ef.ESMFoldConfig(
        esm=esm2.ESM2Config.from_alphabet(
            alphabet, num_layers=2, embed_dim=32, attention_heads=2
        ),
        trunk=FoldingTrunkConfig(
            num_blocks=1,
            sequence_state_dim=64,
            pairwise_state_dim=32,
            sequence_head_width=16,
            pairwise_head_width=16,
            max_recycles=1,
            structure_module=StructureModuleConfig(
                c_s=32, c_z=32, c_ipa=8, c_resnet=16, no_heads_ipa=4, no_blocks=2
            ),
        ),
    )
    params = ef.init_esmfold(jax.random.PRNGKey(0), cfg, alphabet)
    out = ef.infer(params, cfg, ["MKTVRQERLK", "MKT:RQE"], num_recycles=0)
    assert out["positions"].shape[-2:] == (14, 3)
    assert np.isfinite(np.asarray(out["positions"])).all()
    assert np.isfinite(np.asarray(out["ptm"])).all()
    assert out["plddt"].shape[-1] == 37

    pdbs = ef.output_to_pdb(out)
    assert len(pdbs) == 2
    assert pdbs[0].startswith("ATOM")
    assert "END" in pdbs[0]
    # multimer: linker residues masked out of atom37_atom_exists
    assert "TER" in pdbs[1]

    # frugal mode: O(L^2) diagnostics dropped, everything kept is identical
    fr = ef.infer(params, cfg, ["MKTVRQERLK", "MKT:RQE"], num_recycles=0, frugal=True)
    for k in ("s_z", "distogram_logits", "ptm_logits", "aligned_confidence_probs"):
        assert k not in fr and k in out, k
    for k in ("positions", "plddt", "ptm", "predicted_aligned_error", "mean_plddt"):
        np.testing.assert_allclose(
            np.asarray(fr[k]), np.asarray(out[k]), atol=1e-5, err_msg=k
        )
    assert ef.output_to_pdb(fr)[0] == pdbs[0]

    # pad_to_multiple (the fold server's length bucketing): padded tail
    # positions are mask=0 rows, so real-row outputs match the unbucketed
    # fold and the PDB is byte-identical
    pb = ef.infer(
        params, cfg, ["MKTVRQERLK", "MKT:RQE"], num_recycles=0,
        pad_to_multiple=16,
    )
    L = out["positions"].shape[-3]
    assert pb["positions"].shape[-3] == 32  # 31-residue multimer -> 32 bucket
    np.testing.assert_allclose(
        np.asarray(pb["positions"])[..., :L, :, :],
        np.asarray(out["positions"]), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pb["mean_plddt"]), np.asarray(out["mean_plddt"]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(pb["ptm"]), np.asarray(out["ptm"]), atol=1e-3
    )
    assert ef.output_to_pdb(pb) == pdbs


@pytest.mark.slow
def test_esmfold_half_precision_lm_modes():
    """The frozen LM can run in float16 (reference esmfold.py:59-62) or
    bfloat16; outputs stay close to the fp32 LM (structure trunk unchanged).

    This is the execution mode behind the fp16 golden-parity plan in
    PARITY.md; at tiny scale the deltas bound compile-path bugs, the
    scale-dependent error budget is measured in scripts_dev."""
    import dataclasses

    import jax.numpy as jnp

    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2
    from esm_tpu.models import esmfold as ef

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = ef.ESMFoldConfig(
        esm=esm2.ESM2Config.from_alphabet(
            alphabet, num_layers=2, embed_dim=32, attention_heads=2
        ),
        trunk=FoldingTrunkConfig(
            num_blocks=1,
            sequence_state_dim=64,
            pairwise_state_dim=32,
            sequence_head_width=16,
            pairwise_head_width=16,
            max_recycles=1,
            structure_module=StructureModuleConfig(
                c_s=32, c_z=32, c_ipa=8, c_resnet=16, no_heads_ipa=4, no_blocks=1
            ),
        ),
    )
    params = ef.init_esmfold(jax.random.PRNGKey(0), cfg, alphabet)
    ref = ef.infer(params, cfg, ["MKTVRQERLKAYTRQELAE"], num_recycles=0)
    for dt, atol in ((jnp.float16, 0.35), (jnp.bfloat16, 1.5)):
        cfg_h = dataclasses.replace(
            cfg, esm=dataclasses.replace(cfg.esm, compute_dtype=dt)
        )
        out = ef.infer(params, cfg_h, ["MKTVRQERLKAYTRQELAE"], num_recycles=0)
        assert np.isfinite(np.asarray(out["positions"])).all(), dt
        # same structure to within half-precision LM noise
        np.testing.assert_allclose(
            np.asarray(out["mean_plddt"]), np.asarray(ref["mean_plddt"]),
            atol=atol, err_msg=str(dt),
        )
        delta = np.abs(
            np.asarray(out["positions"]) - np.asarray(ref["positions"])
        ).max()
        assert delta < (0.5 if dt == jnp.float16 else 2.0), (dt, delta)


def test_chunked_triangle_attention_matches():
    """chunk_size changes memory, not numerics."""
    import jax.numpy as jnp
    from esm_tpu.ops.triangle import triangle_attention

    torch.manual_seed(9)
    ref = hf.EsmFoldTriangleAttention(C_Z, 16, C_Z // 16, starting=True, inf=1e9).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0, 0.3)
    from esm_tpu.io import convert_esmfold as cv2

    params = cv2.convert_tri_att({f"m.{k}": v for k, v in ref.state_dict().items()}, "m")
    g = np.random.RandomState(10)
    z = g.randn(2, 13, 13, C_Z).astype(np.float32)
    mask = np.ones((2, 13, 13), np.float32)
    full = triangle_attention(
        params, jnp.asarray(z), num_heads=2, starting=True, mask=jnp.asarray(mask)
    )
    for chunk in (4, 5, 13, 64):
        chunked = triangle_attention(
            params, jnp.asarray(z), num_heads=2, starting=True,
            mask=jnp.asarray(mask), chunk_size=chunk,
        )
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(full), atol=1e-5, err_msg=str(chunk)
        )


def test_fused_triangle_attention_matches():
    """The Pallas fused triangle-attention path equals the XLA path."""
    import jax.numpy as jnp
    from esm_tpu.ops.triangle import triangle_attention
    from esm_tpu.io import convert_esmfold as cv2

    torch.manual_seed(11)
    ref = hf.EsmFoldTriangleAttention(C_Z, 16, C_Z // 16, starting=True, inf=1e9).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0, 0.3)
    params = cv2.convert_tri_att({f"m.{k}": v for k, v in ref.state_dict().items()}, "m")
    g = np.random.RandomState(12)
    z = g.randn(2, 9, 9, C_Z).astype(np.float32)
    mask = np.ones((2, 9, 9), np.float32)
    mask[1, :, 7:] = 0
    for starting in (True, False):
        full = triangle_attention(
            params, jnp.asarray(z), num_heads=2, starting=starting, mask=jnp.asarray(mask)
        )
        fused = triangle_attention(
            params, jnp.asarray(z), num_heads=2, starting=starting,
            mask=jnp.asarray(mask), use_flash=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(full), atol=2e-5, err_msg=str(starting)
        )


def test_fused_triangle_attention_strip_path():
    """J > MAX_RESIDENT_J takes the q-strip kernel (padded J, masked pads)."""
    import jax.numpy as jnp
    from esm_tpu.kernels.triangle_attention import (
        NEG_INF, MAX_RESIDENT_J, triangle_attention_fused,
    )

    assert MAX_RESIDENT_J < 1100  # the shapes below must exercise the strip path
    g = np.random.RandomState(13)
    b, i, h, j, d = 1, 3, 2, 1100, 32
    q = g.randn(b, i, h, j, d).astype(np.float32) * 0.2
    k = g.randn(b, i, h, j, d).astype(np.float32) * 0.2
    v = g.randn(b, i, h, j, d).astype(np.float32) * 0.2
    tri = g.randn(b, h, j, j).astype(np.float32) * 0.5
    mask = np.zeros((b, i, j), np.float32)
    mask[:, :, : j - 37] = 1.0  # last 37 keys masked
    mask_bias = np.where(mask > 0, 0.0, NEG_INF).astype(np.float32)

    s = np.einsum("bihqd,bihkd->bihqk", q, k) + tri[:, None]  # (b,1,h,jq,jk)
    s = s + mask_bias[:, :, None, None, :]
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    expected = np.einsum("bihqk,bihkd->bihqd", p / p.sum(-1, keepdims=True), v)

    def dj(t):  # kernel layout: (B, I, H, d, J)
        return jnp.asarray(t.transpose(0, 1, 2, 4, 3))

    out = triangle_attention_fused(
        dj(q), dj(k), dj(v), jnp.asarray(tri), jnp.asarray(mask_bias)
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 1, 2, 4, 3), expected, atol=2e-5
    )


def test_esmfold_attn_map_and_sm_only():
    """use_esm_attn_map pairwise init + structure-module-only (0 trunk blocks)."""
    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2
    from esm_tpu.models import esmfold as ef

    alphabet = Alphabet.from_architecture("ESM-1b")
    esm_cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    cfg = ef.ESMFoldConfig(
        esm=esm_cfg,
        use_esm_attn_map=True,
        trunk=FoldingTrunkConfig(
            num_blocks=0,   # structure-module-only ablation shape
            sequence_state_dim=64,
            pairwise_state_dim=32,
            sequence_head_width=16,
            pairwise_head_width=16,
            max_recycles=1,
            structure_module=StructureModuleConfig(
                c_s=32, c_z=32, c_ipa=8, c_resnet=16, no_heads_ipa=4, no_blocks=1
            ),
        ),
    )
    params = ef.init_esmfold(jax.random.PRNGKey(5), cfg, alphabet)
    out = ef.infer(params, cfg, "MKTVRQERLK", num_recycles=0)
    assert np.isfinite(np.asarray(out["positions"])).all()
    assert np.isfinite(np.asarray(out["ptm"])).all()
