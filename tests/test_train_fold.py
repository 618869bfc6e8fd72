"""ESMFold structure fine-tuning: AF2-style losses + train steps.

The reference ships ESMFold inference-only; these tests pin the from-scratch
training path (esm_tpu/models/esmfold/losses.py, training.train_step_fold):
frame math equivariance, FAPE's defining invariances, the jnp Cα-lDDT vs the
numpy metrics oracle, distogram binning, and end-to-end optimization on a
tiny model (full-parameter and LoRA).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esm_tpu import training
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2, esmfold as ef
from esm_tpu.models.esmfold import losses as fl
from esm_tpu.models.esmfold.structure_module import StructureModuleConfig
from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig
from esm_tpu.ops import rigid as rg

import optax


def synth_backbone(seed, b, l):
    """Non-degenerate synthetic N/CA/C backbone (B, L, 3, 3) in Å."""
    g = np.random.RandomState(seed)
    ca = np.cumsum(g.randn(b, l, 3) * 0.5 + np.array([3.8, 0.0, 0.0]), axis=1)
    n = ca + g.randn(b, l, 3) * 0.2 + np.array([-1.2, 0.6, 0.0])
    c = ca + g.randn(b, l, 3) * 0.2 + np.array([1.3, -0.6, 0.2])
    return np.stack([n, ca, c], axis=2).astype(np.float32)


def random_rigid(seed):
    g = np.random.RandomState(seed)
    q = g.randn(4)
    q /= np.linalg.norm(q)
    rot = np.asarray(rg.quat_to_rot(jnp.asarray(q, jnp.float32)))
    t = g.randn(3).astype(np.float32) * 5.0
    return rot, t


@pytest.fixture(scope="module")
def tiny_fold():
    alphabet = Alphabet.from_architecture("ESM-1b")
    esm_cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    cfg = ef.ESMFoldConfig(
        esm=esm_cfg,
        trunk=FoldingTrunkConfig(
            num_blocks=1,
            sequence_state_dim=32,
            pairwise_state_dim=32,
            sequence_head_width=16,
            pairwise_head_width=16,
            max_recycles=1,
            structure_module=StructureModuleConfig(
                c_s=32, c_z=32, c_ipa=8, c_resnet=16, no_heads_ipa=4, no_blocks=2
            ),
        ),
    )
    params = ef.init_esmfold(jax.random.PRNGKey(1), cfg, alphabet)
    return params, cfg


def test_backbone_frames_rigid_equivariance():
    coords = jnp.asarray(synth_backbone(0, 2, 6))
    n, ca, c = coords[..., 0, :], coords[..., 1, :], coords[..., 2, :]
    fr = fl.backbone_frames(n, ca, c)
    # orthonormal rotations
    eye = jnp.einsum("...ij,...kj->...ik", fr.rots, fr.rots)
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(3), eye.shape), atol=1e-5
    )
    # frames(T·x) == T ∘ frames(x)
    rot, t = random_rigid(1)
    T = rg.Rigid(jnp.asarray(rot), jnp.asarray(t))
    xf = jnp.einsum("ij,...j->...i", T.rots, coords) + T.trans
    fr2 = fl.backbone_frames(xf[..., 0, :], xf[..., 1, :], xf[..., 2, :])
    composed = rg.compose(rg.Rigid(jnp.broadcast_to(T.rots, fr.rots.shape),
                                   jnp.broadcast_to(T.trans, fr.trans.shape)), fr)
    np.testing.assert_allclose(np.asarray(fr2.rots), np.asarray(composed.rots), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fr2.trans), np.asarray(composed.trans), atol=1e-4)


def test_fape_zero_and_global_invariance():
    coords = jnp.asarray(synth_backbone(2, 2, 8))
    n, ca, c = coords[..., 0, :], coords[..., 1, :], coords[..., 2, :]
    fr = fl.backbone_frames(n, ca, c)
    mask = jnp.ones(ca.shape[:-1])
    # pred == true -> ~0
    z = fl.fape(fr, fr, mask, ca, ca, mask)
    assert float(z) < 1e-3
    # FAPE(pred, T·true) == FAPE(pred, true): invariant to a global rigid on
    # either side (the local-coordinate comparison is the point of FAPE)
    g = np.random.RandomState(3)
    pred_ca = ca + jnp.asarray(g.randn(*ca.shape).astype(np.float32))
    base = fl.fape(fr, fr, mask, pred_ca, ca, mask)
    rot, t = random_rigid(4)
    T = rg.Rigid(jnp.asarray(rot), jnp.asarray(t))
    true_r_t = rg.compose(
        rg.Rigid(jnp.broadcast_to(T.rots, fr.rots.shape),
                 jnp.broadcast_to(T.trans, fr.trans.shape)), fr)
    true_ca_t = jnp.einsum("ij,...j->...i", T.rots, ca) + T.trans
    moved = fl.fape(fr, true_r_t, mask, pred_ca, true_ca_t, mask)
    np.testing.assert_allclose(float(moved), float(base), rtol=1e-4)
    # layer-stacked pred frames average correctly
    frK = rg.Rigid(jnp.stack([fr.rots, fr.rots]), jnp.stack([fr.trans, fr.trans]))
    predK = jnp.stack([pred_ca, pred_ca])
    np.testing.assert_allclose(
        float(fl.fape(frK, fr, mask, predK, ca, mask)), float(base), rtol=1e-5
    )


def test_lddt_ca_matches_numpy_oracle():
    from esm_tpu import metrics

    g = np.random.RandomState(5)
    true = np.cumsum(g.randn(12, 3) * 2.0, axis=0).astype(np.float32)
    pred = (true + g.randn(12, 3).astype(np.float32) * 0.8)
    ours = np.asarray(fl.lddt_ca(jnp.asarray(pred), jnp.asarray(true),
                                 jnp.ones((12,))))
    oracle = metrics.lddt(true, pred, per_residue=True)
    np.testing.assert_allclose(ours, oracle, atol=2e-3)


def test_distogram_targets_binning():
    pb = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0], [100.0, 0.0, 0.0]])
    bins = np.asarray(fl.distogram_targets(pb, n_bins=64))
    assert bins.shape == (3, 3)
    assert (bins == bins.T).all()
    assert bins[0, 0] == 0  # self-distance in the first bin
    # d=3.0 crosses boundaries 2.3125, 2.625, 2.9375 -> bin 3
    assert bins[0, 1] == 3
    assert bins[0, 2] == 63  # beyond max_bin -> last bin


def test_train_step_fold_improves(tiny_fold):
    params, cfg = tiny_fold
    b, l = 2, 8
    g = np.random.RandomState(7)
    aa = jnp.asarray(g.randint(0, 20, (b, l)), jnp.int32)
    mask = jnp.ones((b, l), jnp.float32).at[:, -1].set(0.0)
    coords = jnp.asarray(synth_backbone(8, b, l))
    coord_mask = jnp.ones((b, l), jnp.float32).at[0, 0].set(0.0)

    trainable, frozen = training.split_fold_params(params)
    assert "esm" in frozen and "esm" not in trainable
    tx = optax.adam(1e-3)
    # the step donates state buffers; keep the module-scoped fixture intact
    state = training.init_state(jax.tree.map(jnp.copy, trainable), tx)

    losses = []
    for _ in range(6):
        state, m = training.train_step_fold(
            state, frozen, cfg, tx, aa, mask, coords, coord_mask
        )
        losses.append(float(m["loss"]))
        for k in ("fape", "distogram_ce", "plddt_ce", "lddt_ca"):
            assert np.isfinite(float(m[k])), k
    assert losses[-1] < losses[0]
    assert 0.0 <= float(m["lddt_ca"]) <= 1.0


def test_train_step_fold_lm_aux(tiny_fold):
    params, cfg = tiny_fold
    b, l = 1, 6
    g = np.random.RandomState(9)
    aa = jnp.asarray(g.randint(0, 20, (b, l)), jnp.int32)
    mask = jnp.ones((b, l), jnp.float32)
    coords = jnp.asarray(synth_backbone(10, b, l))
    pattern = jnp.zeros((b, l), jnp.int32).at[:, 2].set(1)

    trainable, frozen = training.split_fold_params(params)
    tx = optax.adam(1e-3)
    state = training.init_state(jax.tree.map(jnp.copy, trainable), tx)
    state, m = training.train_step_fold(
        state, frozen, cfg, tx, aa, mask, coords, jnp.ones((b, l)),
        masking_pattern=pattern, weights=fl.FoldLossWeights(lm=0.1),
    )
    assert "lm_ce" in m and np.isfinite(float(m["lm_ce"]))


def _write_pdb(path, coords, resnames):
    """Minimal standard-column PDB writer for N/CA/C backbones."""
    lines, serial = [], 1
    for i in range(coords.shape[0]):
        for name, xyz in zip(("N", "CA", "C"), coords[i]):
            nm = " " + name.ljust(3)
            lines.append(
                f"ATOM  {serial:5d} {nm} {resnames[i]:>3s} A{i + 1:4d}    "
                f"{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}  1.00  0.00"
                f"           {name[0]}"
            )
            serial += 1
    path.write_text("\n".join(lines) + "\nEND\n")


@pytest.mark.slow
def test_finetune_example_end_to_end(tmp_path):
    """examples/esmfold_finetune.py runs the full PDB->batch->train loop
    (full-parameter and LoRA+lm-aux variants) on synthetic backbones."""
    import importlib.util
    import pathlib

    resnames = ["ALA", "GLY", "SER", "LEU", "VAL", "THR", "GLU", "LYS"]
    for f in range(2):
        coords = synth_backbone(20 + f, 1, 8)[0]
        _write_pdb(tmp_path / f"s{f}.pdb", coords, resnames)

    spec = importlib.util.spec_from_file_location(
        "esmfold_finetune",
        pathlib.Path(__file__).parent.parent / "examples" / "esmfold_finetune.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(mod.create_parser().parse_args(
        ["--pdbs", str(tmp_path), "--steps", "2", "--cpu"]
    ))
    mod.main(mod.create_parser().parse_args(
        ["--pdbs", str(tmp_path), "--steps", "2", "--cpu", "--lora",
         "--lm-aux-weight", "0.1"]
    ))


def test_train_step_fold_lora(tiny_fold):
    from esm_tpu import lora

    params, cfg = tiny_fold
    b, l = 1, 6
    g = np.random.RandomState(11)
    aa = jnp.asarray(g.randint(0, 20, (b, l)), jnp.int32)
    mask = jnp.ones((b, l), jnp.float32)
    coords = jnp.asarray(synth_backbone(12, b, l))

    trainable, frozen = training.split_fold_params(params)
    adapters = lora.init_lora(
        jax.random.PRNGKey(2), trainable, rank=2, targets={"fc1", "fc2"}
    )
    tx = optax.adam(1e-2)
    before = [np.asarray(x) for x in jax.tree.leaves(adapters)]
    state = training.init_state(adapters, tx)
    for _ in range(2):
        state, m = training.train_step_fold_lora(
            state, trainable, frozen, cfg, tx, aa, mask, coords,
            jnp.ones((b, l)),
        )
        assert np.isfinite(float(m["loss"]))
    after = jax.tree.leaves(state.params)
    changed = any(
        not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(before, after)
    )
    assert changed
