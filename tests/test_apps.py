"""Application layer: lm-design MCMC and protein-programming-language
annealing drive end-to-end with tiny random models."""

import numpy as np
import pytest

import jax

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2


@pytest.fixture(scope="module")
def tiny_lm():
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    return params, cfg, alphabet


def test_lm_design_chain(tiny_lm):
    from esm_tpu.apps import lm_design

    params, cfg, alphabet = tiny_lm
    designer = lm_design.Designer(params, cfg, alphabet)
    seqs, energies, acc_rate = designer.design(
        "KALTARQQEVFDLIRD", lm_design.DesignConfig(num_iter=30), batch=2
    )
    assert len(seqs) == 2 and len(seqs[0]) == 16
    assert energies.shape == (30, 2)
    assert np.isfinite(energies).all()
    assert 0.0 <= acc_rate <= 1.0
    # designs only contain standard residues
    assert all(c in "LAGVSERTIDPKQNFYMHWC" for c in seqs[0])


def test_schedules_match_torch():
    """Each schedule reproduces the torch lr_scheduler it mirrors (the
    reference drives temperatures through these wrappers,
    examples/lm-design/utils/scheduler.py:15-33)."""
    import torch

    from esm_tpu.apps import schedules as S

    cases = [
        (S.StepLR(8.0, step_size=4, gamma=0.5), "StepLR", dict(step_size=4, gamma=0.5)),
        (
            S.MultiStepLR(2.0, milestones=(3, 7, 15), gamma=0.3),
            "MultiStepLR",
            dict(milestones=[3, 7, 15], gamma=0.3),
        ),
        (S.ExponentialLR(1.5, gamma=0.9), "ExponentialLR", dict(gamma=0.9)),
        (
            S.LinearLR(3.0, start_factor=0.25, end_factor=1.0, total_iters=10),
            "LinearLR",
            dict(start_factor=0.25, end_factor=1.0, total_iters=10),
        ),
        (
            S.CosineAnnealingLR(5.0, T_max=20, eta_min=0.5),
            "CosineAnnealingLR",
            dict(T_max=20, eta_min=0.5),
        ),
    ]
    for sched, torch_name, kw in cases:
        dummy = torch.tensor([0.0], requires_grad=True)
        opt = torch.optim.SGD([dummy], lr=sched.initial)
        ref = getattr(torch.optim.lr_scheduler, torch_name)(opt, **kw)
        for step in range(30):
            want = ref.get_last_lr()[0]
            got = float(sched(step))
            assert abs(got - want) < 1e-5, (torch_name, step, got, want)
            opt.step()
            ref.step()


def test_to_schedule_from_config():
    """YAML-style spec (reference conf/config.yaml:31-39) and plain numbers."""
    from esm_tpu.apps import schedules as S

    s = S.to_schedule(
        {"scheduler": "StepLR", "initial": 8, "step_size": 10000, "gamma": 0.5}
    )
    assert isinstance(s, S.StepLR)
    assert float(s(0)) == 8.0 and float(s(10000)) == 4.0

    c = S.to_schedule(0.7)
    assert float(c(123)) == pytest.approx(0.7)

    with pytest.raises(ValueError):
        S.to_schedule({"scheduler": "Bogus", "initial": 1.0})


def test_scheduled_design_matches_constant(tiny_lm):
    """A chain run with ConstantSchedule(T) is bit-identical to the fixed
    float T; an annealing schedule runs and stays finite."""
    from esm_tpu.apps import lm_design
    from esm_tpu.apps.schedules import ConstantSchedule, StepLR

    params, cfg, alphabet = tiny_lm
    designer = lm_design.Designer(params, cfg, alphabet)
    fixed = designer.design(
        "KALTARQQEVFDLIRD",
        lm_design.DesignConfig(num_iter=12, temperature=0.7, seed=3),
    )
    sched = designer.design(
        "KALTARQQEVFDLIRD",
        lm_design.DesignConfig(num_iter=12, temperature=ConstantSchedule(0.7), seed=3),
    )
    assert fixed[0] == sched[0]
    np.testing.assert_array_equal(fixed[1], sched[1])

    annealed = designer.design(
        "KALTARQQEVFDLIRD",
        lm_design.DesignConfig(
            num_iter=12, temperature=StepLR(8.0, step_size=4, gamma=0.5), seed=3
        ),
    )
    assert np.isfinite(annealed[1]).all()


def test_free_generation(tiny_lm):
    """Full hallucination loop: structure resampling + MH sequence steps
    (reference free_generation.py:22-73) runs on random projection weights."""
    import jax.numpy as jnp
    from esm_tpu.apps import lm_design

    params, cfg, alphabet = tiny_lm
    nch = cfg.num_layers * cfg.attention_heads
    bins = lm_design.DISTOGRAM_BINS
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    proj = {
        "conv1": {
            "kernel": 0.1 * jax.random.normal(k1, (nch, bins["N_BINS"] + bins["OMEGA_BINS"])),
            "bias": jnp.zeros((bins["N_BINS"] + bins["OMEGA_BINS"],)),
        },
        "conv2": {
            "kernel": 0.1 * jax.random.normal(k2, (nch, bins["THETA_BINS"] + bins["PHI_BINS"])),
            "bias": jnp.zeros((bins["THETA_BINS"] + bins["PHI_BINS"],)),
        },
    }
    _, _, toks = alphabet.get_batch_converter()([("s", "KALTARQQEVFD")])
    tokens, energies = lm_design.free_generation(
        params, cfg, proj, jnp.asarray(toks), jax.random.PRNGKey(0),
        num_iter=6, resample_y_every=3,
    )
    assert energies.shape == (2, 3, 1)
    assert np.isfinite(np.asarray(energies)).all()
    out = np.asarray(tokens)[0, 1:-1]
    assert ((out >= 4) & (out < 24)).all() or (out == np.asarray(toks)[0, 1:-1]).all()


def test_temperature_sweep_does_not_recompile(tiny_lm):
    """Float temperatures are dynamic operands: sweeping values (or passing a
    jnp scalar) reuses one compilation; only schedule shape changes retrace."""
    import jax.numpy as jnp
    from esm_tpu.apps import lm_design
    from esm_tpu.apps.schedules import LinearLR

    params, cfg, alphabet = tiny_lm
    _, _, toks = alphabet.get_batch_converter()([("s", "KALTARQ")])
    toks = jnp.asarray(toks)

    impl = lm_design._gibbs_free_generation_impl
    before = impl._cache_size()
    outs = [
        lm_design.gibbs_free_generation(
            params, cfg, toks, jax.random.PRNGKey(0), 3, temperature=temp
        )
        for temp in (0.5, 1.0, 2.0, jnp.float32(1.7))
    ]
    assert impl._cache_size() == before + 1, "float sweep must not recompile"
    # annealing schedules ride the same compilation (same shapes)
    lm_design.gibbs_free_generation(
        params, cfg, toks, jax.random.PRNGKey(0), 3,
        temperature=LinearLR(initial=2.0, total_iters=3),
    )
    assert impl._cache_size() == before + 1
    assert all(o.shape == toks.shape for o in outs)


def test_lm_design_ngram_energy():
    from esm_tpu.apps.lm_design import _ngram_energy_tables, ngram_kl

    import jax.numpy as jnp

    stats = {2: {(0, 1): 0.5, (1, 0): 0.5}}
    tables = _ngram_energy_tables(stats)
    seq_match = jnp.asarray([0, 1, 0, 1, 0])  # alternating = high prob grams
    seq_miss = jnp.asarray([5, 6, 7, 8, 9])
    kl_match = float(ngram_kl(seq_match, tables[2], 2))
    kl_miss = float(ngram_kl(seq_miss, tables[2], 2))
    assert kl_match < kl_miss


@pytest.mark.slow
def test_ppl_annealing(tiny_lm):
    from esm_tpu.apps import ppl
    from esm_tpu.models import esmfold as ef
    from esm_tpu.models.esmfold.structure_module import StructureModuleConfig
    from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig

    params, cfg, alphabet = tiny_lm
    fold_cfg = ef.ESMFoldConfig(
        esm=cfg,
        trunk=FoldingTrunkConfig(
            num_blocks=1,
            sequence_state_dim=32,
            pairwise_state_dim=32,
            sequence_head_width=16,
            pairwise_head_width=16,
            max_recycles=1,
            structure_module=StructureModuleConfig(
                c_s=32, c_z=32, c_ipa=8, c_resnet=16, no_heads_ipa=4, no_blocks=1
            ),
        ),
    )
    fold_params = ef.init_esmfold(jax.random.PRNGKey(1), fold_cfg, alphabet)
    callback = ppl.ESMFoldCallback(fold_params, fold_cfg, num_recycles=0, bucket=16)

    np.random.seed(0)
    program = ppl.ProgramNode(
        children=[
            ppl.ProgramNode(sequence_segment=ppl.FixedLengthSequenceSegment(8)),
            ppl.ProgramNode(sequence_segment=ppl.FixedLengthSequenceSegment(8)),
        ],
        energy_function_terms=[ppl.MaximizePTM(), ppl.MaximizePLDDT(), ppl.SymmetryRing()],
        energy_function_weights=[1.0, 1.0, 1.0],
    )
    state = ppl.run_simulated_annealing(
        program, callback, total_num_steps=4, display_progress=False
    )
    assert state.num_steps == 4
    assert np.isfinite(state.best_energy)
    assert len(state.best_sequence) == 16
    # per-term values recorded with names
    names = [n for n, _, _ in state.best_energy_term_fn_values]
    assert any("MaximizePTM" in n for n in names)


def test_ppl_geometry():
    from esm_tpu.apps.ppl.geometry import annotate_sse_ca, kabsch_superimpose, rmsd, sasa

    g = np.random.RandomState(0)
    # kabsch: rotated copy should superimpose to ~0 rmsd
    a = g.randn(10, 3)
    theta = 0.7
    R = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )
    b = a @ R.T + 5.0
    moved = kabsch_superimpose(a, b)
    assert rmsd(a, moved) < 1e-6

    # sasa: isolated atom fully exposed; tightly caged atom buried
    coords = np.concatenate([[[0.0, 0, 0]], 2.5 * _octahedron()], axis=0)
    elements = np.array(["C"] * coords.shape[0])
    areas = sasa(coords, elements)
    lone = sasa(np.zeros((1, 3)), np.array(["C"]))
    assert areas[0] < lone[0] * 0.5  # center substantially buried

    # sse: ideal helix CA trace annotated as helix
    t = np.arange(12)
    helix = np.stack(
        [2.3 * np.cos(t * 1.745), 2.3 * np.sin(t * 1.745), 1.5 * t], axis=-1
    )
    sse = annotate_sse_ca(helix)
    assert (sse == "a").mean() > 0.5


def _octahedron():
    return np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float64,
    )


def test_tm_score_and_lddt():
    """Structural metrics: identity scores 1.0, rigid motions preserve them,
    noise degrades them monotonically."""
    import numpy as np

    from esm_tpu.metrics import lddt, tm_score

    rng = np.random.default_rng(0)
    L = 80
    # a smooth random-walk "backbone"
    coords = np.cumsum(rng.normal(0, 1.2, (L, 3)), axis=0)

    assert np.isclose(tm_score(coords, coords), 1.0)
    assert np.isclose(lddt(coords, coords), 1.0)

    # rigid motion: rotation + translation
    a = rng.normal(size=3)
    a /= np.linalg.norm(a)
    c, s = np.cos(0.7), np.sin(0.7)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    R = np.eye(3) + s * K + (1 - c) * (K @ K)
    moved = coords @ R.T + np.array([5.0, -3.0, 2.0])
    assert tm_score(coords, moved) > 0.999
    assert lddt(coords, moved) > 0.999  # superposition-free by construction

    small = coords + rng.normal(0, 0.5, coords.shape)
    big = coords + rng.normal(0, 4.0, coords.shape)
    assert 1.0 > tm_score(coords, small) > tm_score(coords, big)
    assert 1.0 > lddt(coords, small) > lddt(coords, big)
    assert lddt(coords, big, per_residue=True).shape == (L,)
