"""The seven named PPL program recipes (esm_tpu/apps/ppl/programs.py, mirroring
reference examples/protein-programming-language/programs/*.py) all build and
run end-to-end through the annealer against a stub folding callback — no
weights, no device, CI-fast."""

import numpy as np
import pytest

from esm_tpu.apps import ppl
from esm_tpu.apps.ppl.folding import AtomView, FoldingCallback, FoldingResult


class StubFoldingCallback(FoldingCallback):
    """Deterministic synthetic 'fold': backbone atoms on a seq-dependent
    helix-ish curve, confidence from a sequence hash. Fast and dependency-free
    so every recipe's full energy stack (SASA, SSE, Kabsch, symmetry rings)
    executes on plausible geometry."""

    def fold(self, sequence, residue_indices):
        rng = np.random.RandomState(abs(hash(sequence)) % (2**31))
        L = len(sequence)
        t = np.arange(L) * 100.0 / 28.0 * np.pi / 180.0 * 28  # ~helix pitch
        ca = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(L)], -1)
        ca = ca + rng.randn(L, 3) * 0.05
        coords, names, resnames, resids, elements = [], [], [], [], []
        from esm_tpu.apps.ppl.sequence import RESIDUE_TYPES_1to3

        for i in range(L):
            res3 = RESIDUE_TYPES_1to3.get(sequence[i], "UNK")
            for name, offset in [("N", [-0.5, 0.3, -0.6]), ("CA", [0, 0, 0]), ("C", [0.6, -0.2, 0.5])]:
                coords.append(ca[i] + offset)
                names.append(name)
                resnames.append(res3)
                resids.append(residue_indices[i])
                elements.append(name[0])
        atoms = AtomView(
            np.asarray(coords, np.float32),
            np.asarray(names),
            np.asarray(resnames),
            np.asarray(resids, np.int64),
            np.asarray(elements),
        )
        return FoldingResult(
            ptm=float(rng.uniform(0.3, 0.9)),
            plddt=float(rng.uniform(0.4, 0.95)),
            atoms=atoms,
            residue_indices=np.asarray(residue_indices),
        )


@pytest.fixture(scope="module")
def template():
    """A small synthetic motif template (5 residues, author ids 10..14)."""
    stub = StubFoldingCallback()
    return stub.fold("KAVLE", list(range(10, 15))).atoms


def _anneal(program, steps=3):
    np.random.seed(0)
    state = ppl.run_simulated_annealing(
        program, StubFoldingCallback(), total_num_steps=steps, display_progress=False
    )
    assert state.num_steps == steps
    assert np.isfinite(state.best_energy)
    assert state.best_sequence
    return state


def test_free_hallucination():
    state = _anneal(ppl.free_hallucination(12))
    assert len(state.best_sequence) == 12


def test_fixed_backbone(template):
    state = _anneal(ppl.fixed_backbone(template))
    assert len(state.best_sequence) == 5
    names = [n for n, _, _ in state.best_energy_term_fn_values]
    assert any("MinimizeCRmsd" in n for n in names)
    assert any("MinimizeDRmsd" in n for n in names)


def test_functional_site_scaffolding(template):
    program = ppl.functional_site_scaffolding(
        template, residue_range=(10, 15), flank_length=6
    )
    seq, _ = program.get_sequence_and_set_residue_index_ranges()
    assert seq[6:11] == "KAVLE"  # constant motif between the flanks
    state = _anneal(program, steps=4)
    # variable-length flanks may change length, motif never does
    assert "KAVLE" in state.best_sequence
    names = [n for n, _, _ in state.best_energy_term_fn_values]
    assert any("MaximizeSurfaceExposure" in n for n in names)


def test_secondary_structure():
    state = _anneal(ppl.secondary_structure("a", "b", segment_length=8))
    assert len(state.best_sequence) == 16
    names = [n for n, _, _ in state.best_energy_term_fn_values]
    assert sum("MatchSecondaryStructure" in n for n in names) == 2


def test_symmetric_monomer():
    program = ppl.symmetric_monomer(3, protomer_length=6)
    seq, idxs = program.get_sequence_and_set_residue_index_ranges()
    assert len(seq) == 18 and seq[:6] == seq[6:12] == seq[12:18]
    program.mutate()
    seq2, _ = program.get_sequence_and_set_residue_index_ranges()
    # shared segment object: all protomers mutate in lockstep
    assert seq2[:6] == seq2[6:12] == seq2[12:18]
    # single chain: contiguous residue indices
    assert idxs == list(range(idxs[0], idxs[0] + 18))
    _anneal(program)


def test_symmetric_binding(template):
    program = ppl.symmetric_binding(
        template, residue_range=(10, 15), num_binding_sites=3, flank_length=4
    )
    seq, _ = program.get_sequence_and_set_residue_index_ranges()
    protomer_len = 4 + 5 + 4
    assert len(seq) == 3 * protomer_len
    protomers = [seq[i * protomer_len : (i + 1) * protomer_len] for i in range(3)]
    assert protomers[0] == protomers[1] == protomers[2]
    assert protomers[0][4:9] == "KAVLE"
    state = _anneal(program)
    names = [n for n, _, _ in state.best_energy_term_fn_values]
    assert any("SymmetryRing" in n for n in names)


def test_symmetric_two_level_multimer():
    program = ppl.symmetric_two_level_multimer(2, 2, protomer_sequence_length=6)
    seq, idxs = program.get_sequence_and_set_residue_index_ranges()
    assert len(seq) == 24
    # chains identical, protomers within a chain identical
    assert seq[:12] == seq[12:] and seq[:6] == seq[6:12]
    # chain break: +1000 residue-index skip between chains, none within
    gaps = np.diff(idxs)
    assert (gaps > 1000).sum() == 1 and int(gaps.max()) == 1001
    _anneal(program)


# ------------------------------------------- named recipes x the REAL folder
# The stub tests above validate every recipe's energy stack on synthetic
# geometry; these anneal named recipes through the real tiny-ESMFold
# ESMFoldCallback (VERDICT r3 item 7) — exercising the recipe<->folder glue
# the stub cannot: residue-index ranges through batch_encode/apply, bucketed
# padding, atom37 extraction, and CRmsd/DRmsd against folder-produced atoms.


@pytest.fixture(scope="module")
def real_callback():
    import jax

    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2, esmfold as ef
    from esm_tpu.models.esmfold.structure_module import StructureModuleConfig
    from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig

    alphabet = Alphabet.from_architecture("ESM-1b")
    lm_cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=32, attention_heads=2
    )
    fold_cfg = ef.ESMFoldConfig(
        esm=lm_cfg,
        trunk=FoldingTrunkConfig(
            num_blocks=1, sequence_state_dim=32, pairwise_state_dim=32,
            sequence_head_width=16, pairwise_head_width=16, max_recycles=1,
            structure_module=StructureModuleConfig(
                c_s=32, c_z=32, c_ipa=8, c_resnet=16, no_heads_ipa=4, no_blocks=1
            ),
        ),
    )
    fold_params = ef.init_esmfold(jax.random.PRNGKey(1), fold_cfg, alphabet)
    return ppl.ESMFoldCallback(fold_params, fold_cfg, num_recycles=0, bucket=16)


def _anneal_real(program, callback, steps=4):
    np.random.seed(0)
    state = ppl.run_simulated_annealing(
        program, callback, total_num_steps=steps, display_progress=False
    )
    assert state.num_steps == steps
    assert np.isfinite(state.best_energy)
    # the annealer keeps the best-so-far: never worse than where it stands
    assert state.best_energy <= state.current_energy or np.isclose(
        state.best_energy, state.current_energy
    )
    assert len(state.energy_trace) == steps
    return state


@pytest.mark.slow
def test_free_hallucination_real_folder(real_callback):
    state = _anneal_real(ppl.free_hallucination(12), real_callback)
    assert len(state.best_sequence) == 12
    names = [n for n, _, _ in state.best_energy_term_fn_values]
    assert any("MaximizePTM" in n for n in names)
    # every term produced a finite value from real folder outputs
    assert all(np.isfinite(v) for _, _, v in state.best_energy_term_fn_values)


@pytest.mark.slow
def test_functional_site_scaffolding_real_folder(real_callback, template):
    """The site motif (author residues 10..14 of the synthetic template) is
    scaffolded between short variable flanks; the constant segment must
    survive annealing and the CRmsd/DRmsd terms must evaluate against the
    REAL folder's atom37 output."""
    program = ppl.functional_site_scaffolding(
        template, residue_range=(10, 15), flank_length=4
    )
    state = _anneal_real(program, real_callback, steps=4)
    assert "KAVLE" in state.best_sequence  # constant site segment intact
    names = [n for n, _, _ in state.best_energy_term_fn_values]
    assert any("MinimizeCRmsd" in n for n in names)
    assert any("MinimizeDRmsd" in n for n in names)
    assert all(np.isfinite(v) for _, _, v in state.best_energy_term_fn_values)
