"""Training subsystem beyond the single step: exact gradient accumulation,
grad clipping / bf16 moments, masked-ppl eval, and bit-exact mid-training
checkpoint/resume. The reference ships no trainer at all (SURVEY §1); these
pin the semantics our training story promises."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy example/notebook compiles

from esm_tpu import training
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2

FASTA = "/root/reference/examples/data/few_proteins.fasta"


def _setup(batch=8):
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=64, attention_heads=4
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    seqs = [("s%d" % i, "KALTARQQEVFDLIRDHISQTGMPPTRAEIA"[: 8 + i]) for i in range(batch)]
    _, _, toks = alphabet.get_batch_converter(pad_to_multiple=8)(seqs)
    return cfg, params, jnp.asarray(toks)


def test_accum_matches_full_batch_exactly():
    """train_step_accum must be the same function of the batch as train_step:
    grads of the unnormalized NLL sum accumulate linearly, normalized once."""
    cfg, params, toks = _setup()
    tx = training.make_optimizer(1e-3, warmup_steps=1, total_steps=10)
    rng = jax.random.PRNGKey(7)

    copy = lambda tree: jax.tree.map(lambda x: jnp.array(x), tree)
    # the steps donate their input state, so each run gets its own buffers;
    # two steps so the post-warmup (nonzero-LR) update is exercised too
    s_full = training.init_state(copy(params), tx)
    s_acc = training.init_state(copy(params), tx)
    for i in range(2):
        step_rng = jax.random.fold_in(rng, i)
        s_full, m_full = training.train_step(s_full, cfg, tx, step_rng, toks)
        s_acc, m_acc = training.train_step_accum(
            s_acc, cfg, tx, step_rng, toks, accum_steps=4
        )
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(params))
    )

    assert np.isclose(float(m_acc["loss"]), float(m_full["loss"]), atol=1e-6)
    assert float(m_acc["num_masked"]) == float(m_full["num_masked"])
    for a, b in zip(jax.tree.leaves(s_acc.params), jax.tree.leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_accum_rejects_indivisible_batch():
    cfg, params, toks = _setup(batch=6)
    tx = training.make_optimizer(1e-3, warmup_steps=1, total_steps=10)
    state = training.init_state(params, tx)
    with pytest.raises(ValueError, match="accum_steps"):
        training.train_step_accum(
            state, cfg, tx, jax.random.PRNGKey(0), toks, accum_steps=4
        )


def test_grad_clip_and_bf16_moments():
    """Clipped + bf16-moment optimizer still trains (loss finite, params move)
    and the first moments really are stored in bfloat16."""
    cfg, params, toks = _setup()
    tx = training.make_optimizer(
        1e-3, warmup_steps=1, total_steps=10,
        grad_clip_norm=1.0, mu_dtype=jnp.bfloat16,
    )
    new_state = training.init_state(jax.tree.map(jnp.array, params), tx)
    for i in range(2):  # step 0 has LR 0 (warmup from zero)
        new_state, metrics = training.train_step(
            new_state, cfg, tx, jax.random.PRNGKey(i), toks
        )
    assert np.isfinite(float(metrics["loss"]))
    moment_dtypes = {
        leaf.dtype
        for leaf in jax.tree.leaves(new_state.opt_state)
        if getattr(leaf, "ndim", 0) >= 2
    }
    assert jnp.dtype(jnp.bfloat16) in moment_dtypes
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(params))
    )
    assert changed


def test_eval_step_matches_loss():
    """eval_step's per-sequence sums reproduce mlm_loss exactly (same
    corruption rng), and dropping rows drops exactly their contribution."""
    cfg, params, toks = _setup()
    rng = jax.random.PRNGKey(3)
    sums = training.eval_step(params, cfg, rng, toks)
    assert sums["nll_sum"].shape == (toks.shape[0],)

    corrupted, target_mask = training._corrupt_batch(cfg, rng, toks)
    loss, metrics = training.mlm_loss(params, cfg, corrupted, toks, target_mask)
    assert np.isclose(
        float(np.sum(sums["nll_sum"])) / max(float(np.sum(sums["count"])), 1.0),
        float(loss),
        atol=1e-6,
    )
    assert float(np.sum(sums["count"])) == float(metrics["num_masked"])
    # per-row counts only cover that row's masked positions
    per_row = np.asarray(target_mask).sum(-1)
    np.testing.assert_array_equal(np.asarray(sums["count"]), per_row)


from tests.conftest import run_pretrain_example as _run_example  # noqa: E402


def _restore_params(ckpt_dir: str):
    """Final params from the example's saved train state (bare orbax restore)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(str(pathlib.Path(f"{ckpt_dir}-state").resolve()))
    return state["params"], int(np.asarray(state["step"]))


def test_resume_is_bit_exact(tmp_path):
    """3 steps + save + resume for 3 more == 6 uninterrupted steps: identical
    final params (per-step rng is folded from the step index, the batch
    iterator fast-forwards, and the full optimizer state round-trips)."""
    ckpt_a, _ = _run_example(
        tmp_path / "a", ["--save-every", "6", "--shuffle"], steps=6
    )
    ckpt_b, out1 = _run_example(
        tmp_path / "b",
        ["--save-every", "3", "--stop-after", "3", "--shuffle"],
        steps=6,
    )
    assert "stopping after step 3" in out1
    _, out2 = _run_example(
        tmp_path / "b", ["--save-every", "3", "--resume", "--shuffle"], steps=6
    )
    assert "resumed from" in out2 and "at step 3" in out2
    straight, step_a = _restore_params(ckpt_a)
    resumed, step_b = _restore_params(ckpt_b)
    assert step_a == step_b == 6
    for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finetune_secondary_structure_example():
    """examples/finetune_secondary_structure.py learns the synthetic
    residue->SS mapping through a frozen random-init LM (head-only training):
    accuracy well above the 3-class chance level."""
    import importlib.util
    import io
    from contextlib import redirect_stdout

    spec = importlib.util.spec_from_file_location(
        "finetune_ssp",
        pathlib.Path(__file__).parent.parent
        / "examples" / "finetune_secondary_structure.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    args = mod.create_parser().parse_args(
        ["--synthetic", "32", "--steps", "150", "--batch-size", "8",
         "--lr", "3e-3",
         "--num-layers", "2", "--embed-dim", "64", "--attention-heads", "4",
         "--truncation-seq-length", "62", "--log-every", "50"]
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        trainable, classes, acc = mod.run(args)
    assert classes == ["C", "E", "H"]
    assert "lm" not in trainable  # frozen by default
    assert acc > 0.8, buf.getvalue()  # 3-class chance is 0.33


def test_example_eval_and_accum(tmp_path):
    """--accum-steps and --eval-fasta paths of the example run end-to-end and
    report a finite masked perplexity."""
    _, out = _run_example(
        tmp_path,
        ["--accum-steps", "2", "--grad-clip", "1.0", "--bf16-moments",
         "--eval-fasta", FASTA, "--eval-every", "2"],
        steps=4,
    )
    ppls = [
        float(line.rsplit(None, 1)[-1])
        for line in out.splitlines()
        if "eval masked-ppl" in line
    ]
    assert ppls and all(np.isfinite(p) and p > 1.0 for p in ppls)


def test_factored_optimizer_trains():
    """make_optimizer(factored=True) = adafactor: steps run, loss falls on a
    fixed batch, and the optimizer state is tiny (the long-context
    single-chip configuration — 650M L=8192, BENCH_NOTES)."""
    # d=128: adafactor only factors axes >= 128 (min_dim_size_to_factor),
    # so the toy d=64 width would store full second moments
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=2, embed_dim=128, attention_heads=4
    )
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    seqs = [("s%d" % i, "KALTARQQEVFDLIRDHISQTGMPPTRAEIA"[: 8 + i]) for i in range(4)]
    _, _, toks = alphabet.get_batch_converter(pad_to_multiple=8)(seqs)
    toks = jnp.asarray(toks)
    tx = training.make_optimizer(
        1e-3, warmup_steps=1, total_steps=50, factored=True, grad_clip_norm=1.0
    )
    state = training.init_state(params, tx)
    param_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    opt_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(state.opt_state)
        if hasattr(x, "size")
    )
    assert opt_bytes < 0.6 * param_bytes, (opt_bytes, param_bytes)

    losses = []
    for i in range(6):
        state, m = training.train_step(state, cfg, tx, jax.random.PRNGKey(3), toks)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
