"""The one-command golden-gate drill (scripts_dev/golden_gate.py) itself:
exit/report semantics must be trustworthy the day weights arrive, so both
reachable paths are drilled — all-pending (empty cache, exit 0) and
present-but-failing (a broken checkpoint must surface as FAILED, exit 1)."""

import json
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent
SCRIPT = REPO / "scripts_dev" / "golden_gate.py"


def _run(cache, report):
    return subprocess.run(
        [sys.executable, str(SCRIPT), "--report", str(report)],
        env={"ESM_TPU_CACHE": str(cache), "PATH": "/usr/bin:/bin",
             "HOME": "/root"},
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )


def test_parse_results_with_passing_printing_tests():
    """Regression (round-3 review): statuses must parse for PASSING tests
    that print metric lines. With capture on ('-v', no '-s'), the verdict
    follows the nodeid on one line and prints land in the '-rA' summary."""
    sys.path.insert(0, str(REPO / "scripts_dev"))
    import golden_gate as gg

    out = "\n".join([
        "tests/test_golden_checkpoints.py::test_esm2_650m_embeddings PASSED [ 16%]",
        "tests/test_golden_checkpoints.py::test_esmfold_golden_plddt PASSED [ 33%]",
        "tests/test_golden_checkpoints.py::test_esm2_650m_contact_precision_harness FAILED [ 50%]",
        "tests/test_golden_checkpoints.py::test_if1_golden_perplexity SKIPPED [ 66%]",
        "tests/test_golden_checkpoints.py::test_esm2_650m_int8_close_to_fp32 PASSED [ 83%]",
        "tests/test_golden_checkpoints.py::test_esm1v_blat_zero_shot_spearman PASSED [100%]",
        "=========================== PASSES ===========================",
        "___________________ test_esmfold_golden_plddt ___________________",
        "----------------------- Captured stdout call -----------------------",
        "esmfold golden: fp16-LM pLDDT 88.31, fp32 pLDDT 88.29",
        "contact P@L long-range over 10 chains: 0.512",
        "esm1v BLAT: rho(ours, reference scores) = 0.9991, |rho(ours, DMS 2500)| = 0.571",
    ])
    res = gg.parse_results(out, runnable=list(gg.CHECKS))
    assert res["test_esm2_650m_embeddings"]["status"] == "PASSED"
    assert res["test_esmfold_golden_plddt"]["status"] == "PASSED"
    assert res["test_esm2_650m_contact_precision_harness"]["status"] == "FAILED"
    assert res["test_if1_golden_perplexity"]["status"] == "SKIPPED"
    metrics = gg.parse_metrics(out)
    assert len(metrics) == 3 and any("pLDDT 88.31" in m for m in metrics)


@pytest.mark.slow
def test_drill_pending_with_empty_cache(tmp_path):
    """NOTE on the CLAUDE.md 'never two pytest processes' rule: that rule
    guards against concurrent XLA compiles under memory pressure. The nested
    pytest here runs only the weights-gated file with an empty cache — every
    test SKIPS at collection-time checks, no XLA compile happens — and both
    subprocess drills are slow-tier so the fast dev loop never nests."""
    cache = tmp_path / "cache"
    cache.mkdir()
    report = tmp_path / "GG.md"
    proc = _run(cache, report)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    text = report.read_text()
    assert "SKIPPED (weights absent)" in text
    assert "pending, not" in text
    data = json.loads(report.with_suffix(".json").read_text())
    assert all(c["status"] == "SKIPPED" for c in data["checks"].values())


@pytest.mark.slow
def test_drill_reports_failure_on_broken_checkpoint(tmp_path):
    """A checkpoint that exists but fails its gate must come back FAILED with
    exit 1 — not silently skipped (the drill's whole value)."""
    torch = pytest.importorskip("torch")
    import argparse

    cache = tmp_path / "cache"
    cache.mkdir()
    lm_cfg = argparse.Namespace(
        encoder_layers=2, encoder_embed_dim=32, encoder_attention_heads=2,
        token_dropout=True,
    )
    torch.save(
        {"cfg": {"model": lm_cfg}, "model": {}},
        cache / "esm2_t33_650M_UR50D.pt",
    )
    report = tmp_path / "GG.md"
    proc = _run(cache, report)
    assert proc.returncode == 1, proc.stdout + proc.stderr
    text = report.read_text()
    assert "| FAILED |" in text or "| ERROR |" in text
    data = json.loads(report.with_suffix(".json").read_text())
    st = data["checks"]["test_esm2_650m_embeddings"]["status"]
    assert st in ("FAILED", "ERROR")
