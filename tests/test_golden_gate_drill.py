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


def test_drill_pending_with_empty_cache(tmp_path):
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
