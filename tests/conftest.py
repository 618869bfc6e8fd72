"""Test configuration: force an 8-device virtual CPU platform so sharding tests
exercise real multi-device code paths without TPU hardware.

Note: this image's sitecustomize registers an ``axon`` TPU backend in every
python process and force-selects jax_platforms="axon,cpu" — overriding the
JAX_PLATFORMS env var. Tests must not touch the (single, contended) tunneled
TPU chip, so we update the jax config back to cpu before any backend is
initialized."""

import os
import sys

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The reference implementation (read-only, used as a numeric oracle in tests).
REFERENCE_PATH = "/root/reference"


def add_reference_to_path():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long tests (>8s: notebook/example-script compiles, soak, big "
        "parity runs). Fast tier: pytest -m 'not slow' (~6 min measured on an "
        "idle box); slow tier: pytest -m slow (~13 min). Run both (as two "
        "consecutive processes — one ~20-min process can hit an XLA "
        "compile-under-memory-pressure segfault near the end) before "
        "committing kernel/model changes.",
    )


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"


def run_pretrain_example(tmp_path, extra, steps):
    """Run examples/pretrain_mlm.py in a FRESH subprocess (the real user
    flow). In-process importlib execution crashed sporadically: after ~150
    suite tests, the example's pjit compile aborts inside XLA
    (backend_compile_and_load) — fresh-process isolation sidesteps the
    accumulated-state corruption and keeps the contended TPU untouched
    (PALLAS_AXON_POOL_IPS removed -> sitecustomize registers no axon).
    Returns (checkpoint_dir, stdout)."""
    import pathlib
    import subprocess

    script = pathlib.Path(__file__).parent.parent / "examples" / "pretrain_mlm.py"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(script.parent.parent) + os.pathsep + env.get("PYTHONPATH", "")
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    fasta = "/root/reference/examples/data/few_proteins.fasta"
    proc = subprocess.run(
        [sys.executable, str(script),
         "--fasta", fasta, "--steps", str(steps), "--num-layers", "2",
         "--embed-dim", "64", "--attention-heads", "4",
         "--toks-per-batch", "512", "--truncation-seq-length", "62",
         "--log-every", "1", "--warmup-steps", "1",
         "--checkpoint-dir", str(tmp_path / "ckpt")] + extra,
        capture_output=True, text=True, timeout=900,
        cwd=str(script.parent.parent), env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    return str(tmp_path / "ckpt"), proc.stdout
