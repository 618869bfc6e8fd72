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
        "parity runs). Fast tier: pytest -m 'not slow' (~3 min); run the full "
        "suite before committing kernel/model changes.",
    )


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
