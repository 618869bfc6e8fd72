"""Benchmark: ESM2-650M forward throughput @ L=1022 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md) — vs_baseline is
measured against the reference PyTorch implementation running the same config
on this host's CPU would be meaningless, so vs_baseline reports the ratio to
our own exact-XLA (non-flash) path: the framework's optimized path vs. its
naive one on identical hardware.
"""

import os
import sys

# Pallas on the tunneled axon backend needs remote compile; the flag is read
# by sitecustomize at interpreter start, so re-exec if it's missing.
if (
    os.environ.get("JAX_PLATFORMS", "") == "axon"
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("_ESM_TPU_BENCH_REEXEC") != "1"
):
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.environ["_ESM_TPU_BENCH_REEXEC"] = "1"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2

    alphabet = Alphabet.from_architecture("ESM-1b")
    size = esm2.ESM2_SIZES["esm2_t33_650M_UR50D"]
    L = 1022  # residues; +bos/eos = 1024 tokens
    B = 32  # B=32 measures ~4-6% over B=16 on-chip (amortizes per-step overhead)

    cfg_flash = esm2.ESM2Config.from_alphabet(
        alphabet, **size, compute_dtype=jnp.bfloat16, use_flash=True
    )
    cfg_exact = esm2.ESM2Config.from_alphabet(
        alphabet, **size, compute_dtype=jnp.bfloat16, use_flash=False
    )

    params = esm2.init(jax.random.PRNGKey(0), cfg_flash)

    rng = np.random.RandomState(0)
    tokens = np.full((B, L + 2), alphabet.padding_idx, dtype=np.int32)
    tokens[:, 0] = alphabet.cls_idx
    tokens[:, 1 : L + 1] = rng.randint(4, 24, size=(B, L))
    tokens[:, L + 1] = alphabet.eos_idx
    tokens = jnp.asarray(tokens)

    def run(cfg, iters=10):
        # NOTE: on the tunneled axon backend block_until_ready does not
        # actually block — force a device->host readback to time honestly.
        def step():
            out = esm2.apply(params, cfg, tokens)["logits"]
            return float(jnp.sum(out[:, 0, 0]))

        step()  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            step()
        dt = (time.perf_counter() - t0) / iters
        return B / dt  # sequences / sec

    try:
        sps_flash = run(cfg_flash)
    except Exception as e:
        print(f"flash path failed ({type(e).__name__}: {e}); falling back", file=sys.stderr)
        sps_flash = None
    sps_exact = run(cfg_exact)

    best = max(filter(None, [sps_flash, sps_exact]))
    print(
        json.dumps(
            {
                "metric": "esm2_650M_seqs_per_sec_per_chip_L1022",
                "value": round(best, 3),
                "unit": "seq/s",
                "vs_baseline": round(best / sps_exact, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
