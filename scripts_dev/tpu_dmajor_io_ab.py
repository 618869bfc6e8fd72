"""A/B: native d-major IO (projections emit (B, D, T), no relay transposes)
vs the round-4 relay path, in ONE process (tunnel variance ±20-30% across
processes). ABA ordering bounds drift; jax.clear_caches() between arms (an
A/B without it measures the cached trace of the first arm — BENCH_NOTES
round-4 lesson). VERDICT r4 item 3.

Run: PALLAS_AXON_REMOTE_COMPILE=1 JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache \
     python -u scripts_dev/tpu_dmajor_io_ab.py > /tmp/dmab.log 2>&1
"""
import gc
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

import esm_tpu.ops.attention as attn_mod
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2

alphabet = Alphabet.from_architecture("ESM-1b")
size = esm2.ESM2_SIZES["esm2_t33_650M_UR50D"]
cfg = esm2.ESM2Config.from_alphabet(
    alphabet, **size, compute_dtype=jnp.bfloat16, use_flash=True
)
params = esm2.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)


def make_tokens(batch, L, pad_tail=0):
    tokens = np.full((batch, L + 2), alphabet.padding_idx, dtype=np.int32)
    tokens[:, 0] = alphabet.cls_idx
    tokens[:, 1 : L + 1] = rng.randint(4, 24, size=(batch, L))
    tokens[:, L + 1] = alphabet.eos_idx
    if pad_tail:  # real ragged batch: some rows shorter (mask engages)
        for i in range(batch // 2):
            cut = L + 1 - pad_tail
            tokens[i, cut] = alphabet.eos_idx
            tokens[i, cut + 1 :] = alphabet.padding_idx
    return jnp.asarray(tokens)


def measure(tokens, reps=8):
    def step():
        return float(jnp.sum(esm2.apply(params, cfg, tokens)["logits"][:, 0, 0]))

    chk = step()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        step()
    dt = (time.perf_counter() - t0) / reps
    return dt, chk


SHAPES = [
    ("650M B=32 L=1022", dict(batch=32, L=1022, pad_tail=120)),
    ("650M B=64 T=512", dict(batch=64, L=510, pad_tail=60)),
]

for label, kw in SHAPES:
    tokens = make_tokens(**kw)
    results = {}
    for arm in ("relay", "dmajor", "relay2"):
        attn_mod.DMAJOR_IO_DEFAULT = arm == "dmajor"
        jax.clear_caches()
        gc.collect()
        dt, chk = measure(tokens)
        results[arm] = (dt, chk)
        b = kw["batch"]
        print(
            f"{label} [{arm}]: {dt * 1e3:.1f} ms/step = {b / dt:.2f} seq/s "
            f"(chk {chk:.4f})",
            flush=True,
        )
    attn_mod.DMAJOR_IO_DEFAULT = True
    r = (results["relay"][0] + results["relay2"][0]) / 2
    d = results["dmajor"][0]
    print(
        f"{label}: dmajor vs relay(avg of 2): {(r / d - 1) * 100:+.1f}% "
        f"(relay {r * 1e3:.1f} ms, dmajor {d * 1e3:.1f} ms); "
        f"chk diff {abs(results['relay'][1] - results['dmajor'][1]):.4f}",
        flush=True,
    )
    del tokens
    gc.collect()
