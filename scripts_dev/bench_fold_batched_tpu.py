"""Batched ESMFold throughput at short L on one chip.

The fold CLI packs sequences into token-budget device batches
(cli/fold.py create_batched_sequence_dataset, reference scripts/fold.py).
This measures what the budget should be on TPU: structures/s for the
esmfold_v1-size model (3B LM + 48-block trunk, random bf16 weights) at
L=256 with device batch B in {1, 4, 8} — at short L the per-dispatch
overhead and underfilled pair GEMMs amortize across the batch.

Run ALONE on the chip. Usage: python bench_fold_batched_tpu.py [L [B ...]]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2, esmfold as ef
from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig
from esm_tpu.utils.profiling import tunnel_roundtrip

print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(0)
L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
batches = [int(b) for b in sys.argv[2:]] or [1, 4, 8]

alphabet = Alphabet.from_architecture("ESM-1b")
cfg = ef.ESMFoldConfig(
    esm=esm2.ESM2Config.from_alphabet(
        alphabet, **esm2.ESM2_SIZES["esm2_t36_3B_UR50D"],
        compute_dtype=jnp.bfloat16,
    ),
    trunk=FoldingTrunkConfig(
        max_recycles=1, compute_dtype=jnp.bfloat16, use_flash_tri=True
    ),
)
t0 = time.time()
params = ef.init_esmfold(jax.random.PRNGKey(1), cfg, alphabet, dtype=jnp.bfloat16)
n = sum(x.size for x in jax.tree.leaves(params))
print(f"init {n/1e9:.2f}B params in {time.time()-t0:.0f}s", flush=True)
rt = tunnel_roundtrip()
print(f"(tunnel roundtrip {rt*1e3:.0f} ms)", flush=True)

for B in batches:
    seqs = [
        "".join("LAGVSERTID"[rng.randint(10)] for _ in range(L)) for _ in range(B)
    ]
    t0 = time.time()
    out = ef.infer(params, cfg, seqs, num_recycles=0, frugal=True)
    float(np.asarray(out["mean_plddt"])[0])
    print(f"B={B} L={L}: compile+run {time.time()-t0:.1f}s", flush=True)
    del out
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = ef.infer(params, cfg, seqs, num_recycles=0, frugal=True)
        float(np.asarray(out["mean_plddt"])[0])
        best = min(best, time.time() - t0)
        del out
    print(
        f"B={B} L={L}: steady {best:.2f}s = {B/best:.2f} structures/s "
        f"({best - rt:.2f}s device)", flush=True,
    )
