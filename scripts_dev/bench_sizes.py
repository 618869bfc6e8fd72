"""Multi-size throughput measurement on one TPU chip (prints the BENCH_NOTES table)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2

alphabet = Alphabet.from_architecture("ESM-1b")
L = 1022
rng = np.random.RandomState(0)

rows = []
import gc
for name, batch in [("esm2_t6_8M_UR50D", 64), ("esm2_t33_650M_UR50D", 8), ("esm2_t36_3B_UR50D", 2)]:
    size = esm2.ESM2_SIZES[name]
    cfg = esm2.ESM2Config.from_alphabet(alphabet, **size, compute_dtype=jnp.bfloat16, use_flash=True)
    dtype = jnp.bfloat16 if "3B" in name else jnp.float32
    params = esm2.init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    tokens = np.full((batch, L + 2), alphabet.padding_idx, dtype=np.int32)
    tokens[:, 0] = alphabet.cls_idx
    tokens[:, 1:L+1] = rng.randint(4, 24, size=(batch, L))
    tokens[:, L+1] = alphabet.eos_idx
    tokens = jnp.asarray(tokens)

    def step():
        out = esm2.apply(params, cfg, tokens)["logits"]
        return float(jnp.sum(out[:, 0, 0]))
    step()
    iters = 6 if "3B" in name else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    sps = batch / dt
    # params ~ 12 * layers * d^2 (+embeds) ; flops/seq ~ 2*P*T + attn
    p_count = sum(x.size for x in jax.tree.leaves(params))
    flops_seq = 2 * p_count * (L + 2) + size["num_layers"] * 4 * (L+2)**2 * size["embed_dim"]
    tf = flops_seq * sps / 1e12
    rows.append((name, batch, sps, tf, p_count / 1e6))
    print(f"{name}: batch={batch} {sps:.2f} seq/s  ~{tf:.1f} TF/s  ({p_count/1e6:.0f}M params)", flush=True)
    del params, step
    gc.collect()
    jax.clear_caches()

# print the table; BENCH_NOTES.md is curated by hand (do NOT overwrite it —
# it holds sections this script knows nothing about)
print("| model | batch | seq/s/chip | est. TF/s | params |")
print("|---|---|---|---|---|")
for name, batch, sps, tf, pm in rows:
    print(f"| {name} | {batch} | {sps:.2f} | {tf:.1f} | {pm:.0f}M |")
