"""650M headline variants in ONE process (tunnel variance ±20-30% across runs):
bf16 B=32 (current headline), bf16 B=64, int8 B=32, int8 B=64.
"""
import sys, time, gc
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2
from esm_tpu.quantization import quantize_params

alphabet = Alphabet.from_architecture("ESM-1b")
size = esm2.ESM2_SIZES["esm2_t33_650M_UR50D"]
L = 1022
rng = np.random.RandomState(0)

cfg = esm2.ESM2Config.from_alphabet(alphabet, **size, compute_dtype=jnp.bfloat16, use_flash=True)
params = esm2.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
qparams = quantize_params(params)

def make_tokens(batch):
    tokens = np.full((batch, L + 2), alphabet.padding_idx, dtype=np.int32)
    tokens[:, 0] = alphabet.cls_idx
    tokens[:, 1:L+1] = rng.randint(4, 24, size=(batch, L))
    tokens[:, L+1] = alphabet.eos_idx
    return jnp.asarray(tokens)

for name, p in [("bf16", params), ("int8", qparams)]:
    for batch in (32, 64):
        tokens = make_tokens(batch)
        def step():
            return float(jnp.sum(esm2.apply(p, cfg, tokens)["logits"][:, 0, 0]))
        try:
            step()
            t0 = time.perf_counter()
            for _ in range(8):
                step()
            dt = (time.perf_counter() - t0) / 8
            print(f"{name} B={batch}: {batch/dt:.2f} seq/s ({dt*1e3:.1f} ms/step)", flush=True)
        except Exception as e:
            print(f"{name} B={batch}: FAILED {type(e).__name__}: {e}", flush=True)
        del tokens
        gc.collect()
