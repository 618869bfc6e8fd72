"""MSA Transformer + ESM-IF1 shapes on one chip (BENCH_NOTES rows)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)

from esm_tpu.data import Alphabet
from esm_tpu.models import msa_transformer

# esm_msa1b size: 12 layers, d=768, 12 heads; depth 64, L 256
alphabet = Alphabet.from_architecture("msa_transformer")
cfg = msa_transformer.MSATransformerConfig.from_alphabet(alphabet)
params = msa_transformer.init(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
R, C = 64, 256
toks = rng.randint(4, 24, size=(1, R, C)).astype(np.int32)
toks[:, :, 0] = alphabet.cls_idx
def step():
    return float(jnp.sum(msa_transformer.apply(params, cfg, jnp.asarray(toks))["logits"][0,0,0]))
step()
t0 = time.perf_counter()
for _ in range(5): step()
dt = (time.perf_counter()-t0)/5
print(f"MSA-1b-size fwd depth={R} L={C}: {dt*1e3:.0f} ms/MSA", flush=True)
del params
import gc; gc.collect(); jax.clear_caches()

