import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2

alphabet = Alphabet.from_architecture("ESM-1b")
L = 1022
rng = np.random.RandomState(0)

# 1) streaming contacts, 650M, L=1022 (stacked path would need ~90GB)
size = esm2.ESM2_SIZES["esm2_t33_650M_UR50D"]
cfg = esm2.ESM2Config.from_alphabet(alphabet, **size, compute_dtype=jnp.bfloat16)
params = esm2.init(jax.random.PRNGKey(0), cfg)
tokens = np.full((1, L + 2), alphabet.padding_idx, dtype=np.int32)
tokens[0, 0] = alphabet.cls_idx
tokens[0, 1:L+1] = rng.randint(4, 24, size=L)
tokens[0, L+1] = alphabet.eos_idx
t0 = time.time()
out = esm2.apply(params, cfg, jnp.asarray(tokens), return_contacts=True)
c = np.asarray(out["contacts"])
print(f"650M streaming contacts L={L}: {time.time()-t0:.1f}s (compile+run), "
      f"shape {c.shape} finite={np.isfinite(c).all()}", flush=True)
t0 = time.time()
out = esm2.apply(params, cfg, jnp.asarray(tokens), return_contacts=True)
float(jnp.sum(out["contacts"]))
print(f"steady: {time.time()-t0:.2f}s", flush=True)
del params, out
import gc; gc.collect(); jax.clear_caches()

# 2) full-size ESMFold trunk at L=1022 with chunked triangle attention
from esm_tpu.models import esmfold as ef
from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig
from esm_tpu.models.esmfold.structure_module import StructureModuleConfig
import dataclasses

cfg2 = ef.ESMFoldConfig(
    esm=esm2.ESM2Config.from_alphabet(alphabet, num_layers=2, embed_dim=320,
                                      attention_heads=20, compute_dtype=jnp.bfloat16),
    trunk=FoldingTrunkConfig(max_recycles=1, chunk_size=128),
)
params2 = ef.init_esmfold(jax.random.PRNGKey(1), cfg2, alphabet)
seq = "".join("LAGVSERTID"[rng.randint(10)] for _ in range(1000))
t0 = time.time()
out2 = ef.infer(params2, cfg2, seq, num_recycles=0)
mp = float(np.asarray(out2["mean_plddt"])[0])
print(f"ESMFold 48-block trunk L=1000 chunk=128: {time.time()-t0:.1f}s "
      f"(compile+run) mean_plddt={mp:.1f}", flush=True)
t0 = time.time()
out2 = ef.infer(params2, cfg2, seq, num_recycles=0)
float(np.asarray(out2["mean_plddt"])[0])
print(f"steady fold: {time.time()-t0:.1f}s", flush=True)
