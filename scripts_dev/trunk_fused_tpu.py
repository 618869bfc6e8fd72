import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2, esmfold as ef
from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig
print("devices:", jax.devices(), flush=True)

alphabet = Alphabet.from_architecture("ESM-1b")
rng = np.random.RandomState(0)
seq = "".join("LAGVSERTID"[rng.randint(10)] for _ in range(1000))

cfg = ef.ESMFoldConfig(
    esm=esm2.ESM2Config.from_alphabet(alphabet, num_layers=2, embed_dim=320,
                                      attention_heads=20, compute_dtype=jnp.bfloat16),
    trunk=FoldingTrunkConfig(max_recycles=1, compute_dtype=jnp.bfloat16,
                             use_flash_tri=True),
)
params = ef.init_esmfold(jax.random.PRNGKey(1), cfg, alphabet)
t0 = time.time()
out = ef.infer(params, cfg, seq, num_recycles=0)
mp = float(np.asarray(out["mean_plddt"])[0])
print(f"fused tri bf16 L=1000: compile+run {time.time()-t0:.1f}s plddt={mp:.1f}", flush=True)
t0 = time.time()
out = ef.infer(params, cfg, seq, num_recycles=0)
float(np.asarray(out["mean_plddt"])[0])
print(f"steady: {time.time()-t0:.1f}s", flush=True)
