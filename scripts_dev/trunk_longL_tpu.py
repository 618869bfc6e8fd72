"""Full-size 48-block ESMFold trunk at L>1024 with the fused strip kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2, esmfold as ef
from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig
print("devices:", jax.devices(), flush=True)

alphabet = Alphabet.from_architecture("ESM-1b")
rng = np.random.RandomState(0)

cfg = ef.ESMFoldConfig(
    esm=esm2.ESM2Config.from_alphabet(alphabet, num_layers=2, embed_dim=320,
                                      attention_heads=20, compute_dtype=jnp.bfloat16),
    trunk=FoldingTrunkConfig(max_recycles=1, compute_dtype=jnp.bfloat16,
                             use_flash_tri=True),
)
params = ef.init_esmfold(jax.random.PRNGKey(1), cfg, alphabet)

for L in (int(a) for a in (sys.argv[1:] or ["1536", "2048"])):
    seq = "".join("LAGVSERTID"[rng.randint(10)] for _ in range(L))
    t0 = time.time()
    out = ef.infer(params, cfg, seq, num_recycles=0)
    mp = float(np.asarray(out["mean_plddt"])[0])
    print(f"fused tri bf16 L={L}: compile+run {time.time()-t0:.1f}s plddt={mp:.1f}",
          flush=True)
    del out  # the O(L^2) outputs (PAE etc.) would double peak HBM on the re-run
    t0 = time.time()
    out = ef.infer(params, cfg, seq, num_recycles=0)
    float(np.asarray(out["mean_plddt"])[0])
    print(f"steady L={L}: {time.time()-t0:.1f}s", flush=True)
    del out
