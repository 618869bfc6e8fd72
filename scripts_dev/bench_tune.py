import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2

alphabet = Alphabet.from_architecture("ESM-1b")
size = esm2.ESM2_SIZES["esm2_t33_650M_UR50D"]
L = 1022
rng = np.random.RandomState(0)

for pdtype, batch in [(jnp.float32, 8), (jnp.bfloat16, 8), (jnp.bfloat16, 16), (jnp.bfloat16, 32)]:
    cfg = esm2.ESM2Config.from_alphabet(alphabet, **size, compute_dtype=jnp.bfloat16, use_flash=True)
    params = esm2.init(jax.random.PRNGKey(0), cfg, dtype=pdtype)
    tokens = np.full((batch, L + 2), alphabet.padding_idx, dtype=np.int32)
    tokens[:, 0] = alphabet.cls_idx
    tokens[:, 1:L+1] = rng.randint(4, 24, size=(batch, L))
    tokens[:, L+1] = alphabet.eos_idx
    tokens = jnp.asarray(tokens)
    def step():
        return float(jnp.sum(esm2.apply(params, cfg, tokens)["logits"][:, 0, 0]))
    step()
    t0 = time.perf_counter()
    for _ in range(8): step()
    dt = (time.perf_counter() - t0) / 8
    print(f"params={pdtype.__name__} batch={batch}: {batch/dt:.2f} seq/s", flush=True)
    del params
    import gc; gc.collect(); jax.clear_caches()
