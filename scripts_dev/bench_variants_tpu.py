"""Zero-shot variant scoring throughput on one chip (masked-marginals).

The reference runs one forward per position serially
(examples/variant-prediction/predict.py:206-215); here positions are masked
in parallel across the device batch.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)

from esm_tpu.cli.predict_variants import masked_marginals
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2
from esm_tpu.pretrained import LMHandle

alphabet = Alphabet.from_architecture("ESM-1b")
size = esm2.ESM2_SIZES["esm2_t33_650M_UR50D"]
cfg = esm2.ESM2Config.from_alphabet(alphabet, **size,
                                    compute_dtype=jnp.bfloat16, use_flash=True)
model = LMHandle("esm2", cfg, esm2.init(jax.random.PRNGKey(0), cfg), alphabet)

rng = np.random.RandomState(0)
L = int(sys.argv[1]) if len(sys.argv) > 1 else 250
seq = "".join("LAGVSERTIDPKQNFYMHWC"[rng.randint(20)] for _ in range(L))
_, _, tokens = alphabet.get_batch_converter()([("wt", seq)])

t0 = time.time()
probs = masked_marginals(model, alphabet, tokens, mask_batch=64)
print(f"compile+run {time.time()-t0:.1f}s, probs {probs.shape}", flush=True)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    probs = masked_marginals(model, alphabet, tokens, mask_batch=64)
    float(jnp.sum(probs)) if hasattr(probs, "dtype") else None
    times.append(time.perf_counter() - t0)
dt = min(times)
print(f"masked-marginals 650M L={L}: {dt:.2f}s = {L/dt:.0f} positions/s "
      f"({dt/L*1e3:.1f} ms/position; reference: one full forward per position)",
      flush=True)
