"""Long-context CONTACT MAPS on one chip (the reference truncates at 1022,
scripts/extract.py:52-57). The streaming contact path contracts each layer's
attention heads into the running APC sum inside the scan
(models/esm2._stack_with_streaming_contacts), so the (B, Lyr, H, T, T) stack
never materializes — contacts scale to multi-k L on one chip.
Measured 2026-08 (650M bf16, B=1, steady): L=2048 0.6 s, L=4096 2.8 s.
Run ALONE on the chip."""
import os, sys, time
sys.path.insert(0, "/root/repo")
if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
    # must be set at interpreter start (CLAUDE.md) — re-exec like bench.py
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)
import jax, jax.numpy as jnp, numpy as np
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2

print("devices:", jax.devices())
alphabet = Alphabet.from_architecture("ESM-1b")
cfg = esm2.ESM2Config.from_alphabet(
    alphabet, **esm2.ESM2_SIZES["esm2_t33_650M_UR50D"], compute_dtype=jnp.bfloat16
)
params = jax.jit(esm2.init, static_argnums=(1,))(jax.random.PRNGKey(0), cfg)
jax.block_until_ready(params)
rng = np.random.RandomState(0)
for L in (int(a) for a in (sys.argv[1:] or ["2048", "4096"])):
    toks = np.full((1, L), alphabet.padding_idx, np.int32)
    toks[:, 0] = alphabet.cls_idx
    toks[:, 1:-1] = 4 + rng.randint(0, 20, (1, L - 2))
    toks[:, -1] = alphabet.eos_idx
    t0 = time.time()
    out = esm2.apply(params, cfg, jnp.asarray(toks), return_contacts=True)
    c = np.asarray(out["contacts"])
    print(f"L={L}: contacts {c.shape} finite={np.isfinite(c).all()} "
          f"compile+run {time.time()-t0:.1f}s")
    del out
    t0 = time.time()
    out = esm2.apply(params, cfg, jnp.asarray(toks), return_contacts=True)
    float(np.asarray(out["contacts"]).sum())
    print(f"L={L}: steady {time.time()-t0:.1f}s")
    del out
