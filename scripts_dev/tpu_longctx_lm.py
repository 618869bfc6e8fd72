"""Long-context LM forward on one chip: ESM-2 650M at L >> the reference's
1022 truncation default (rotary positions + flash attention make any L valid;
the reference's ESM-1b-era 1022 cap comes from learned positional embeddings,
scripts/extract.py:52-57). Measures seq/s and tok/s at growing L.

Usage: python scripts_dev/tpu_longctx_lm.py [size] [L ...]
"""
import os, sys
sys.path.insert(0, "/root/repo")
if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import time
import jax, jax.numpy as jnp, numpy as np
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2

def main():
    args = sys.argv[1:]
    size = args[0] if args else "esm2_t33_650M_UR50D"
    lens = [int(a) for a in args[1:]] or [1024, 2048, 4096, 8192]
    print("devices:", jax.devices())
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, **esm2.ESM2_SIZES[size],
        compute_dtype=jnp.bfloat16, use_flash=True,
    )
    params = jax.jit(esm2.init, static_argnums=(1,))(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    for L in lens:
        toks = np.full((1, L), alphabet.padding_idx, np.int32)
        toks[:, 0] = alphabet.cls_idx
        toks[:, 1:-1] = 4 + rng.integers(0, 20, (1, L - 2))
        toks[:, -1] = alphabet.eos_idx
        toks = jnp.asarray(toks)
        t0 = time.perf_counter()
        out = esm2.apply(params, cfg, toks)
        _ = float(jnp.sum(out["logits"]))  # force readback
        compile_s = time.perf_counter() - t0
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            out = esm2.apply(params, cfg, toks)
            _ = float(jnp.sum(out["logits"]))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"L={L:5d}  compile {compile_s:5.1f}s  steady {best*1e3:7.1f} ms  "
              f"{L/best/1e3:6.1f}k tok/s", flush=True)

if __name__ == "__main__":
    main()
