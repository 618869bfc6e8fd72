"""ESM2-15B weight-only int8 on ONE chip (the reference needs FSDP CPU
offload for this model on a single device). Params are built directly on the
TPU in quantized form (random values — capacity/throughput measurement), so
nothing crosses the tunnel.
Usage: python bench_15b_int8_tpu.py [model_size] [B] [L]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2

size_name = sys.argv[1] if len(sys.argv) > 1 else "esm2_t48_15B_UR50D"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
L = int(sys.argv[3]) if len(sys.argv) > 3 else 1022

alphabet = Alphabet.from_architecture("ESM-1b")
cfg = esm2.ESM2Config.from_alphabet(
    alphabet, **esm2.ESM2_SIZES[size_name],
    compute_dtype=jnp.bfloat16, use_flash=True,
)

MIN_SIZE = 1 << 16
shapes = jax.eval_shape(lambda k: esm2.init(k, cfg, dtype=jnp.bfloat16),
                        jax.random.PRNGKey(0))


def build(node, key):
    """Device-side builder mirroring quantization.quantize_params selection."""
    if isinstance(node, dict):
        if "kernel" in node and node["kernel"].ndim >= 2 and node["kernel"].size >= MIN_SIZE:
            ks = jax.random.split(key, 2)
            out = {
                "kernel": jax.random.randint(
                    ks[0], node["kernel"].shape, -127, 128, dtype=jnp.int8
                ),
                "scale": jnp.full(node["kernel"].shape[:-2] + node["kernel"].shape[-1:],
                                  0.02 / 127.0, jnp.float32),
            }
            if "bias" in node:
                out["bias"] = jnp.zeros(node["bias"].shape, node["bias"].dtype)
            return out
        keys = jax.random.split(key, max(len(node), 1))
        return {k: build(v, kk) for (k, v), kk in zip(node.items(), keys)}
    return (jax.random.normal(key, node.shape, node.dtype) * 0.02
            if jnp.issubdtype(node.dtype, jnp.floating)
            else jnp.zeros(node.shape, node.dtype))


t0 = time.time()
params = jax.jit(lambda k: build(shapes, k))(jax.random.PRNGKey(1))
# block_until_ready does not block on the tunneled backend — force a readback
float(jnp.sum(params["embed_tokens"]["weight"].astype(jnp.float32)))
nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
n = sum(x.size for x in jax.tree.leaves(params))
print(f"built {n/1e9:.2f}B params, {nbytes/1e9:.1f} GB on device, "
      f"{time.time()-t0:.0f}s", flush=True)

rng = np.random.RandomState(0)
tokens = np.full((B, L + 2), alphabet.padding_idx, dtype=np.int32)
tokens[:, 0] = alphabet.cls_idx
tokens[:, 1:L+1] = rng.randint(4, 24, size=(B, L))
tokens[:, L+1] = alphabet.eos_idx
tokens = jnp.asarray(tokens)

def step():
    return float(jnp.sum(esm2.apply(params, cfg, tokens)["logits"][:, 0, 0]))

t0 = time.time()
step()
print(f"compile+run {time.time()-t0:.1f}s", flush=True)
iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    step()
dt = (time.perf_counter() - t0) / iters
print(f"{size_name} int8 B={B} L={L}: {dt*1e3:.0f} ms = {B/dt:.2f} seq/s "
      f"on ONE chip", flush=True)
