"""Does flash throughput scale with work? Distinguish fixed grid-step overhead
from a genuine compute ceiling."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from esm_tpu.kernels.flash_attention import flash_attention

print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)

def measure(B, H, T, D, iters=10):
    q = jax.random.normal(key, (B, H, T, D), jnp.bfloat16) * 0.125
    k = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
    @jax.jit
    def chain(q, k, v):
        def body(x, _):
            return flash_attention(x, k, v, interpret=False), None
        x, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(x.astype(jnp.float32)[:1, :1, :1, :1])
    float(chain(q, k, v))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(q, k, v))
        best = min(best, (time.perf_counter() - t0) / iters)
    fl = 4 * B * H * T * T * D
    print(f"B={B:3d} H={H} T={T} D={D}: {best*1e3:8.3f} ms  {fl/best/1e12:5.1f} TF/s", flush=True)

measure(4, 20, 1024, 64)
measure(8, 20, 1024, 64)
measure(16, 20, 1024, 64)
measure(32, 20, 1024, 64)
measure(8, 20, 2048, 64)   # T=2048: 2 kv blocks (online-softmax path)
measure(8, 20, 512, 64)
measure(8, 20, 1024, 128)  # d=128: full MXU width -> if ceiling ~2x, d-width is the limiter
