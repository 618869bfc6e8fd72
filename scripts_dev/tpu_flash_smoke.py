import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)
from esm_tpu.kernels.flash_attention import flash_attention
from esm_tpu.ops.common import softmax_fp32

def exact(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    probs = softmax_fp32(logits)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

exact_j = jax.jit(exact)

for dtype in (jnp.float32, jnp.bfloat16):
    b, h, t, d = 8, 20, 1024, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, t, d), dtype) * 0.125
    k = jax.random.normal(key, (b, h, t, d), dtype)
    v = jax.random.normal(key, (b, h, t, d), dtype)

    of = flash_attention(q, k, v, interpret=False)
    jax.block_until_ready(of)
    oe = exact_j(q, k, v); jax.block_until_ready(oe)
    err = np.abs(np.asarray(of, np.float32) - np.asarray(oe, np.float32)).max()
    t0=time.time()
    for _ in range(10): of = flash_attention(q, k, v, interpret=False)
    jax.block_until_ready(of); tf=(time.time()-t0)/10
    t0=time.time()
    for _ in range(10): oe = exact_j(q, k, v)
    jax.block_until_ready(oe); te=(time.time()-t0)/10
    flops = 4*b*h*t*t*d
    print(f"{dtype.__name__}: max_err {err:.2e}  flash {tf*1e3:.2f}ms ({flops/tf/1e12:.1f} TF/s)  exact {te*1e3:.2f}ms ({flops/te/1e12:.1f} TF/s)", flush=True)
