"""Calibrate chip peak: big GEMM, attention-shaped batched GEMMs (pure XLA),
and the flash kernel — all readback-synced, min of 3."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)

def timeit(chain, *args, iters=20):
    float(chain(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

def chain_of(f, iters=20):
    @jax.jit
    def chain(x, *rest):
        def body(x, _):
            return f(x, *rest), None
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(x.astype(jnp.float32)[:1, :1])
    return chain

# 1. big square GEMM bf16
n = 4096
a = jax.random.normal(key, (n, n), jnp.bfloat16) * 0.01
b = jax.random.normal(key, (n, n), jnp.bfloat16) * 0.01
f = lambda x, b: jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16)
dt = timeit(chain_of(f), a, b)
print(f"square GEMM {n}^3 bf16:        {2*n**3/dt/1e12:6.1f} TF/s", flush=True)

# 1b. fp32 accum
f32 = lambda x, b: jax.lax.dot(x, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
dt = timeit(chain_of(f32), a, b)
print(f"square GEMM fp32-accum:        {2*n**3/dt/1e12:6.1f} TF/s", flush=True)

# 2. attention-shaped batched GEMM: (160,1024,64)@(160,64,1024) pure XLA
BH, T, D = 160, 1024, 64
q = jax.random.normal(key, (BH, T, D), jnp.bfloat16) * 0.1
kT = jax.random.normal(key, (BH, D, T), jnp.bfloat16) * 0.1
def qk(x, kT):
    s = jax.lax.dot_general(x, kT, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    # reduce back to x's shape to keep the chain going
    return jnp.einsum("btk,bkd->btd", s.astype(jnp.bfloat16), jnp.swapaxes(kT, 1, 2)) * 1e-3
dt = timeit(chain_of(qk), q, kT)
fl = (2 * BH * T * T * D) * 2
print(f"XLA batched QK+PV (fp32 acc):  {fl/dt/1e12:6.1f} TF/s", flush=True)

# 3. XLA full attention (materialized softmax)
def attn(x, kT):
    s = jax.lax.dot_general(x, kT, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("btk,bkd->btd", p, jnp.swapaxes(kT, 1, 2))
dt = timeit(chain_of(attn), q, kT)
print(f"XLA attention e2e:             {fl/dt/1e12:6.1f} TF/s  ({dt*1e3:.2f} ms)", flush=True)

# 4. my flash kernel (readback-synced)
from esm_tpu.kernels.flash_attention import flash_attention
q4 = q.reshape(8, 20, T, D)
k4 = jax.random.normal(key, (8, 20, T, D), jnp.bfloat16)
v4 = jax.random.normal(key, (8, 20, T, D), jnp.bfloat16)
f = lambda x, k4, v4: flash_attention(x, k4, v4, interpret=False)
dt = timeit(chain_of(f), q4, k4, v4)
print(f"my flash kernel:               {fl/dt/1e12:6.1f} TF/s  ({dt*1e3:.2f} ms)", flush=True)
