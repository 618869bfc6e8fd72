"""Isolate the per-iteration fixed overhead: lax.scan vs unrolled python loop
vs one fat op, for GEMMs and for the flash kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from esm_tpu.kernels.flash_attention import flash_attention

print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)
n = 2048
a = jax.random.normal(key, (n, n), jnp.bfloat16)
b = jax.random.normal(key, (n, n), jnp.bfloat16)
ITERS = 20
FL_G = 2 * n**3 * ITERS

def timeit(fn, *args):
    float(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best

@jax.jit
def g_scan(a, b):
    def body(x, _):
        return jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16) * jnp.bfloat16(1 / n), None
    x, _ = jax.lax.scan(body, a, None, length=ITERS)
    return jnp.sum(x.astype(jnp.float32)[:1, :1])

@jax.jit
def g_unroll(a, b):
    x = a
    for _ in range(ITERS):
        x = jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16) * jnp.bfloat16(1 / n)
    return jnp.sum(x.astype(jnp.float32)[:1, :1])

dt = timeit(g_scan, a, b);   print(f"GEMM {n}^3 x{ITERS} scan:    {dt*1e3:7.2f} ms  {FL_G/dt/1e12:5.1f} TF/s", flush=True)
dt = timeit(g_unroll, a, b); print(f"GEMM {n}^3 x{ITERS} unroll:  {dt*1e3:7.2f} ms  {FL_G/dt/1e12:5.1f} TF/s", flush=True)

B, H, T, D = 8, 20, 1024, 64
q = jax.random.normal(key, (B, H, T, D), jnp.bfloat16) * 0.125
k = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
v = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
FL_F = 4 * B * H * T * T * D * ITERS

@jax.jit
def f_scan(q, k, v):
    def body(x, _):
        return flash_attention(x, k, v, interpret=False), None
    x, _ = jax.lax.scan(body, q, None, length=ITERS)
    return jnp.sum(x.astype(jnp.float32)[:1, :1, :1, :1])

@jax.jit
def f_unroll(q, k, v):
    x = q
    for _ in range(ITERS):
        x = flash_attention(x, k, v, interpret=False)
    return jnp.sum(x.astype(jnp.float32)[:1, :1, :1, :1])

dt = timeit(f_scan, q, k, v);   print(f"flash x{ITERS} scan:         {dt*1e3:7.2f} ms  {FL_F/dt/1e12:5.1f} TF/s", flush=True)
dt = timeit(f_unroll, q, k, v); print(f"flash x{ITERS} unroll:       {dt*1e3:7.2f} ms  {FL_F/dt/1e12:5.1f} TF/s", flush=True)

# single call, readback-timed (what e2e sees once per layer)
@jax.jit
def f_one(q, k, v):
    return jnp.sum(flash_attention(q, k, v, interpret=False).astype(jnp.float32)[:1, :1, :1, :1])
dt = timeit(f_one, q, k, v)
print(f"flash single call:        {dt*1e3:7.2f} ms  {FL_F/ITERS/dt/1e12:5.1f} TF/s (incl. roundtrip)", flush=True)
