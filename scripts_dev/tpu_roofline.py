import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)

# chained matmuls: each iteration depends on the previous -> no caching
n = 4096
a = jax.random.normal(key, (n, n), jnp.bfloat16)
b = jax.random.normal(key, (n, n), jnp.bfloat16)

@jax.jit
def chain(a, b):
    def body(x, _):
        return jax.lax.dot(x, b, precision=None, preferred_element_type=jnp.bfloat16) * (1.0/n), None
    x, _ = jax.lax.scan(body, a, None, length=50)
    return x

o = chain(a, b); jax.block_until_ready(o)
t0=time.time(); o = chain(a, b); jax.block_until_ready(o); dt=time.time()-t0
fl = 2*n**3*50
print(f"chained matmul: {dt*1e3:.1f}ms total, {fl/dt/1e12:.1f} TF/s", flush=True)

# chained flash attention (mine)
from esm_tpu.kernels.flash_attention import flash_attention
bb, h, t, d = 8, 20, 1024, 64
q = jax.random.normal(key, (bb, h, t, d), jnp.bfloat16) * 0.125
k = jax.random.normal(key, (bb, h, t, d), jnp.bfloat16)
v = jax.random.normal(key, (bb, h, t, d), jnp.bfloat16)

@jax.jit
def chain_flash(q, k, v):
    def body(x, _):
        o = flash_attention(x, k, v, interpret=False)
        return o, None
    x, _ = jax.lax.scan(body, q, None, length=20)
    return x

o = chain_flash(q,k,v); jax.block_until_ready(o)
t0=time.time(); o = chain_flash(q,k,v); jax.block_until_ready(o); dt=time.time()-t0
fl = 4*bb*h*t*t*d*20
print(f"chained my-flash: {dt/20*1e3:.2f}ms/iter, {fl/dt/1e12:.1f} TF/s", flush=True)

from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jax_flash
@jax.jit
def chain_jf(q, k, v):
    def body(x, _):
        o = jax_flash(x, k, v, causal=False, sm_scale=1.0)
        return o, None
    x, _ = jax.lax.scan(body, q, None, length=20)
    return x
o = chain_jf(q,k,v); jax.block_until_ready(o)
t0=time.time(); o = chain_jf(q,k,v); jax.block_until_ready(o); dt=time.time()-t0
print(f"chained jax-flash: {dt/20*1e3:.2f}ms/iter, {fl/dt/1e12:.1f} TF/s", flush=True)
