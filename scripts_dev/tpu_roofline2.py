import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)
n = 4096
a = jax.random.normal(key, (n, n), jnp.bfloat16)
b = jax.random.normal(key, (n, n), jnp.bfloat16)

@jax.jit
def chain(a, b, steps):
    def body(x, _):
        return jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16) * jnp.bfloat16(1.0/n), None
    x, _ = jax.lax.scan(body, a, None, length=50)
    return jnp.sum(x.astype(jnp.float32))

# warmup + readback
s0 = float(chain(a, b, None)); 
t0=time.time(); s1 = float(chain(a, b, None)); dt=time.time()-t0
fl = 2*n**3*50
print(f"matmul chain w/ readback: {dt*1e3:.1f}ms, {fl/dt/1e12:.1f} TF/s (sum={s1:.3f})", flush=True)

from esm_tpu.kernels.flash_attention import flash_attention
bb, h, t, d = 8, 20, 1024, 64
q = jax.random.normal(key, (bb, h, t, d), jnp.bfloat16) * 0.125
k = jax.random.normal(key, (bb, h, t, d), jnp.bfloat16)
v = jax.random.normal(key, (bb, h, t, d), jnp.bfloat16)

@jax.jit
def chain_flash(q, k, v):
    def body(x, _):
        return flash_attention(x, k, v, interpret=False), None
    x, _ = jax.lax.scan(body, q, None, length=20)
    return jnp.sum(x.astype(jnp.float32))
s0 = float(chain_flash(q,k,v))
t0=time.time(); s1 = float(chain_flash(q,k,v)); dt=time.time()-t0
fl = 4*bb*h*t*t*d*20
print(f"my-flash chain w/ readback: {dt/20*1e3:.2f}ms/iter, {fl/dt/1e12:.1f} TF/s", flush=True)

from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jax_flash
@jax.jit
def chain_jf(q, k, v):
    def body(x, _):
        return jax_flash(x, k, v, causal=False, sm_scale=1.0), None
    x, _ = jax.lax.scan(body, q, None, length=20)
    return jnp.sum(x.astype(jnp.float32))
s0 = float(chain_jf(q,k,v))
t0=time.time(); s1 = float(chain_jf(q,k,v)); dt=time.time()-t0
print(f"jax-flash chain w/ readback: {dt/20*1e3:.2f}ms/iter, {fl/dt/1e12:.1f} TF/s", flush=True)
