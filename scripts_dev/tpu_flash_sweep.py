import sys, time, itertools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from esm_tpu.kernels.flash_attention import flash_attention
print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)
b, h, t, d = 8, 20, 1024, 64
q = jax.random.normal(key, (b, h, t, d), jnp.bfloat16) * 0.125
k = jax.random.normal(key, (b, h, t, d), jnp.bfloat16)
v = jax.random.normal(key, (b, h, t, d), jnp.bfloat16)
fl = 4*b*h*t*t*d*20

for bq, bk in [(256,256),(256,512),(512,512),(512,1024),(1024,512),(1024,1024),(128,1024),(256,1024)]:
    @jax.jit
    def chain(q, k, v, bq=bq, bk=bk):
        def body(x, _):
            return flash_attention(x, k, v, block_q=bq, block_k=bk, interpret=False), None
        x, _ = jax.lax.scan(body, q, None, length=20)
        return jnp.sum(x.astype(jnp.float32))
    try:
        s0 = float(chain(q,k,v))
        t0=time.time(); s1 = float(chain(q,k,v)); dt=time.time()-t0
        print(f"bq={bq} bk={bk}: {dt/20*1e3:.2f}ms/iter {fl/dt/1e12:.1f} TF/s", flush=True)
    except Exception as e:
        print(f"bq={bq} bk={bk}: FAIL {type(e).__name__} {str(e)[:80]}", flush=True)
