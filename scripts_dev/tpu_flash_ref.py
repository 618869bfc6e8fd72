import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jax_flash, BlockSizes
print("devices:", jax.devices(), flush=True)

b, h, t, d = 8, 20, 1024, 64
key = jax.random.PRNGKey(0)
for dtype in (jnp.bfloat16,):
    q = jax.random.normal(key, (b, h, t, d), dtype) * 0.125
    k = jax.random.normal(key, (b, h, t, d), dtype)
    v = jax.random.normal(key, (b, h, t, d), dtype)
    f = jax.jit(lambda q,k,v: jax_flash(q, k, v, causal=False, sm_scale=1.0))
    o = f(q,k,v); jax.block_until_ready(o)
    t0=time.time()
    for _ in range(20): o = f(q,k,v)
    jax.block_until_ready(o); dt=(time.time()-t0)/20
    flops = 4*b*h*t*t*d
    print(f"jax pallas flash {dtype.__name__}: {dt*1e3:.2f}ms ({flops/dt/1e12:.1f} TF/s)", flush=True)

# also raw matmul roofline check
for dtype in (jnp.bfloat16,):
    a_ = jax.random.normal(key, (4096, 4096), dtype)
    b_ = jax.random.normal(key, (4096, 4096), dtype)
    mm = jax.jit(lambda x,y: x@y)
    o = mm(a_,b_); jax.block_until_ready(o)
    t0=time.time()
    for _ in range(50): o = mm(a_,b_)
    jax.block_until_ready(o); dt=(time.time()-t0)/50
    fl = 2*4096**3
    print(f"matmul 4096^3 {dtype.__name__}: {dt*1e3:.2f}ms ({fl/dt/1e12:.1f} TF/s)", flush=True)
