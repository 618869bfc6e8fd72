import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
print("devices:", jax.devices(), flush=True)

def k(i_ref, o_ref):
    o_ref[:] = i_ref[:] * 2.0

x = jnp.ones((256, 256), jnp.float32)
t0 = time.time()
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
jax.block_until_ready(y)
print("pallas double ok", float(y[0,0]), f"{time.time()-t0:.1f}s", flush=True)

t0 = time.time()
z = jnp.dot(x, x); jax.block_until_ready(z)
print("plain dot ok", f"{time.time()-t0:.1f}s", flush=True)
