"""Is one (D,3D) QKV GEMM faster than three (D,D) GEMMs at 650M shapes?
Measures the projection stage in isolation (33 layers worth), then a full
ESM2-650M forward with q/k/v fused via a prepared-params transform.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

B, T, D = 32, 1024, 1280
NL = 33
x = jax.random.normal(jax.random.PRNGKey(0), (B * T, D), jnp.bfloat16)
w3 = [jax.random.normal(jax.random.PRNGKey(i), (D, D), jnp.bfloat16) for i in range(3)]
wf = jnp.concatenate(w3, axis=1)  # (D, 3D)

@jax.jit
def sep(x, w3):
    for _ in range(NL):
        q = x @ w3[0]; k = x @ w3[1]; v = x @ w3[2]
        x = q + k + v  # force dependence so layers serialize like a real stack
        x = x / jnp.float32(3.0).astype(x.dtype)
    return x

@jax.jit
def fused(x, wf):
    for _ in range(NL):
        qkv = x @ wf
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = q + k + v
        x = x / jnp.float32(3.0).astype(x.dtype)
    return x

def timeit(f, *args):
    r = f(*args); float(jnp.sum(r[:1, :1]))
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(*args); float(jnp.sum(r[:1, :1]))
    return (time.perf_counter() - t0) / 10

t_sep = timeit(sep, x, w3)
t_fus = timeit(fused, x, wf)
print(f"33-layer qkv stage: separate {t_sep*1e3:.1f} ms, fused {t_fus*1e3:.1f} ms "
      f"({t_sep/t_fus:.3f}x)", flush=True)
