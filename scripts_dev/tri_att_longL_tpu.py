"""Long-L triangle attention on chip: chunked XLA vs fused strip kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from esm_tpu.models.esmfold.init import _KeyGen, init_trunk_block
from esm_tpu.ops.triangle import triangle_attention

print("devices:", jax.devices(), flush=True)
c_z, H = 128, 4
N = 4
dt = jnp.bfloat16
kg = _KeyGen(jax.random.PRNGKey(0))
params = init_trunk_block(kg, 1024, c_z)["tri_att_start"]


def bench(name, fn, z0):
    @jax.jit
    def chain(x):
        def body(x, _):
            return (x * 0.5 + fn(x) * 0.5), None
        x, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(x.astype(jnp.float32))
    float(chain(z0))
    t0 = time.perf_counter()
    float(chain(z0))
    sec = (time.perf_counter() - t0) / N
    print(f"{name:44s} {sec*1e3:8.2f} ms", flush=True)


for L in (1536, 2048):
    key = jax.random.PRNGKey(1)
    z0 = jax.random.normal(key, (1, L, L, c_z), dt) * 0.1
    mask = jnp.ones((1, L, L), dt)
    print(f"--- L={L}", flush=True)
    bench(
        f"L={L} chunked XLA (chunk=128)",
        lambda z: triangle_attention(
            params, z, num_heads=H, starting=True, mask=mask, chunk_size=128
        ),
        z0,
    )
    bench(
        f"L={L} fused strip kernel",
        lambda z: triangle_attention(
            params, z, num_heads=H, starting=True, mask=mask, use_flash=True
        ),
        z0,
    )
