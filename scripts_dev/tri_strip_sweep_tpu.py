"""block_q sweep for the triangle-attention strip kernel at long J."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from esm_tpu.kernels.triangle_attention import NEG_INF, triangle_attention_fused

print("devices:", jax.devices(), flush=True)
B, I_AX, H, D = 1, None, 4, 32
N = 8

for L in (1536, 2048):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, L, H, D, L), jnp.bfloat16) * 0.1
    k = jax.random.normal(ks[1], (B, L, H, D, L), jnp.bfloat16) * 0.1
    v = jax.random.normal(ks[2], (B, L, H, D, L), jnp.bfloat16) * 0.1
    tri = jax.random.normal(ks[3], (B, H, L, L), jnp.float32) * 0.5
    maskb = jnp.zeros((B, L, L), jnp.float32)
    for bq in (256, 512, 768, 1024):
        if L % bq:
            continue

        @jax.jit
        def chain(q):
            def body(q, _):
                o = triangle_attention_fused(q, k, v, tri, maskb, block_q=bq)
                return (q * 0.5 + o * 0.5).astype(q.dtype), None
            q, _ = jax.lax.scan(body, q, None, length=N)
            return jnp.sum(q.astype(jnp.float32))

        float(chain(q))
        t0 = time.perf_counter()
        float(chain(q))
        dt = (time.perf_counter() - t0) / N
        tf = 4 * B * L * H * L * L * D / dt / 1e12
        print(f"L={L} block_q={bq:5d}: {dt*1e3:7.2f} ms  {tf:5.1f} TF/s", flush=True)
