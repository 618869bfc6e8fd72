"""Compare triangle-attention (ending-node) plumbing variants on chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from esm_tpu.models.esmfold.init import _KeyGen, init_trunk_block
from esm_tpu.ops.common import layer_norm, linear
from esm_tpu.kernels.triangle_attention import NEG_INF, triangle_attention_fused

print("devices:", jax.devices(), flush=True)
L, c_z, H = 1000, 128, 4
d = c_z // H
N = 10
dt = jnp.bfloat16
kg = _KeyGen(jax.random.PRNGKey(0))
params = init_trunk_block(kg, 1024, c_z)["tri_att_end"]
mha = params["mha"]
key = jax.random.PRNGKey(1)
z0 = jax.random.normal(key, (1, L, L, c_z), dt) * 0.1
mask = jnp.ones((1, L, L), dt)

def bench(name, fn):
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

def variant_old(z):  # transpose z, separate projections, heads5
    z = jnp.swapaxes(z, -2, -3)
    m = jnp.swapaxes(mask, -1, -2)
    zn = layer_norm(params["layer_norm"], z)
    tri = linear(params["linear"], zn)
    b, i, j, c = zn.shape
    def heads5(t):  # kernel layout (B, I, H, d, J)
        return t.reshape(b, i, j, H, d).transpose(0, 1, 3, 4, 2)
    q = heads5(linear(mha["linear_q"], zn)) / (d ** 0.5)
    k = heads5(linear(mha["linear_k"], zn))
    v = heads5(linear(mha["linear_v"], zn))
    tri_b = jnp.transpose(tri, (0, 3, 1, 2)).astype(jnp.float32)
    kb = jnp.where(m > 0, 0.0, NEG_INF).astype(jnp.float32)
    o = triangle_attention_fused(q, k, v, tri_b, kb)
    o = o.transpose(0, 1, 4, 2, 3).reshape(b, i, j, c)
    g = jax.nn.sigmoid(linear(mha["linear_g"], zn))
    o = linear(mha["linear_o"], o * g)
    return jnp.swapaxes(o, -2, -3)

def variant_nosawp_sep(z):  # no z transpose, separate projections, col-major heads
    zn = layer_norm(params["layer_norm"], z)
    tri = linear(params["linear"], zn)
    b, i, j, c = zn.shape
    def headsT(t):
        return t.reshape(b, i, j, H, d).transpose(0, 2, 3, 4, 1)  # (B,J,H,d,I)
    q = headsT(linear(mha["linear_q"], zn)) / (d ** 0.5)
    k = headsT(linear(mha["linear_k"], zn))
    v = headsT(linear(mha["linear_v"], zn))
    tri_b = jnp.transpose(tri, (0, 3, 2, 1)).astype(jnp.float32)
    kb = jnp.where(jnp.swapaxes(mask, -1, -2) > 0, 0.0, NEG_INF).astype(jnp.float32)
    o = triangle_attention_fused(q, k, v, tri_b, kb)
    o = o.transpose(0, 4, 1, 2, 3).reshape(b, i, j, c)
    g = jax.nn.sigmoid(linear(mha["linear_g"], zn))
    return linear(mha["linear_o"], o * g)

def variant_fusedqkv_sep(z):  # no z transpose, one qkv GEMM, per-slice transposes
    zn = layer_norm(params["layer_norm"], z)
    tri = linear(params["linear"], zn)
    b, i, j, c = zn.shape
    kern = jnp.concatenate([mha["linear_q"]["kernel"], mha["linear_k"]["kernel"],
                            mha["linear_v"]["kernel"]], axis=1)
    qkv = jnp.dot(zn, kern.astype(zn.dtype))
    def headsT(t):
        return t.reshape(b, i, j, H, d).transpose(0, 2, 3, 4, 1)
    q = headsT(qkv[..., :c]) / (d ** 0.5)
    k = headsT(qkv[..., c:2 * c])
    v = headsT(qkv[..., 2 * c:])
    tri_b = jnp.transpose(tri, (0, 3, 2, 1)).astype(jnp.float32)
    kb = jnp.where(jnp.swapaxes(mask, -1, -2) > 0, 0.0, NEG_INF).astype(jnp.float32)
    o = triangle_attention_fused(q, k, v, tri_b, kb)
    o = o.transpose(0, 4, 1, 2, 3).reshape(b, i, j, c)
    g = jax.nn.sigmoid(linear(mha["linear_g"], zn))
    return linear(mha["linear_o"], o * g)

bench("old: z-swap + sep proj", variant_old)
bench("no-swap + sep proj", variant_nosawp_sep)
bench("no-swap + fused qkv GEMM", variant_fusedqkv_sep)
