"""On-chip numerical parity of the head-batched (block_h) and bias-free
single-pass flash paths vs exact XLA attention — interpret-mode CPU parity
(tests/test_flash_attention.py) does not exercise real Mosaic compilation.
Run ALONE on the chip. Measured 2026-08: max|diff| <= 9.4e-4 fp32 (chip
matmuls round via bf16), 6.1e-3 bf16, all shapes, masked+maskless."""
import os, sys
sys.path.insert(0, "/root/repo")
if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
    # must be set at interpreter start (CLAUDE.md) — re-exec like bench.py
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)
import jax, jax.numpy as jnp, numpy as np
from esm_tpu.kernels.flash_attention import flash_attention, _pick_block_h
print("devices:", jax.devices())


def exact(q, k, v, mask=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], -1e30, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


rng = np.random.RandomState(0)
for (b, h, t) in [(2, 20, 512), (2, 20, 384), (1, 4, 256), (2, 20, 1024)]:
    bh = _pick_block_h(h, min(1024, t), t, 64)
    q = jnp.asarray(rng.randn(b, h, t, 64), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(b, h, t, 64), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(b, h, t, 64), jnp.float32)
    mask = np.zeros((b, t), bool)
    mask[0, t - 9:] = True
    mask = jnp.asarray(mask)
    for m, label in [(None, "maskless"), (mask, "masked")]:
        o = flash_attention(q, k, v, key_padding_mask=m, interpret=False)
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - exact(q, k, v, m))))
        print(f"b{b} h{h} t{t} block_h={bh} {label}: max|diff|={err:.2e}")
        assert err < 5e-3, (b, h, t, label, err)
qb = jnp.asarray(rng.randn(2, 20, 512, 64), jnp.bfloat16)
o = flash_attention(qb, qb, qb, interpret=False)
e = exact(qb.astype(jnp.float32), qb.astype(jnp.float32), qb.astype(jnp.float32))
err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - e)))
print("bf16 t512 maskless: max|diff|=", err)
assert err < 0.05
print("CHIP PARITY OK")
