"""On-chip check+bench of the flash-attention backward kernels.

Compares dq/dk/dv against autodiff through exact XLA attention at an ESM-2
650M attention shape, then times fwd+bwd for both paths (readback-synced).
Run under PALLAS_AXON_REMOTE_COMPILE=1.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import time

import jax
import jax.numpy as jnp
import numpy as np

from esm_tpu.kernels.flash_attention import flash_attention
from esm_tpu.ops.common import softmax_fp32
from esm_tpu.ops.rotary import apply_rotary, rotary_tables


def exact(q, k, v, mask):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    logits = jnp.where(mask[:, None, None, :], -jnp.inf, logits)
    return jnp.einsum("bhqk,bhkd->bhqd", softmax_fp32(logits), v)


def main():
    print("devices:", jax.devices())
    b, h, t, d = 8, 20, 1024, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kw = jax.random.split(key, 4)
    q = (jax.random.normal(kq, (b, h, t, d), jnp.float32) * 0.3)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)
    w = jax.random.normal(kw, (b, h, t, d), jnp.float32)
    mask = jnp.zeros((b, t), bool).at[:, 1000:].set(True)
    w = w * (~mask)[:, None, :, None]

    cos, sin = rotary_tables(t, d)

    def loss_exact(q, k, v):
        return jnp.sum(
            exact(apply_rotary(q, cos, sin), apply_rotary(k, cos, sin), v, mask) * w
        )

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, key_padding_mask=mask, rotary=True) * w
        )

    ge = jax.jit(jax.grad(loss_exact, argnums=(0, 1, 2)))
    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))

    t0 = time.perf_counter()
    r_f = gf(q, k, v)
    s = float(sum(jnp.sum(jnp.abs(x)) for x in r_f))
    print(f"flash bwd compile+run {time.perf_counter()-t0:.1f}s checksum {s:.4g}")
    t0 = time.perf_counter()
    r_e = ge(q, k, v)
    s = float(sum(jnp.sum(jnp.abs(x)) for x in r_e))
    print(f"exact bwd compile+run {time.perf_counter()-t0:.1f}s checksum {s:.4g}")

    for a, bb, name in zip(r_f, r_e, "qkv"):
        err = float(jnp.max(jnp.abs(a - bb)))
        ref = float(jnp.max(jnp.abs(bb)))
        print(f"d{name}: max|diff|={err:.3e} (max|exact|={ref:.3e})")

    def timed(fn, n=5):
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn(q, k, v)
            _ = float(jnp.sum(r[0]))  # force device->host readback
            best = min(best, time.perf_counter() - t0)
        return best

    tf = timed(gf)
    te = timed(ge)
    # fwd+bwd attention flops ≈ 3.5 * 4*b*h*t*t*d (fwd 2 matmuls, bwd 5)
    fl = 14 * b * h * t * t * d
    print(f"flash fwd+bwd {tf*1e3:.1f} ms ({fl/tf/1e12:.1f} TF/s)  "
          f"exact fwd+bwd {te*1e3:.1f} ms ({fl/te/1e12:.1f} TF/s)  "
          f"speedup {te/tf:.2f}x")


if __name__ == "__main__":
    main()
