"""T=512 flash block-structure measurement (round-3: last roofline row).

At T=512 a whole B=8,H=20 call is ~0.2 ms of device time — the same order as
the host's per-dispatch cost through the tunnel, so dispatch-loop timing
(even amortized) measures the host, not the kernel; that is why the first
sweep's numbers swung 3x between rounds. This script uses the MARGINAL
method instead: time the kernel at B=32 and B=64 with amortized dispatch
loops (>=0.4 s of device work each) and report

    rate = extra_flops / (t(B64) - t(B32))

— every per-launch constant (host dispatch, grid setup) cancels in the
subtraction. Probes get the same treatment so the ceiling is like-for-like.

Run ALONE on the chip.
"""
import os, sys
sys.path.insert(0, "/root/repo")
if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax, jax.numpy as jnp, numpy as np
from esm_tpu.utils.profiling import timed_amortized as timed
from esm_tpu.kernels.flash_attention import _flash_padded

H, T, D = 20, 512, 64


def lib_time(b, block_q, block_h, masked, iters):
    bh = b * H
    key = jax.random.PRNGKey(4)
    q = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    k = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    v = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    bias = jnp.zeros((b, 1, T), jnp.float32)
    if masked:
        bias = bias.at[:, 0, -7:].set(-1e30)

    def run(q, k, v):
        return _flash_padded(
            q, k, v, bias, None, None, num_heads=H, block_q=block_q,
            block_k=T, interpret=False, block_h=block_h, has_bias=masked,
        )

    return timed(jax.jit(run), q, k, v, iters=iters)


def probe_time(b, variant, block_q, block_h, iters):
    from scripts_dev.tpu_roofline3 import probe_variant_rate
    # probe_variant_rate returns (rate, t_total); re-derive t for batch b
    r, t = probe_variant_rate(b, H, T, D, variant, block_q, block_h)
    return t


def marginal_rate(fn, label):
    """fn(b, iters) -> per-iter seconds. Marginal TF/s between B=32 and 64."""
    fl_extra = 4.0 * 32 * H * T * T * D
    best = 0.0
    ts = []
    for _ in range(3):
        t32 = fn(32, 400)
        t64 = fn(64, 200)
        dt = t64 - t32
        ts.append((t32, t64))
        if dt > 0:
            best = max(best, fl_extra / dt / 1e12)
    print(f"{label:>34}: {best:6.1f} TF/s marginal   "
          + "  ".join(f"({a*1e3:.3f}->{b*1e3:.3f}ms)" for a, b in ts),
          flush=True)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    cands = [(512, 1), (512, 4), (512, 5), (256, 10)]
    for bq, bh in cands:
        marginal_rate(lambda b, it: lib_time(b, bq, bh, False, it),
                      f"lib bq={bq} bh={bh} maskless")
        marginal_rate(lambda b, it: lib_time(b, bq, bh, True, it),
                      f"lib bq={bq} bh={bh} masked")
    for variant in ("nosm", "exp"):
        for bq, bh in ((512, 4), (512, 1)):
            marginal_rate(lambda b, it: probe_time(b, variant, bq, bh, it),
                          f"probe {variant} bq={bq} bh={bh}")


if __name__ == "__main__":
    main()
