"""Flash-attention kernel variant sweep (single-pass path, ESM2-650M shape).

Tests exp vs exp2(folded log2e), pl.reciprocal, and q-block sizes.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)
B, H, T, D = 8, 20, 1024, 64
LOG2E = 1.4426950408889634
q = jax.random.normal(key, (B * H, T, D), jnp.bfloat16) * 0.125
k = jax.random.normal(key, (B * H, T, D), jnp.bfloat16)
v = jax.random.normal(key, (B * H, T, D), jnp.bfloat16)
bias = jnp.zeros((B * H, 1, T), jnp.float32)
FL = 4 * B * H * T * T * D

def k_base(q_ref, k_ref, v_ref, bias_ref, o_ref):
    qq, kk, vv = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(qq, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (pv / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)

def k_exp2(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # caller pre-scales q and bias by log2(e); softmax invariant under the
    # change of base once m is taken in the same units
    qq, kk, vv = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(qq, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (pv / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)

def k_exp2_recip(q_ref, k_ref, v_ref, bias_ref, o_ref):
    qq, kk, vv = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(qq, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (pv * pl.reciprocal(jnp.maximum(l, 1e-30), approx=True)).astype(o_ref.dtype)

def k_exp2_bf16p(q_ref, k_ref, v_ref, bias_ref, o_ref):
    qq, kk, vv = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(qq, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    x = (s - m).astype(jnp.bfloat16)
    p = jnp.exp2(x)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p, vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (pv * pl.reciprocal(jnp.maximum(l, 1e-30), approx=True)).astype(o_ref.dtype)

def run(kern, bq, scale_log2e, iters=20):
    qq = (q * LOG2E).astype(jnp.bfloat16) if scale_log2e else q
    bb = bias * LOG2E if scale_log2e else bias
    call = pl.pallas_call(
        kern,
        grid=(B * H, T // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(flops=FL, bytes_accessed=4 * B * H * T * D * 2, transcendentals=B * H * T * T),
    )

    @jax.jit
    def chain(qq, kk, vv, bb):
        def body(x, _):
            return call(x, kk, vv, bb), None
        x, _ = jax.lax.scan(body, qq, None, length=iters)
        return jnp.sum(x.astype(jnp.float32))

    float(chain(qq, k, v, bb))
    t0 = time.perf_counter()
    r = float(chain(qq, k, v, bb))
    dt = (time.perf_counter() - t0) / iters
    return dt, r

base_dt, base_r = run(k_base, 1024, False)
print(f"base bq=1024:        {base_dt*1e3:7.3f} ms  {FL/base_dt/1e12:5.1f} TF/s  sum={base_r:.4f}", flush=True)
for name, kern, bq, sc in [
    ("base bq=512", k_base, 512, False),
    ("base bq=256", k_base, 256, False),
    ("exp2 bq=1024", k_exp2, 1024, True),
    ("exp2 bq=512", k_exp2, 512, True),
    ("exp2 bq=256", k_exp2, 256, True),
    ("exp2+recip bq=512", k_exp2_recip, 512, True),
    ("exp2+bf16p bq=512", k_exp2_bf16p, 512, True),
    ("exp2+bf16p bq=256", k_exp2_bf16p, 256, True),
]:
    try:
        dt, r = run(kern, bq, sc)
        print(f"{name:20s} {dt*1e3:7.3f} ms  {FL/dt/1e12:5.1f} TF/s  sum={r:.4f} (drift {abs(r-base_r):.2e})", flush=True)
    except Exception as e:
        print(f"{name:20s} FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
