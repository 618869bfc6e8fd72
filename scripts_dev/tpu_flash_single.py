import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
print("devices:", jax.devices(), flush=True)

def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    q = q_ref[0]; k = k_ref[0]; v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (pv / l).astype(o_ref.dtype)

@functools.partial(jax.jit, static_argnames=("bq",))
def single(q, k, v, bias, bq=1024):
    bh, t, d = q.shape
    return pl.pallas_call(
        _kernel,
        grid=(bh, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(q, k, v, bias)

key = jax.random.PRNGKey(0)
b, h, t, d = 8, 20, 1024, 64
q = (jax.random.normal(key, (b*h, t, d), jnp.bfloat16) * 0.125)
k = jax.random.normal(key, (b*h, t, d), jnp.bfloat16)
v = jax.random.normal(key, (b*h, t, d), jnp.bfloat16)
bias = jnp.zeros((b*h, 1, t), jnp.float32)
fl = 4*b*h*t*t*d*20

for bq in (1024, 512, 256):
    @jax.jit
    def chain(q, k, v, bias, bq=bq):
        def body(x, _):
            return single(x, k, v, bias, bq=bq), None
        x, _ = jax.lax.scan(body, q, None, length=20)
        return jnp.sum(x.astype(jnp.float32))
    s0 = float(chain(q,k,v,bias))
    t0=time.time(); s1=float(chain(q,k,v,bias)); dt=time.time()-t0
    print(f"single-pass bq={bq}: {dt/20*1e3:.2f}ms/iter {fl/dt/1e12:.1f} TF/s", flush=True)
