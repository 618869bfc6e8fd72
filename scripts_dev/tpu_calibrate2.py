"""More GEMM calibration: sizes, LM shapes, independent (non-chained) GEMMs."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)

def timeit(chain, *args, iters=20):
    float(chain(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

def chained(f, iters=20):
    @jax.jit
    def chain(x, *rest):
        def body(x, _):
            return f(x, *rest), None
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(x.astype(jnp.float32)[:1, :1])
    return chain

for n in (2048, 4096, 8192):
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = jax.random.normal(key, (n, n), jnp.bfloat16)
    f = lambda x, b: (jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16) * jnp.bfloat16(1 / n))
    dt = timeit(chained(f), a, b)
    print(f"square {n}^3 bf16 chained:    {2*n**3/dt/1e12:6.1f} TF/s", flush=True)

# independent GEMMs in one dispatch: y_i = a_i @ b (batch 8 of 4096^2)
n = 4096
A = jax.random.normal(key, (8, n, n), jnp.bfloat16)
b = jax.random.normal(key, (n, n), jnp.bfloat16)
@jax.jit
def indep(A, b):
    y = jnp.einsum("bij,jk->bik", A, b, preferred_element_type=jnp.bfloat16)
    return jnp.sum(y.astype(jnp.float32)[:, :1, :1])
float(indep(A, b))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); float(indep(A, b)); best = min(best, time.perf_counter() - t0)
print(f"8x independent 4096^3 bf16:   {8*2*n**3/best/1e12:6.1f} TF/s", flush=True)

# LM-shaped: (8192, 1280) @ (1280, 5120) fp32-accum chained via down-proj
M, K, N = 8192, 1280, 5120
x = jax.random.normal(key, (M, K), jnp.bfloat16) * 0.02
w1 = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
w2 = jax.random.normal(key, (N, K), jnp.bfloat16) * 0.02
def lm(x, w1, w2):
    h = jax.lax.dot(x, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jax.lax.dot(h, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
dt = timeit(chained(lm), x, w1, w2)
print(f"LM MLP GEMMs fp32-acc:        {2*2*M*K*N/dt/1e12:6.1f} TF/s", flush=True)

def lmb(x, w1, w2):
    h = jax.lax.dot(x, w1, preferred_element_type=jnp.bfloat16)
    return jax.lax.dot(h, w2, preferred_element_type=jnp.bfloat16) * jnp.bfloat16(0.01)
dt = timeit(chained(lmb), x, w1, w2)
print(f"LM MLP GEMMs bf16-acc:        {2*2*M*K*N/dt/1e12:6.1f} TF/s", flush=True)
