"""MSA Transformer on-chip: fp32 vs bf16, multiple shapes, per-op splits."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)

from esm_tpu.data import Alphabet
from esm_tpu.models import msa_transformer
from esm_tpu.ops.axial_attention import row_self_attention, column_self_attention

alphabet = Alphabet.from_architecture("msa_transformer")
rng = np.random.RandomState(0)


def bench_model(R, C, dtype, iters=5):
    cfg = msa_transformer.MSATransformerConfig.from_alphabet(
        alphabet, compute_dtype=dtype, max_tokens_per_msa=1 << 62
    )
    params = msa_transformer.init(jax.random.PRNGKey(0), cfg)
    toks = rng.randint(4, 24, size=(1, R, C)).astype(np.int32)
    toks[:, :, 0] = alphabet.cls_idx
    toks = jnp.asarray(toks)

    def step():
        return float(jnp.sum(msa_transformer.apply(params, cfg, toks)["logits"][0, 0, 0]))

    step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    # model FLOPs: 2*P*tokens + axial attention terms
    p = sum(x.size for x in jax.tree.leaves(params))
    toks_n = R * C
    d, H, nl = cfg.embed_dim, cfg.attention_heads, cfg.num_layers
    attn = nl * (4 * C * C * R * d + 4 * R * R * C * d)  # row(tied)+col logits+ctx
    tf = (2 * p * toks_n + attn) / dt / 1e12
    print(f"  R={R:4d} C={C:4d} {np.dtype(dtype).name:8s}: {dt*1e3:7.1f} ms/MSA  "
          f"{toks_n/dt/1e3:7.1f} ktok/s  ~{tf:5.1f} TF/s", flush=True)
    del params
    import gc; gc.collect()
    jax.clear_caches()
    return dt


def bench_ops(R, C, dtype, iters=20):
    d, H = 768, 12
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (1, R, C, d), dtype)
    p = {n: {"kernel": jax.random.normal(k2, (d, d), dtype) * 0.02,
             "bias": jnp.zeros((d,), dtype)}
         for n in ("q_proj", "k_proj", "v_proj", "out_proj")}
    mask = jnp.zeros((1, R, C), bool)

    @jax.jit
    def row(x):
        out, _ = row_self_attention(p, x, num_heads=H, padding_mask=mask)
        return out

    @jax.jit
    def col(x):
        out, _ = column_self_attention(p, x, num_heads=H, padding_mask=mask)
        return out

    for name, f in (("row", row), ("col", col)):
        float(jnp.sum(f(x)[0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(jnp.sum(f(x)[0, 0, 0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name}-attn R={R} C={C} {np.dtype(dtype).name}: {dt*1e3:6.2f} ms/op",
              flush=True)


import os
todo = os.environ.get("MSA_BENCH", "model").split(",")
if "model" in todo:
    print("full model:", flush=True)
    for R, C in [(64, 256), (128, 512)]:
        for dtype in (jnp.float32, jnp.bfloat16):
            bench_model(R, C, dtype)
if "ops" in todo:
    print("ops (single layer's attention, no LN/FFN):", flush=True)
    for dtype in (jnp.float32, jnp.bfloat16):
        bench_ops(128, 512, dtype)
