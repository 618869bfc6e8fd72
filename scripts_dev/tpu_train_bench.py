"""On-chip MLM training-step bench (single chip).

Times esm_tpu.training.train_step at a given model size/batch/length with
remat and (optionally) the flash-attention training path. The reference has
no trainer at all (SURVEY §1); these numbers document the training surface.

Usage: python scripts_dev/tpu_train_bench.py [size] [batch] [seqlen]
       [--exact] [--bf16-moments] [--adafactor] [--accum N]
       [--lora R] [--bf16-base] [--int8-base]

--lora R: parameter-efficient step (training.train_step_lora) — frozen base
+ rank-R adapters; --bf16-base / --int8-base set the frozen base's storage
dtype (full-FT needs fp32 master weights; a frozen base does not).
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
import optax

from esm_tpu import training
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2


def main():
    use_flash = "--exact" not in sys.argv
    bf16_moments = "--bf16-moments" in sys.argv
    adafactor = "--adafactor" in sys.argv
    accum = 1
    lora_rank = 0
    bf16_base = "--bf16-base" in sys.argv
    int8_base = "--int8-base" in sys.argv
    full_remat = "--full-remat" in sys.argv
    argv = [a for a in sys.argv[1:]
            if a not in ("--bf16-base", "--int8-base", "--full-remat")]
    if "--accum" in argv:
        i = argv.index("--accum")
        if i + 1 >= len(argv):
            sys.exit("usage: --accum N (microbatch count)")
        accum = int(argv[i + 1])
        del argv[i : i + 2]
    if "--lora" in argv:
        i = argv.index("--lora")
        if i + 1 >= len(argv):
            sys.exit("usage: --lora R (adapter rank)")
        lora_rank = int(argv[i + 1])
        del argv[i : i + 2]
    if lora_rank and accum > 1:
        sys.exit("--lora does not compose with --accum (single-step path)")
    args = [a for a in argv if not a.startswith("--")]
    size = args[0] if len(args) > 0 else "esm2_t33_650M_UR50D"
    batch = int(args[1]) if len(args) > 1 else 4  # B=8 OOMs at 650M/L=1024
    seqlen = int(args[2]) if len(args) > 2 else 1024
    print("devices:", jax.devices())

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet,
        **esm2.ESM2_SIZES[size],
        compute_dtype=jnp.bfloat16,
        use_flash=use_flash,
        remat=True,
        remat_policy="full" if full_remat else "dots",
    )
    t0 = time.perf_counter()
    # init on device; a FROZEN base (LoRA) needs no fp32 master copy, so
    # build it in its storage dtype directly (no fp32 transient in HBM)
    if lora_rank and bf16_base:
        params = jax.jit(esm2.init, static_argnums=(1, 2))(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16
        )
    elif lora_rank and int8_base:
        # synthetic int8 weights built directly on device (same approach as
        # bench_15b_int8_tpu.py): at 15B a float transient would never fit
        MIN_SIZE = 1 << 16
        shapes = jax.eval_shape(
            lambda k: esm2.init(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
        )

        def build(node, key):
            if isinstance(node, dict):
                if ("kernel" in node and node["kernel"].ndim >= 2
                        and node["kernel"].size >= MIN_SIZE):
                    ks = jax.random.split(key, 2)
                    out = {
                        "kernel": jax.random.randint(
                            ks[0], node["kernel"].shape, -127, 128,
                            dtype=jnp.int8,
                        ),
                        "scale": jnp.full(
                            node["kernel"].shape[:-2] + node["kernel"].shape[-1:],
                            0.02 / 127.0, jnp.float32,
                        ),
                    }
                    if "bias" in node:
                        out["bias"] = jnp.zeros(
                            node["bias"].shape, node["bias"].dtype
                        )
                    return out
                keys = jax.random.split(key, max(len(node), 1))
                return {k: build(v, kk)
                        for (k, v), kk in zip(node.items(), keys)}
            return (jax.random.normal(key, node.shape, node.dtype) * 0.02
                    if jnp.issubdtype(node.dtype, jnp.floating)
                    else jnp.zeros(node.shape, node.dtype))

        params = jax.jit(lambda k: build(shapes, k))(jax.random.PRNGKey(0))
    else:
        params = jax.jit(esm2.init, static_argnums=(1,))(jax.random.PRNGKey(0), cfg)
    adapters = None
    if lora_rank:
        from esm_tpu import lora

        adapters = lora.init_lora(
            jax.random.PRNGKey(7), params, rank=lora_rank
        )
    if adafactor:
        # factored second moment (row/col stats instead of a full nu tree):
        # optimizer state shrinks from 2 x params to ~params/1000 — the
        # long-context single-chip configuration
        tx = optax.adafactor(1e-3)
    else:
        tx = optax.adamw(1e-4, mu_dtype=jnp.bfloat16 if bf16_moments else None)
    state = training.init_state(adapters if lora_rank else params, tx)
    jax.block_until_ready(state)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    lora_note = ""
    if lora_rank:
        n_adapt = sum(x.size for x in jax.tree.leaves(adapters))
        base_kind = "int8" if int8_base else ("bf16" if bf16_base else "fp32")
        lora_note = f" lora_r={lora_rank} ({n_adapt/1e6:.1f}M) base={base_kind}"
    print(f"init {time.perf_counter()-t0:.1f}s  params {n_params/1e6:.0f}M  "
          f"flash={use_flash} remat=True bf16 mu_bf16={bf16_moments} "
          f"adafactor={adafactor} accum={accum}{lora_note}")

    rng = np.random.default_rng(0)
    toks = np.full((batch, seqlen), alphabet.padding_idx, dtype=np.int32)
    toks[:, 0] = alphabet.cls_idx
    toks[:, 1:-1] = 4 + rng.integers(0, 20, (batch, seqlen - 2))
    toks[:, -1] = alphabet.eos_idx
    toks = jnp.asarray(toks)

    def step(state, rng):
        if lora_rank:
            return training.train_step_lora(state, params, cfg, tx, rng, toks)
        if accum > 1:
            return training.train_step_accum(state, cfg, tx, rng, toks, accum_steps=accum)
        return training.train_step(state, cfg, tx, rng, toks)

    t0 = time.perf_counter()
    state, metrics = step(state, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # forces readback
    print(f"step0 (compile) {time.perf_counter()-t0:.1f}s loss {loss:.3f}")

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        state, metrics = step(state, jax.random.PRNGKey(2 + i))
        loss = float(metrics["loss"])  # device->host sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    toks_s = batch * seqlen / best
    print(f"steady step {best*1e3:.0f} ms  {batch/best:.2f} seq/s  "
          f"{toks_s/1e3:.1f}k tok/s  loss {loss:.3f}")
    # rough model flops: 6*N*tokens (fwd+bwd) + attention 12*L*T^2*H*d... report 6N only
    print(f"~{6*n_params*batch*seqlen/best/1e12:.1f} TF/s (6N·tok/s estimate)")


if __name__ == "__main__":
    main()
