"""On-chip MLM training-step bench (single chip).

Times esm_tpu.training.train_step at a given model size/batch/length with
remat and (optionally) the flash-attention training path. The reference has
no trainer at all (SURVEY §1); these numbers document the training surface.

Usage: python scripts_dev/tpu_train_bench.py [size] [batch] [seqlen]
       [--exact] [--bf16-moments] [--adafactor] [--accum N]
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
    argv = sys.argv[1:]
    if "--accum" in argv:
        i = argv.index("--accum")
        if i + 1 >= len(argv):
            sys.exit("usage: --accum N (microbatch count)")
        accum = int(argv[i + 1])
        del argv[i : i + 2]
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
    )
    t0 = time.perf_counter()
    # init on device
    params = jax.jit(esm2.init, static_argnums=(1,))(jax.random.PRNGKey(0), cfg)
    if adafactor:
        # factored second moment (row/col stats instead of a full nu tree):
        # optimizer state shrinks from 2 x params to ~params/1000 — the
        # long-context single-chip configuration
        tx = optax.adafactor(1e-3)
    else:
        tx = optax.adamw(1e-4, mu_dtype=jnp.bfloat16 if bf16_moments else None)
    state = training.init_state(params, tx)
    jax.block_until_ready(state)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"init {time.perf_counter()-t0:.1f}s  params {n_params/1e6:.0f}M  "
          f"flash={use_flash} remat=True bf16 mu_bf16={bf16_moments} "
          f"adafactor={adafactor} accum={accum}")

    rng = np.random.default_rng(0)
    toks = np.full((batch, seqlen), alphabet.padding_idx, dtype=np.int32)
    toks[:, 0] = alphabet.cls_idx
    toks[:, 1:-1] = 4 + rng.integers(0, 20, (batch, seqlen - 2))
    toks[:, -1] = alphabet.eos_idx
    toks = jnp.asarray(toks)

    def step(state, rng):
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
