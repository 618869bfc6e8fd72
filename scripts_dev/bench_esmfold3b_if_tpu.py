"""Production-size benchmarks on one chip:
  1. esmfold_v1-size ESMFold (3B LM + 48-block trunk), random bf16 weights
  2. full-size ESM-IF1 (gvp4, 8+8 layers, d=512) autoregressive decode
Usage: python bench_esmfold3b_if_tpu.py [esmfold|if] [L ...]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(0)
which = sys.argv[1] if len(sys.argv) > 1 else "esmfold"

if which == "esmfold":
    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2, esmfold as ef
    from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = ef.ESMFoldConfig(
        esm=esm2.ESM2Config.from_alphabet(
            alphabet, **esm2.ESM2_SIZES["esm2_t36_3B_UR50D"],
            compute_dtype=jnp.bfloat16,
        ),
        trunk=FoldingTrunkConfig(max_recycles=1, compute_dtype=jnp.bfloat16,
                                 use_flash_tri=True),
    )
    t0 = time.time()
    params = ef.init_esmfold(jax.random.PRNGKey(1), cfg, alphabet,
                             dtype=jnp.bfloat16)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"init {n/1e9:.2f}B params in {time.time()-t0:.0f}s", flush=True)
    if os.environ.get("ESMFOLD_INT8"):
        from esm_tpu.quantization import param_bytes, quantize_params

        before = param_bytes(params)
        params = quantize_params(params)
        print(f"int8: {before/1e9:.1f} -> {param_bytes(params)/1e9:.1f} GB",
              flush=True)
    args = sys.argv[2:]
    recycles = 0
    if "--recycles" in args:
        i = args.index("--recycles")
        recycles = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    for L in (int(a) for a in (args or ["384", "1000"])):
        seq = "".join("LAGVSERTID"[rng.randint(10)] for _ in range(L))
        t0 = time.time()
        out = ef.infer(params, cfg, seq, num_recycles=recycles)
        mp = float(np.asarray(out["mean_plddt"])[0])
        print(f"esmfold_v1-size L={L} recycles={recycles}: compile+run "
              f"{time.time()-t0:.1f}s plddt={mp:.1f}", flush=True)
        del out
        t0 = time.time()
        out = ef.infer(params, cfg, seq, num_recycles=recycles)
        float(np.asarray(out["mean_plddt"])[0])
        print(f"steady L={L} recycles={recycles}: {time.time()-t0:.1f}s",
              flush=True)
        del out
else:
    from esm_tpu.data import Alphabet
    from esm_tpu.models import inverse_folding as ifm

    alphabet = Alphabet.from_architecture("invariant_gvp")
    cfg = ifm.GVPTransformerConfig.from_alphabet(alphabet)  # esm_if1 size
    params = ifm.init(jax.random.PRNGKey(0), cfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"init {n/1e6:.0f}M params", flush=True)
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    t = np.arange(L)[:, None].astype(np.float32)
    ca = np.concatenate([np.cos(t*0.6)*2.3, np.sin(t*0.6)*2.3, t*1.5], -1)
    coords = np.stack([ca + [1.2, 0, 0], ca, ca + [0, 1.2, 0]], 1).astype(np.float32)
    t0 = time.time()
    seq = ifm.sample(params, cfg, alphabet, coords, temperature=1.0, seed=1)
    print(f"IF1 decode L={L}: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for s in range(3):
        t0 = time.time()
        seq = ifm.sample(params, cfg, alphabet, coords, temperature=1.0, seed=s)
        times.append(time.time() - t0)
    dt = min(times)
    print(f"IF1 decode L={L}: {dt:.2f}s steady = {L/dt:.0f} aa/s", flush=True)
    ll, _ = ifm.score_sequence(params, cfg, alphabet, coords, "A" * L)
    t0 = time.time()
    for _ in range(3):
        ll, _ = ifm.score_sequence(params, cfg, alphabet, coords, "A" * L)
        float(ll)
    print(f"IF1 teacher-forced score L={L}: {(time.time()-t0)/3*1e3:.0f} ms", flush=True)
