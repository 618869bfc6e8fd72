"""Mixed /embed + /fold serving under over-saturation (cost-weighted admission).

The round-3 admission measurement was /embed-only; this drives the realistic
deployment — one server exposing BOTH endpoints — where a fold costs 2-3
orders of magnitude more chip time than an embed, so a sequence-count cap
says nothing about drain time. Measures, per kind: accepted/429 counts,
served throughput, client-side latency percentiles over accepted requests,
and the learned cost units.

Models: random-init ESM2-650M (bf16+flash) for /embed; random-init
esmfold_v1-size ESMFold (3B LM + 48-block trunk, bf16, flash-tri) for /fold
at a short bucketed length (L=96 -> bucket 128, num_recycles=0) so the bench
is tractable on one chip.

Run ALONE on the chip. Usage:
  python scripts_dev/bench_serve_mixed_tpu.py [--budget S|none] [--embed-rate R]
      [--fold-rate F] [--n-embed N] [--n-fold M] [--fold-only]
Rows for BENCH_NOTES: --fold-only (closed-loop fold throughput), then the
mixed pass with --budget none vs a finite budget.
"""
import os, sys
sys.path.insert(0, "/root/repo")
if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
    os.execv(sys.executable, [sys.executable] + sys.argv)

import json, threading, time, urllib.error, urllib.request

import jax, jax.numpy as jnp

if "--tiny" in sys.argv:  # CPU smoke of the harness itself (no chip time)
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2, esmfold as ef
from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig
from esm_tpu.pretrained import ESMFoldHandle, LMHandle
from esm_tpu.runtime.server import InferenceServer

def getarg(name, default, cast=float):
    if name in sys.argv:
        v = sys.argv[sys.argv.index(name) + 1]
        return None if v == "none" else cast(v)
    return default


# --fold-len 1000 measures admission honesty at the L>=1024 bucket, where
# the cubic cost model matters (round-5 VERDICT item 1); default stays the
# short tractable bucket
FOLD_L = getarg("--fold-len", 96, int)


def main():
    budget = getarg("--budget", 8.0)
    embed_rate = getarg("--embed-rate", 120.0)
    fold_rate = getarg("--fold-rate", 1.0)
    n_embed = getarg("--n-embed", 768, int)
    n_fold = getarg("--n-fold", 12, int)
    tiny = "--tiny" in sys.argv
    if tiny:
        n_embed, n_fold = min(n_embed, 48), min(n_fold, 4)
        embed_rate, fold_rate = 50.0, 2.0
    print("devices:", jax.devices(), flush=True)

    alphabet = Alphabet.from_architecture("ESM-1b")
    if tiny:
        lm_cfg = esm2.ESM2Config.from_alphabet(
            alphabet, num_layers=2, embed_dim=32, attention_heads=2
        )
    else:
        lm_cfg = esm2.ESM2Config.from_alphabet(
            alphabet, **esm2.ESM2_SIZES["esm2_t33_650M_UR50D"],
            compute_dtype=jnp.bfloat16, use_flash=True,
        )
    t0 = time.time()
    lm_params = jax.jit(esm2.init, static_argnums=(1,))(jax.random.PRNGKey(0), lm_cfg)
    jax.block_until_ready(lm_params)
    model = LMHandle("esm2", lm_cfg, lm_params, alphabet)

    if tiny:
        from esm_tpu.models.esmfold.structure_module import StructureModuleConfig

        fold_cfg = ef.ESMFoldConfig(
            esm=lm_cfg,
            trunk=FoldingTrunkConfig(
                num_blocks=1, sequence_state_dim=32, pairwise_state_dim=32,
                sequence_head_width=16, pairwise_head_width=16, max_recycles=1,
                structure_module=StructureModuleConfig(
                    c_s=32, c_z=32, c_ipa=8, c_resnet=16, no_heads_ipa=4,
                    no_blocks=1,
                ),
            ),
        )
    else:
        fold_cfg = ef.ESMFoldConfig(
            esm=esm2.ESM2Config.from_alphabet(
                alphabet, **esm2.ESM2_SIZES["esm2_t36_3B_UR50D"],
                compute_dtype=jnp.bfloat16,
            ),
            trunk=FoldingTrunkConfig(
                max_recycles=1, compute_dtype=jnp.bfloat16, use_flash_tri=True
            ),
        )
    fold_params = ef.init_esmfold(
        jax.random.PRNGKey(1), fold_cfg, alphabet, dtype=jnp.bfloat16
    )
    n = sum(x.size for x in jax.tree.leaves(fold_params)) + sum(
        x.size for x in jax.tree.leaves(lm_params)
    )
    fold_model = ESMFoldHandle(fold_cfg, fold_params, alphabet)
    print(f"init {n/1e9:.2f}B total params in {time.time()-t0:.0f}s", flush=True)

    # at the long bucket a single fold already fills most of HBM (plan_fold);
    # B=2 OOMs — the realistic long-L serving config is per-structure dispatch
    fold_batch = 2 if FOLD_L <= 512 else 1
    srv = InferenceServer(
        model,
        fold_model=fold_model,
        max_batch_seqs=16,
        max_fold_batch_seqs=fold_batch,
        max_wait_ms=20.0,
        refill_wait_ms=80.0,
        batch_bucket="max",
        max_queued_seqs=256,
        max_queued_seconds=budget,
        max_fold_seq_len=max(512, FOLD_L + 64),
    ).start()
    print(f"url {srv.url}  budget={budget}s", flush=True)

    rng = np.random.default_rng(0)
    aas = "LAGVSERTIDPKQNFYMHWC"

    def seq(n):
        return "".join(aas[i] for i in rng.integers(0, 20, n))

    embed_lens = [int(l) for l in rng.choice([250, 380, 500, 1000, 1022], n_embed)]
    embed_seqs = [seq(l) for l in embed_lens]
    fold_seqs = [seq(FOLD_L) for _ in range(n_fold)]

    def post(path, payload):
        req = urllib.request.Request(
            srv.url + path, data=json.dumps(payload).encode())
        try:
            with urllib.request.urlopen(req, timeout=900) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            if e.code != 429:  # surface the server-side error body
                print(f"HTTP {e.code} on {path}: {e.read()[:500]}", flush=True)
            raise

    # ---- warmup: compile every (B, T) embed bucket + the fold shapes
    # (the fold-only baseline never posts an embed — skip its ~6 min of
    # bucket compiles)
    t0 = time.perf_counter()
    if "--fold-only" not in sys.argv:
        for l in sorted({-(-(l + 2) // 128) * 128 - 2 for l in embed_lens}):
            post("/embed", {"sequences": [seq(l)], "include": ["mean"]})
            post("/embed", {"sequences": [seq(l)] * 16, "include": ["mean"]})
    nshapes = srv.prewarm_fold(
        [FOLD_L], batch_sizes=tuple(range(1, fold_batch + 1)), num_recycles=0
    )
    print(f"warmup (compiles + {nshapes} fold shapes): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    # settle pass: the warmup posts fed compile-dominated observations into
    # the cost EMAs (growth-clamped, but still inflated); a short burst of
    # steady-state batches converges the units before anything is measured
    t0 = time.perf_counter()
    idx = iter(range(64 if not tiny else 16))
    ilock = threading.Lock()

    def settle():
        while True:
            with ilock:
                try:
                    i = next(idx)
                except StopIteration:
                    return
            while True:  # tolerate transient 429s while the units converge
                try:
                    post("/embed", {"sequences": [embed_seqs[i % n_embed]],
                                    "include": ["mean"]})
                    break
                except urllib.error.HTTPError as e:
                    if e.code != 429:
                        raise
                    time.sleep(0.3)

    if "--fold-only" not in sys.argv:
        ts = [threading.Thread(target=settle) for _ in range(8)]
        [t.start() for t in ts]; [t.join() for t in ts]
    while True:
        try:
            post("/fold", {"sequences": [fold_seqs[0]], "num_recycles": 0})
            break
        except urllib.error.HTTPError as e:
            if e.code != 429:
                raise
            time.sleep(0.5)
    print(f"settle: {time.perf_counter()-t0:.1f}s  "
          f"cost_unit_s {srv.stats()['cost_unit_s']}", flush=True)

    def fold_payload(i):
        return {"sequences": [fold_seqs[i]], "num_recycles": 0}

    if "--fold-only" in sys.argv:
        # closed-loop fold throughput at the short bucket, 2 clients
        done = [None] * n_fold
        idx = iter(range(n_fold))
        lock = threading.Lock()
        lat = []

        n429 = [0]

        def worker():
            while True:
                with lock:
                    try:
                        i = next(idx)
                    except StopIteration:
                        return
                ti = time.perf_counter()
                while True:  # closed-loop clients honor Retry-After (the
                    try:     # calibrated cost model prices long-L folds
                        done[i] = post("/fold", fold_payload(i))  # near budget)
                        break
                    except urllib.error.HTTPError as e:
                        if e.code != 429:
                            raise
                        with lock:
                            n429[0] += 1
                        time.sleep(min(int(e.headers.get("Retry-After", 2)), 15))
                with lock:
                    lat.append(time.perf_counter() - ti)

        t0 = time.perf_counter()
        ts = [threading.Thread(target=worker) for _ in range(2)]
        [t.start() for t in ts]; [t.join() for t in ts]
        wall = time.perf_counter() - t0
        assert all(d is not None for d in done)
        lat.sort()
        bucket = -(-FOLD_L // 64) * 64
        print(
            f"fold-only: {n_fold} folds (L={FOLD_L}->bucket {bucket}, 0 recycles) "
            f"/ 2 clients: {wall:.2f}s  {n_fold/wall:.2f} folds/s  "
            f"p50 {lat[len(lat)//2]:.2f}s  p95 {lat[int(0.95*(len(lat)-1))]:.2f}s  "
            f"({n429[0]} x 429 retried)",
            flush=True,
        )
        stats = srv.stats()
        print("cost_unit_s:", stats["cost_unit_s"], flush=True)
        srv.stop()
        return

    # ---- mixed open-loop pass: embeds at embed_rate, folds at fold_rate
    results = {"embed": {"ok": 0, "rej": 0, "lat": []},
               "fold": {"ok": 0, "rej": 0, "lat": [], "retry_after": []}}
    rlock = threading.Lock()
    t0 = time.perf_counter()

    def fire(kind, path, payload, at):
        delay = t0 + at - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
        ti = time.perf_counter()
        try:
            post(path, payload)
            with rlock:
                results[kind]["ok"] += 1
                results[kind]["lat"].append(time.perf_counter() - ti)
        except urllib.error.HTTPError as e:
            if e.code == 429:
                with rlock:
                    results[kind]["rej"] += 1
                    if kind == "fold":
                        results[kind]["retry_after"].append(
                            int(e.headers.get("Retry-After", 0)))
            else:
                raise

    ts = [
        threading.Thread(
            target=fire,
            args=("embed", "/embed",
                  {"sequences": [embed_seqs[i]], "include": ["mean"]},
                  i / embed_rate),
        )
        for i in range(n_embed)
    ] + [
        threading.Thread(
            target=fire, args=("fold", "/fold", fold_payload(i), i / fold_rate)
        )
        for i in range(n_fold)
    ]
    [t.start() for t in ts]; [t.join() for t in ts]
    wall = time.perf_counter() - t0

    stats = srv.stats()
    for kind in ("embed", "fold"):
        r = results[kind]
        lat = sorted(r["lat"])
        p50 = lat[len(lat) // 2] if lat else float("nan")
        p95 = lat[min(len(lat) - 1, int(0.95 * len(lat)))] if lat else float("nan")
        extra = ""
        if kind == "fold" and r["retry_after"]:
            extra = f"  Retry-After(median) {sorted(r['retry_after'])[len(r['retry_after'])//2]}s"
        print(
            f"mixed {kind}: {r['ok']} accepted ({r['rej']} x 429)  "
            f"{r['ok']/wall:.1f}/s served  accepted-p50 {p50:.2f}s  "
            f"accepted-p95 {p95:.2f}s{extra}",
            flush=True,
        )
    print(f"wall {wall:.1f}s  cost_unit_s: {stats['cost_unit_s']}  "
          f"mean_batch {stats['mean_batch_seqs']}", flush=True)
    srv.stop()


if __name__ == "__main__":
    main()
