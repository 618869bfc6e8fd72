"""Serving bench: esm-serve stack end-to-end on the real chip.

Random-init ESM2-650M (bf16 + flash), dynamic batching; N concurrent client
threads each posting single-sequence /embed requests (mean embeddings) with
mixed lengths. Reports throughput through the full HTTP + batcher + device +
readback path, vs. bench.py's offline forward number.

Usage: python scripts_dev/bench_serve_tpu.py [n_requests] [n_clients]
"""
import os, sys
sys.path.insert(0, "/root/repo")
if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import json, threading, time, urllib.error, urllib.request
import numpy as np
import jax, jax.numpy as jnp
from esm_tpu.data import Alphabet
from esm_tpu.models import esm2
from esm_tpu.pretrained import LMHandle
from esm_tpu.runtime.server import InferenceServer

def main():
    argv = sys.argv[1:]
    flag_vals = {}
    for flag in ("--wait", "--open-loop", "--max-queued", "--refill"):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                sys.exit(f"usage: {flag} <number>")
            flag_vals[flag] = float(argv[i + 1])  # validate BEFORE chip time
            argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    n_req = int(args[0]) if len(args) > 0 else 64
    n_cli = int(args[1]) if len(args) > 1 else 8
    print("devices:", jax.devices())
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, **esm2.ESM2_SIZES["esm2_t33_650M_UR50D"],
        compute_dtype=jnp.bfloat16, use_flash=True,
    )
    t0 = time.perf_counter()
    params = jax.jit(esm2.init, static_argnums=(1,))(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    model = LMHandle("esm2", cfg, params, alphabet)
    bucket = "max" if "--pow2" not in sys.argv else "pow2"
    wait_ms = flag_vals.get("--wait", 20.0)
    max_queued = int(flag_vals.get("--max-queued", 256))
    refill_ms = flag_vals.get("--refill", 80.0)
    srv = InferenceServer(
        model, max_batch_seqs=16, max_wait_ms=wait_ms, batch_bucket=bucket,
        max_queued_seqs=max_queued, refill_wait_ms=refill_ms,
    ).start()
    print(f"init {time.perf_counter()-t0:.1f}s  url {srv.url}  bucket={bucket}  "
          f"max_queued={max_queued}")

    rng = np.random.default_rng(0)
    aas = "LAGVSERTIDPKQNFYMHWC"
    def seq(n):
        return "".join(aas[i] for i in rng.integers(0, 20, n))
    # mixed lengths within one 128-bucket band and across bands
    lens = [int(l) for l in rng.choice([250, 380, 500, 1000, 1022], n_req)]
    seqs = [seq(l) for l in lens]

    def post(s):
        req = urllib.request.Request(
            srv.url + "/embed",
            data=json.dumps({"sequences": [s], "include": ["mean"]}).encode())
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    # warm the compile cache for each bucket
    t0 = time.perf_counter()
    if "--prewarm" in sys.argv:
        n = srv.prewarm()   # every (B, T) shape incl. full batches
        print(f"prewarm: {n} shapes in {time.perf_counter()-t0:.1f}s")
    else:
        for l in sorted({-(-((l + 2)) // 128) for l in lens}):
            post(seq(l * 128 - 2))
        print(f"warmup (compiles): {time.perf_counter()-t0:.1f}s")

    def load_pass(label):
        done = [None] * n_req
        idx = iter(range(n_req))
        lock = threading.Lock()
        def worker():
            while True:
                with lock:
                    try:
                        i = next(idx)
                    except StopIteration:
                        return
                done[i] = post(seqs[i])
        t0 = time.perf_counter()
        ts = [threading.Thread(target=worker) for _ in range(n_cli)]
        [t.start() for t in ts]; [t.join() for t in ts]
        wall = time.perf_counter() - t0
        assert all(d is not None for d in done)
        with urllib.request.urlopen(srv.url + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        print(f"{label}: {n_req} requests / {n_cli} clients: {wall:.2f}s  "
              f"{n_req/wall:.1f} seq/s  mean_batch {stats['mean_batch_seqs']}  "
              f"p50 {stats['latency_p50_ms']:.0f} ms  p95 {stats['latency_p95_ms']:.0f} ms")

    def open_loop_pass(rate):
        """Open-loop arrivals: request i fires at t0 + i/rate regardless of
        earlier responses (one thread per request) — the regime the pipelined
        batcher is built for; closed-loop clients idle the window.

        Latency percentiles are computed CLIENT-SIDE over the ACCEPTED
        requests of this pass only: the server's /stats window also holds
        warm-up compile requests whose multi-second latencies pollute p95
        when the pass is small (admission control rejects most of an
        over-saturated pass)."""
        done = [None] * n_req
        lat = [None] * n_req
        rejected = [0]
        t0 = time.perf_counter()
        def w(i):
            delay = t0 + i / rate - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            ti = time.perf_counter()
            try:
                done[i] = post(seqs[i])
                lat[i] = time.perf_counter() - ti
            except urllib.error.HTTPError as e:
                if e.code == 429:   # admission control sheds past saturation —
                    rejected[0] += 1  # accepted requests keep a bounded p95
                    done[i] = "rejected"
                else:
                    raise
        ts = [threading.Thread(target=w, args=(i,)) for i in range(n_req)]
        [t.start() for t in ts]; [t.join() for t in ts]
        wall = time.perf_counter() - t0
        assert all(d is not None for d in done)
        with urllib.request.urlopen(srv.url + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        acc = n_req - rejected[0]
        al = sorted(l for l in lat if l is not None)
        p50 = al[len(al) // 2] if al else float("nan")
        p95 = al[min(len(al) - 1, int(0.95 * len(al)))] if al else float("nan")
        print(f"open-loop @{rate:.0f}/s: {n_req} requests in {wall:.2f}s  "
              f"{acc} accepted ({rejected[0]} x 429)  {acc/wall:.1f} seq/s served  "
              f"mean_batch {stats['mean_batch_seqs']}  "
              f"accepted-p50 {1e3*p50:.0f} ms  accepted-p95 {1e3*p95:.0f} ms")

    if "--open-only" in sys.argv and "--open-loop" in flag_vals:
        # skip the closed-loop pass so /stats' rolling latency window holds
        # only the open-loop pass (admission-control p95 measurement)
        open_loop_pass(flag_vals["--open-loop"])
    else:
        load_pass("pass1 (cold traces)")
        if "--open-loop" in flag_vals:
            open_loop_pass(flag_vals["--open-loop"])
        else:
            load_pass("pass2 (steady)")
    srv.stop()

if __name__ == "__main__":
    main()
