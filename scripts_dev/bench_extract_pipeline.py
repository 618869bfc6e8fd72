"""Measure the bulk-extraction pipeline win on the real chip.

Runs the extract CLI end-to-end (tokenize -> forward -> readback -> write) on
a synthetic FASTA with an ESM2-8M-architecture checkpoint (random weights —
throughput does not depend on weight values), serial vs pipelined.

Usage: PALLAS_AXON_REMOTE_COMPILE=1 python -u scripts_dev/bench_extract_pipeline.py
"""
import argparse
import pathlib
import random
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import torch

p = argparse.ArgumentParser()
p.add_argument("--nseq", type=int, default=96)
p.add_argument("--toks-per-batch", type=int, default=8192)
p.add_argument("--include", nargs="+", default=["mean", "contacts"])
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

tmp = pathlib.Path(tempfile.mkdtemp())

# ESM2-8M architecture checkpoint with random weights, in the v2 .pt layout
sys.path.insert(0, "/root/reference")
from esm.model.esm2 import ESM2 as RefESM2  # noqa: E402

torch.manual_seed(0)
ref = RefESM2(num_layers=6, embed_dim=320, attention_heads=20)
state = {
    (
        f"encoder.sentence_encoder.{k}"
        if not k.startswith("lm_head")
        else f"encoder.{k}"
    ): v
    for k, v in ref.state_dict().items()
}
cfg = argparse.Namespace(
    encoder_layers=6, encoder_embed_dim=320, encoder_attention_heads=20,
    token_dropout=True,
)
ckpt = tmp / "esm2_t6_bench_UR50D.pt"
torch.save({"cfg": {"model": cfg}, "model": state}, ckpt)
torch.save(
    {"model": {"contact_head.regression.weight": torch.randn(1, 120),
               "contact_head.regression.bias": torch.randn(1)}},
    tmp / "esm2_t6_bench_UR50D-contact-regression.pt",
)

random.seed(0)
AAS = "LAGVSERTIDPKQNFYMHWC"
fasta = tmp / "bench.fasta"
with open(fasta, "w") as f:
    for i in range(args.nseq):
        L = random.choice((256, 510, 1022))
        f.write(f">seq{i:04d}\n" + "".join(random.choice(AAS) for _ in range(L)) + "\n")

from esm_tpu.cli import extract  # noqa: E402

base = [str(ckpt), str(fasta), "", "--repr_layers", "-1",
        "--include", *args.include, "--npz", "--bucket",
        "--toks_per_batch", str(args.toks_per_batch)]
if args.cpu:
    base.append("--nogpu")

results = {}
for mode, extra in (("warmup", []), ("pipelined", []), ("serial", ["--serial"]),
                    ("pipelined2", [])):
    argv = list(base)
    argv[2] = str(tmp / mode)
    a = extract.create_parser().parse_args(argv + extra)
    t0 = time.perf_counter()
    extract.run(a)
    dt = time.perf_counter() - t0
    results[mode] = dt
    print(f"== {mode}: {dt:.2f}s  ({args.nseq / dt:.1f} seq/s e2e)", flush=True)

ser = results["serial"]
pipe = min(results["pipelined"], results["pipelined2"])
print(f"\nserial {ser:.2f}s  pipelined {pipe:.2f}s  speedup {ser / pipe:.2f}x")
