"""Final verification drive: extract + fold CLIs end-to-end on the real chip."""
import sys, argparse, pathlib, tempfile, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("ESM_TPU_CACHE", tempfile.mkdtemp())

# build tiny fake checkpoints in the cache (reuse the test helper layouts)
sys.path.insert(0, "/root/repo/tests")
import torch
sys.path.insert(0, "/root/reference")
from tests.test_fold_cli import _make_cache

tmp = pathlib.Path(tempfile.mkdtemp())
cache, fold_path = _make_cache(tmp)
os.environ["ESM_TPU_CACHE"] = str(cache)

import jax
# importing tests.conftest (via the _make_cache helper) force-selects CPU;
# restore the real chip for the drive
jax.config.update("jax_platforms", "axon,cpu")
print("devices:", jax.devices(), flush=True)

fasta = tmp / "in.fasta"
fasta.write_text(">seqA\nMKTVRQERLKSIVRILERSK\n>seqB\nKALTARQQEVFDLIRD\n")

from esm_tpu.cli import extract
args = extract.create_parser().parse_args([
    str(cache / "esm2_t6_8M_UR50D_500K.pt"), str(fasta), str(tmp / "embout"),
    "--repr_layers", "-1", "--include", "mean", "contacts", "--fp32-precision",
    "--bucket",
])
extract.run(args)
print("extract CLI OK:", sorted(p.name for p in (tmp / "embout").iterdir()), flush=True)

from esm_tpu.cli import fold
fargs = fold.create_parser().parse_args([
    "-i", str(fasta), "-o", str(tmp / "pdbs"), "-m", str(fold_path),
    "--num-recycles", "1", "--bf16-trunk",
])
fold._setup_logging()
fold.run(fargs)
print("fold CLI OK:", sorted(p.name for p in (tmp / "pdbs").iterdir()), flush=True)
