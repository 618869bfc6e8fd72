"""On-chip ESMFold numerics: trunk + structure module vs the CPU oracle.

SURVEY ranks the ESMFold stack parity risk #1 (catastrophic cancellation in
IPA's |q-k|^2 cross term; recycling feedback amplifies per-block error), and
until round 4 all its parity evidence was CPU-only. This runs the SAME
random-init ESMFold (identical params — jax's threefry PRNG is
backend-independent) on the real chip and on CPU, and logs max errors on the
quantities that feed users: final coordinates (Angstrom), pair state s_z,
pLDDT and pTM. Three chip configs:

  fp32 trunk, default matmul  — TPU fp32 GEMMs round through bf16
  fp32 trunk, HIGHEST matmul  — the parity-grade configuration
  bf16 trunk (serving config) — vs the same bf16 trunk on CPU, isolating
                                backend numerics at serving precision, and
                                vs the fp32 CPU oracle for total error
  fp16 LM -> fp32-HIGHEST trunk — the GOLDEN-GATE configuration (PARITY.md
                                mode 1: the reference runs its LM in fp16,
                                esm/esmfold/v1/esmfold.py:62); vs the same
                                fp16-LM CPU run and vs the fp32 oracle

Writes PARITY.md's "on-chip" rows. Runs the CPU oracle in a subprocess
(sitecustomize force-selects the tunneled chip; the child forces cpu in
python). Run ALONE on the chip: python scripts_dev/tpu_esmfold_parity.py
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

REF_NPZ = "/tmp/esmfold_parity_cpu.npz"
L = 64
SEQ = ("MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVATPRGYVLAG"[:L])


def build(dtype_name):
    import jax
    import jax.numpy as jnp

    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2, esmfold as ef
    from esm_tpu.models.esmfold.structure_module import StructureModuleConfig
    from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    # "fp16lm": fp16 LM feeding an fp32 trunk — the reference's execution
    # precision for the frozen LM (esmfold.py:62); trunk stays fp32
    lm_dtype = jnp.float16 if dtype_name == "fp16lm" else dtype
    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = ef.ESMFoldConfig(
        esm=esm2.ESM2Config.from_alphabet(
            alphabet, num_layers=4, embed_dim=128, attention_heads=4,
            compute_dtype=lm_dtype,
        ),
        trunk=FoldingTrunkConfig(
            num_blocks=2,
            sequence_state_dim=256,
            pairwise_state_dim=128,  # realistic pair width: c_z=128, hw=32
            sequence_head_width=32,
            pairwise_head_width=32,
            max_recycles=2,  # one real recycle exercises the feedback path
            compute_dtype=dtype,
            structure_module=StructureModuleConfig(),  # full-size SM config
        ),
    )
    params = ef.init_esmfold(jax.random.PRNGKey(7), cfg, alphabet)
    return cfg, params, ef


def run(dtype_name):
    import jax
    import numpy as np

    cfg, params, ef = build(dtype_name)
    out = ef.infer(params, cfg, SEQ, num_recycles=1)
    return {
        "positions": np.asarray(out["positions"][-1], np.float32),
        "s_z": np.asarray(out["s_z"], np.float32),
        "plddt": np.asarray(out["plddt"], np.float32),
        "ptm": np.asarray(out["ptm"], np.float32),
    }


def main_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    arrs = {}
    for name in ("fp32", "bf16", "fp16lm"):
        for k, v in run(name).items():
            arrs[f"{name}_{k}"] = v
    np.savez(REF_NPZ, **arrs)
    print("cpu oracle written:", REF_NPZ)


def report(tag, got, ref):
    import numpy as np

    dpos = np.abs(got["positions"] - ref["positions"]).max()
    dsz = np.abs(got["s_z"] - ref["s_z"]).max()
    dpl = np.abs(got["plddt"] - ref["plddt"]).max()
    dptm = np.abs(got["ptm"] - ref["ptm"]).max()
    szmax = np.abs(ref["s_z"]).max()
    print(
        f"{tag}: max|dpos| {dpos:.3e} A  max|ds_z| {dsz:.3e} "
        f"(|s_z|max {szmax:.1f})  max|dplddt| {dpl:.3e}  |dptm| {dptm:.3e}",
        flush=True,
    )


def main_chip():
    import jax
    import numpy as np

    print("devices:", jax.devices(), flush=True)
    ref = np.load(REF_NPZ)
    cpu = {
        name: {k: ref[f"{name}_{k}"] for k in ("positions", "s_z", "plddt", "ptm")}
        for name in ("fp32", "bf16", "fp16lm")
    }

    t0 = time.time()
    got = run("fp32")
    print(f"fp32 default: {time.time()-t0:.1f}s", flush=True)
    report("fp32 trunk, default matmul, vs fp32 CPU", got, cpu["fp32"])

    with jax.default_matmul_precision("float32"):
        got = run("fp32")
    report("fp32 trunk, HIGHEST matmul, vs fp32 CPU", got, cpu["fp32"])

    got = run("bf16")
    report("bf16 trunk (serving), vs bf16 CPU     ", got, cpu["bf16"])
    report("bf16 trunk (serving), vs fp32 CPU     ", got, cpu["fp32"])

    # the golden-gate configuration: fp16 LM -> fp32-HIGHEST trunk
    with jax.default_matmul_precision("float32"):
        got = run("fp16lm")
    report("fp16 LM + fp32-HIGHEST trunk, vs fp16lm CPU", got, cpu["fp16lm"])
    report("fp16 LM + fp32-HIGHEST trunk, vs fp32 CPU  ", got, cpu["fp32"])


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        main_cpu()
    else:
        if not os.path.exists(REF_NPZ) or "--refresh" in sys.argv:
            print("building CPU oracle in a subprocess...", flush=True)
            subprocess.run(
                [sys.executable, "-u", __file__, "--cpu"], check=True
            )
        main_chip()
