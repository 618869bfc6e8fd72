"""Drive ESMFold end-to-end on the real TPU: full-size trunk (48 blocks,
c_s=1024, c_z=128), tiny LM, random weights, L~200, 1 recycle; write a PDB."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2, esmfold as ef
from esm_tpu.models.esmfold.structure_module import StructureModuleConfig
from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig

alphabet = Alphabet.from_architecture("ESM-1b")
cfg = ef.ESMFoldConfig(
    esm=esm2.ESM2Config.from_alphabet(alphabet, num_layers=6, embed_dim=320,
                                      attention_heads=20, compute_dtype=jnp.bfloat16),
    trunk=FoldingTrunkConfig(max_recycles=1),  # full-size 48-block trunk
)
t0 = time.time()
params = ef.init_esmfold(jax.random.PRNGKey(0), cfg, alphabet)
print(f"init {time.time()-t0:.1f}s; trunk params:",
      sum(x.size for x in jax.tree.leaves(params["trunk"]))/1e6, "M", flush=True)

seq = "MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVATPRGYVLAGG" * 3  # 195 aa
t0 = time.time()
out = ef.infer(params, cfg, seq, num_recycles=0)
ptm = float(np.asarray(out["ptm"])[0])
print(f"fold L={len(seq)} compile+run {time.time()-t0:.1f}s ptm={ptm:.3f}", flush=True)
t0 = time.time()
out = ef.infer(params, cfg, seq, num_recycles=0)
mp = float(np.asarray(out["mean_plddt"])[0])
print(f"steady fold {time.time()-t0:.2f}s mean_plddt={mp:.1f}", flush=True)
pdb = ef.output_to_pdb(out)[0]
open("/tmp/verify_fold.pdb","w").write(pdb)
print("pdb atoms:", pdb.count("ATOM"), "finite:", np.isfinite(np.asarray(out["positions"])).all(), flush=True)
