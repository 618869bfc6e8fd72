"""On-chip parity: tiny ESM-2 vs CPU reference values, fp32 HIGHEST precision."""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/reference")
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)
import torch
torch.manual_seed(0)
from esm.model.esm2 import ESM2 as RefESM2
from esm_tpu.data import Alphabet
from esm_tpu.io.convert import convert_esm2
from esm_tpu.models import esm2

ref = RefESM2(num_layers=3, embed_dim=64, attention_heads=4, token_dropout=True).eval()
params = convert_esm2(ref.state_dict())
cfg = esm2.ESM2Config.from_alphabet(Alphabet.from_architecture("ESM-1b"),
    num_layers=3, embed_dim=64, attention_heads=4)
alphabet = Alphabet.from_architecture("ESM-1b")
_,_,toks = alphabet.get_batch_converter()([("a","KALTARQQEVFDLIRD"),("b","LAGM<mask>S")])
with torch.no_grad():
    ref_logits = ref(torch.from_numpy(toks).long())["logits"].numpy()

out = esm2.apply(params, cfg, toks)
d = np.abs(np.asarray(out["logits"]) - ref_logits).max()
print(f"TPU default matmul precision: max |dlogits| vs CPU reference = {d:.2e}", flush=True)
with jax.default_matmul_precision("float32"):
    out = esm2.apply(params, cfg, toks)
d = np.abs(np.asarray(out["logits"]) - ref_logits).max()
print(f"TPU HIGHEST matmul precision: max |dlogits| vs CPU reference = {d:.2e}", flush=True)
