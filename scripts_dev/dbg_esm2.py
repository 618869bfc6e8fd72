import sys, time
sys.path.insert(0,'/root/reference'); sys.path.insert(0,'/root/repo')
t0=time.time()
import torch, numpy as np
torch.manual_seed(0)
from esm.model.esm2 import ESM2 as RefESM2
from esm_tpu.data import Alphabet
from esm_tpu.io.convert import convert_esm2
from esm_tpu.models import esm2
print("imports", time.time()-t0, flush=True)

ref = RefESM2(num_layers=3, embed_dim=64, attention_heads=4, token_dropout=True)
ref.eval()
params = convert_esm2(ref.state_dict())
cfg = esm2.ESM2Config.from_alphabet(Alphabet.from_architecture("ESM-1b"),
    num_layers=3, embed_dim=64, attention_heads=4, token_dropout=True)

alphabet = Alphabet.from_architecture("ESM-1b")
_,_,toks = alphabet.get_batch_converter()([("a","KALTARQQEVFDLIRD"),("b","LAGM<mask>S")])
with torch.no_grad():
    out_ref = ref(torch.from_numpy(toks).long(), repr_layers=[0,1,2,3])
print("ref fwd", time.time()-t0, flush=True)
out = esm2.apply(params, cfg, toks, return_representations=True)
print("jax fwd", time.time()-t0, flush=True)
for i in range(4):
    d = np.abs(np.asarray(out["representations"][i]) - out_ref["representations"][i].numpy())
    print(f"layer {i}: max diff {d.max():.3e}  (seq0 {d[0].max():.3e}, seq1 {d[1].max():.3e})")
