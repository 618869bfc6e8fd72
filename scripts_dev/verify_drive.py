"""Drive esm_tpu as a user would: tokenize real FASTA, run ESM-2 forward on the
real TPU chip, extract embeddings + contacts."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np
print("devices:", jax.devices(), flush=True)

import esm_tpu
from esm_tpu.models import esm2

# user flow: read FASTA shipped with the reference examples
seqs = list(esm_tpu.read_fasta("/root/reference/examples/data/few_proteins.fasta"))
print("n seqs:", len(seqs), [len(s) for _, s in seqs])

alphabet = esm_tpu.Alphabet.from_architecture("ESM-1b")
bc = alphabet.get_batch_converter(truncation_seq_length=254)
labels, strs, tokens = bc(seqs)
print("tokens shape:", tokens.shape, tokens.dtype)

cfg = esm2.ESM2Config.from_alphabet(alphabet, num_layers=6, embed_dim=320, attention_heads=20)
params = esm2.init(jax.random.PRNGKey(0), cfg)

t0 = time.time()
out = esm2.apply(params, cfg, tokens, return_contacts=True, return_representations=True)
jax.block_until_ready(out)
t1 = time.time()
print(f"fwd+compile {t1-t0:.1f}s  logits {out['logits'].shape} "
      f"reps {out['representations'].shape} contacts {out['contacts'].shape}")
t0 = time.time()
out = esm2.apply(params, cfg, tokens, return_contacts=True, return_representations=True)
jax.block_until_ready(out)
print(f"steady-state fwd {time.time()-t0*1:.3f}s")
import jax.numpy as jnp  # noqa: E402

# device-side reductions + small readbacks (pulling the full tensors over the
# tunnel stalls for minutes when the relay is loaded — see CLAUDE.md)
lg_finite = bool(jnp.isfinite(out["logits"]).all())
ct = out["contacts"]
ct_ok = bool(jnp.logical_and(ct >= 0, ct <= 1).all())
print("logits finite:", lg_finite, " contacts in [0,1]:", ct_ok)
# mean-embedding extraction like esm-extract would do (reduce on device)
reps = out["representations"][6]
for i, (lab, s) in enumerate(seqs[:3]):
    emb = np.asarray(reps[i, 1 : len(s) + 1].mean(0)[:3])
    print(f"  {lab[:30]:30s} mean-emb[0:3] {emb}")
