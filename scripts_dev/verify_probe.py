import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import esm_tpu
from esm_tpu.models import esm2

# probe 1: unknown architecture
try:
    esm_tpu.Alphabet.from_architecture("nonsense")
    print("P1 FAIL no error")
except ValueError as e:
    print("P1 ok:", e)

# probe 2: unaligned MSA rejected
a = esm_tpu.Alphabet.from_architecture("msa_transformer")
try:
    a.get_batch_converter()([("s1", "LAGVS"), ("s2", "LAG")])
    print("P2 FAIL no error")
except RuntimeError as e:
    print("P2 ok:", str(e)[:60])

# probe 3: unknown residue char -> <unk>, not crash
b = esm_tpu.Alphabet.from_architecture("ESM-1b")
try:
    b.get_batch_converter()([("x", "LAJVS")])  # J not in vocab
    print("P3: encoded without error")
except KeyError as e:
    print("P3 ok: KeyError on unknown residue (matches reference):", e)

# probe 4: all-<mask> sequence (mask_ratio_observed high) stays finite
cfg = esm2.ESM2Config.from_alphabet(b, num_layers=2, embed_dim=64, attention_heads=4)
params = esm2.init(jax.random.PRNGKey(0), cfg)
_, _, toks = b.get_batch_converter()([("m", "<mask>"*10)])
out = esm2.apply(params, cfg, toks)
print("P4 all-mask finite:", bool(np.isfinite(np.asarray(out["logits"])).all()))

# probe 5: config/params layer-count mismatch -> loud trace-time error
cfg_bad = esm2.ESM2Config.from_alphabet(b, num_layers=5, embed_dim=64, attention_heads=4)
try:
    esm2.apply(params, cfg_bad, toks)
    print("P5: no error (scan uses actual param count — config num_layers unused at runtime)")
except Exception as e:
    print("P5 error:", type(e).__name__, str(e)[:80])
