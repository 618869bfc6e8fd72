"""Generate the tutorial notebooks in examples/notebooks/.

The reference ships 8 .ipynb tutorials (examples/*.ipynb,
examples/inverse_folding/notebook*.ipynb, examples/lm-design/*.ipynb,
examples/protein-programming-language/tutorial.ipynb); these are this
framework's equivalents, written against the esm_tpu API. Every notebook
degrades gracefully when released weights / network are unavailable (falls
back to tiny random-init models) so the whole set executes in CI
(tests/test_notebooks.py).

Run: python scripts_dev/make_notebooks.py
"""

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "examples", "notebooks")


def nb(name, cells):
    cs = []
    for kind, src in cells:
        lines = src.strip("\n").splitlines(keepends=True)
        if kind == "md":
            cs.append({"cell_type": "markdown", "metadata": {}, "source": lines})
        else:
            cs.append(
                {
                    "cell_type": "code",
                    "execution_count": None,
                    "metadata": {},
                    "outputs": [],
                    "source": lines,
                }
            )
    doc = {
        "cells": cs,
        "metadata": {
            "kernelspec": {
                "display_name": "Python 3",
                "language": "python",
                "name": "python3",
            },
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    path = os.path.join(OUT, name)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", path)


LM_FALLBACK = '''
import jax
import numpy as np

from esm_tpu import pretrained

MODEL_NAME = "esm2_t33_650M_UR50D"  # any name from esm_tpu.pretrained
try:
    model, alphabet = pretrained.load_model_and_alphabet(MODEL_NAME)
except Exception as e:  # weights not cached (e.g. no network): tiny random demo model
    print(f"[{type(e).__name__}] {MODEL_NAME} unavailable -> tiny random-init ESM-2")
    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = esm2.ESM2Config.from_alphabet(
        alphabet, num_layers=4, embed_dim=128, attention_heads=8
    )
    model = pretrained.LMHandle(
        "esm2", cfg, esm2.init(jax.random.PRNGKey(0), cfg), alphabet
    )
print(f"{model.num_layers} layers, embed dim {model.embed_dim}")
'''

HELIX_COORDS = '''
# An ideal-ish alpha helix backbone (N, CA, C per residue) - a stand-in for
# esm_tpu.models.inverse_folding.load_coords("file.pdb", chain="A").
def helix_backbone(L, seed=0, pitch=1.5, radius=2.3, turn=0.6):
    t = np.arange(L)[:, None].astype(np.float32)
    ca = np.concatenate([np.cos(t * turn) * radius, np.sin(t * turn) * radius,
                         t * pitch], axis=-1)
    n = ca + np.array([1.2, 0.0, 0.0], np.float32)
    c = ca + np.array([0.0, 1.2, 0.0], np.float32)
    return np.stack([n, ca, c], axis=1)  # (L, 3 atoms, 3 xyz)
'''

IF_FALLBACK = '''
import jax
import numpy as np

from esm_tpu import pretrained
from esm_tpu.models import inverse_folding as ifm

try:
    handle, alphabet = pretrained.esm_if1_gvp4_t16_142M_UR50()
    params, cfg = handle.params, handle.cfg
except Exception as e:  # no weights cached: tiny random-init model
    print(f"[{type(e).__name__}] esm_if1 unavailable -> tiny random-init GVP-Transformer")
    from esm_tpu.data import Alphabet

    alphabet = Alphabet.from_architecture("invariant_gvp")
    cfg = ifm.GVPTransformerConfig.from_alphabet(
        alphabet,
        encoder_embed_dim=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_embed_dim=128, decoder_embed_dim=64, decoder_layers=2,
        decoder_attention_heads=4, decoder_ffn_embed_dim=128,
        gvp_top_k_neighbors=6, gvp_node_hidden_dim_scalar=32,
        gvp_node_hidden_dim_vector=8, gvp_edge_hidden_dim_scalar=16,
        gvp_edge_hidden_dim_vector=1, gvp_num_encoder_layers=2,
    )
    params = ifm.init(jax.random.PRNGKey(0), cfg)
'''


nb(
    "contact_prediction.ipynb",
    [
        (
            "md",
            """
# Unsupervised contact prediction

ESM models predict residue-residue contacts **without supervision**: attention
maps from all layers/heads are symmetrized, APC-corrected, and combined by a
tiny logistic regression (trained on a handful of structures; shipped with each
checkpoint as its `-contact-regression` weights).

On TPU the contact path runs **streaming**: per-layer attention maps are
reduced inside the layer scan instead of materializing the reference's
`(B, layers*heads, L, L)` stack (~90 GB at L=1022 for ESM2-650M).

Real model names: `esm2_t33_650M_UR50D`, `esm2_t36_3B_UR50D`, `esm1b_t33_650M_UR50S`, ...
(see `esm_tpu.pretrained`). Without cached weights this notebook falls back to
a tiny random-init model so every cell still executes.
""",
        ),
        ("code", LM_FALLBACK),
        (
            "code",
            '''
seqs = [
    ("seq1", "KALTARQQEVFDLIRDHISQTGMPPTRAEIAQRLGFRSPNAAEEHLKALARKGVIEIVSGASRGIRLLQEE"),
    ("seq2", "MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVATPRGYVLAGG"),
]
batch_converter = alphabet.get_batch_converter()
labels, strs, tokens = batch_converter(seqs)

out = model(tokens, return_contacts=True)
contacts = np.asarray(out["contacts"])
print("logits", out["logits"].shape, "contacts", contacts.shape)
''',
        ),
        (
            "code",
            '''
# top predicted long-range pairs (|i - j| > 6) for the first sequence
L = len(seqs[0][1])
c = contacts[0, :L, :L]
i, j = np.triu_indices(L, k=6)
order = np.argsort(-c[i, j])[:10]
for o in order:
    print(f"{i[o]:4d} - {j[o]:4d}  p={c[i[o], j[o]]:.3f}")
''',
        ),
        (
            "md",
            """
With a known structure, the README metric is **long-range precision@L**: the
fraction of the top-L predicted pairs with sequence separation >= 24 that are
true contacts (CB-CB < 8 A). See `examples/contact_prediction.py
--targets-npz` for a scored run, and the MSA Transformer path
(`esm_msa1b_t12_100M_UR50S` + an `.a3m` alignment, contacts from row
attentions) for the strongest unsupervised accuracy.

Bulk extraction: `esm-extract <model> <fasta> <out> --include contacts`
(add `--fp32-precision` on TPU for parity-grade numerics).
""",
        ),
    ],
)


nb(
    "sup_variant_prediction.ipynb",
    [
        (
            "md",
            """
# Supervised variant prediction from ESM embeddings

Train a small regression head on mean-pooled ESM embeddings of mutant
sequences to predict assay fitness (the supervised companion to the zero-shot
`esm-predict-variants` CLI). The reference notebook uses scikit-learn on
pre-extracted ESM-1v embeddings; here the same flow runs with a closed-form
ridge regression in numpy, so it has no extra dependencies.

For real work: dump embeddings in bulk with
`esm-extract esm1v_t33_650M_UR90S_1 mutants.fasta out/ --include mean`.
""",
        ),
        ("code", LM_FALLBACK),
        (
            "code",
            '''
# a toy deep-mutational-scan: wild type + every single mutant at 6 positions
WT = "KALTARQQEVFDLIRDHISQ"
AAS = "ACDEFGHIKLMNPQRSTVWY"
rng = np.random.RandomState(0)

variants = [("WT", WT)]
for pos in range(6, 12):
    for aa in AAS:
        if aa != WT[pos]:
            variants.append((f"{WT[pos]}{pos + 1}{aa}", WT[:pos] + aa + WT[pos + 1:]))

# synthetic "assay" labels with position/residue structure + noise
hydro = {a: h for a, h in zip(AAS, np.linspace(-4.5, 4.5, 20))}
labels_y = np.array(
    [sum(hydro[a] for a in s) / len(s) + rng.randn() * 0.1 for _, s in variants]
)
print(len(variants), "variants")
''',
        ),
        (
            "code",
            '''
# mean-pooled final-layer embeddings (batched)
feats = []
bc = alphabet.get_batch_converter()
for start in range(0, len(variants), 32):
    chunk = variants[start : start + 32]
    _, _, toks = bc(chunk)
    reps = model(toks, repr_layers=[model.num_layers])["representations"][model.num_layers]
    reps = np.asarray(reps)
    for k, (_, s) in enumerate(chunk):
        feats.append(reps[k, 1 : len(s) + 1].mean(0))  # strip BOS, mask pads
X = np.stack(feats)
print("X", X.shape)
''',
        ),
        (
            "code",
            '''
# ridge regression, 80/20 split
n = len(X)
perm = rng.permutation(n)
tr, te = perm[: int(0.8 * n)], perm[int(0.8 * n) :]
mu, sd = X[tr].mean(0), X[tr].std(0) + 1e-6
Z = (X - mu) / sd
lam = 1.0
A = Z[tr].T @ Z[tr] + lam * np.eye(Z.shape[1])
w = np.linalg.solve(A, Z[tr].T @ (labels_y[tr] - labels_y[tr].mean()))
pred = Z[te] @ w + labels_y[tr].mean()

def spearman(a, b):
    ra, rb = np.argsort(np.argsort(a)), np.argsort(np.argsort(b))
    return float(np.corrcoef(ra, rb)[0, 1])

print(f"test Spearman rho = {spearman(pred, labels_y[te]):.3f} "
      f"(random embeddings give ~0; released weights give a strong signal)")
''',
        ),
    ],
)


nb(
    "esm_structural_dataset.ipynb",
    [
        (
            "md",
            """
# ESM Structural Split Dataset

The SCOPe-based 5-fold cross-validation dataset from Rives et al. (supplement
A.10): for each protein domain you get the sequence, secondary structure
string, an LxL CB distance map, and 3D coordinates. Splits are provided at
three structural holdout levels: `family`, `superfamily`, `fold`.

Download is ~2 GB (md5-verified); this cell skips gracefully offline.
""",
        ),
        (
            "code",
            '''
from esm_tpu.data import ESMStructuralSplitDataset

try:
    ds = ESMStructuralSplitDataset(
        split_level="superfamily", cv_partition="4", split="train", download=True
    )
    print(len(ds), "domains")
    item = ds[0]
    print({k: (v.shape if hasattr(v, "shape") else (type(v).__name__, len(v)))
           for k, v in item.items()})
except Exception as e:
    print(f"[{type(e).__name__}] download unavailable; item schema:")
    print("  seq:    str (L)           - amino-acid sequence")
    print("  ssp:    str (L)           - 8-class secondary structure")
    print("  dist:   float (L, L)      - CB-CB distance map (NaN = missing)")
    print("  coords: float (L, 3)      - CB coordinates")
''',
        ),
        (
            "md",
            """
A typical use: train a contact-prediction probe on `dist < 8 A` targets from
the `train` split and evaluate precision@L on `valid` — with the structural
holdout level controlling how far the test domains are from training.
""",
        ),
    ],
)


nb(
    "inverse_folding.ipynb",
    [
        (
            "md",
            """
# Inverse folding with ESM-IF1

ESM-IF1 (`esm_if1_gvp4_t16_142M_UR50`) maps a backbone structure (N, CA, C
coordinates) to sequences that fold to it: a GVP structure encoder feeds an
autoregressive transformer decoder. On TPU the sampling loop runs as a
`lax.scan` with a fixed-size KV cache — the whole decode is one compiled
program.

Structures load from PDB/mmCIF via
`ifm.load_coords(path, chain)` (biotite if installed, a pure-python PDB reader
otherwise). Here we synthesize a helix so the notebook is self-contained.
""",
        ),
        ("code", IF_FALLBACK),
        ("code", HELIX_COORDS + '''
coords = helix_backbone(24)
print("coords", coords.shape)
'''),
        (
            "code",
            '''
# score a candidate sequence: average log-likelihood (full sequence / at
# residues with coordinates)
native = "KALTARQQEVFDLIRDHISQKALT"
ll_full, ll_withcoord = ifm.score_sequence(params, cfg, alphabet, coords, native)
print(f"avg log-likelihood: {float(ll_full):.3f} (perplexity {np.exp(-float(ll_full)):.2f})")
''',
        ),
        (
            "code",
            '''
# sample designs; temperature trades diversity for confidence
for temp, seed in [(1.0, 1), (1.0, 2), (0.1, 3)]:
    seq = ifm.sample(params, cfg, alphabet, coords, temperature=temp, seed=seed)
    rec = np.mean([a == b for a, b in zip(seq, native)])
    print(f"T={temp:3.1f} seed={seed}  recovery={rec:.2f}  {seq}")
''',
        ),
        (
            "md",
            """
With released weights, native-sequence recovery is ~51% on structurally held
out backbones (72% for buried residues). Conditioning on partial sequence,
multichain complexes, and CLI bulk runs: see
`inverse_folding_multichain.ipynb`, `esm-if-sample`, `esm-if-score`.
""",
        ),
    ],
)


nb(
    "inverse_folding_multichain.ipynb",
    [
        (
            "md",
            """
# Inverse folding for multichain complexes

Design or score ONE chain of a complex conditioned on the backbone of the
WHOLE complex: the target chain's coordinates go first, other chains are
appended after a 10-residue NaN spacer, and the model scores/designs only the
target span (reference `multichain_util.py` semantics).
""",
        ),
        ("code", IF_FALLBACK),
        ("code", HELIX_COORDS + '''
# a two-chain complex: chain A (24 aa) docked against chain B (16 aa)
coords_A = helix_backbone(24)
coords_B = helix_backbone(16, turn=0.55) + np.array([8.0, 0.0, 0.0], np.float32)
complex_coords = {"A": coords_A, "B": coords_B}
'''),
        (
            "code",
            '''
from esm_tpu.models.inverse_folding import multichain

seq = multichain.sample_sequence_in_complex(
    params, cfg, alphabet, complex_coords, target_chain_id="A",
    temperature=1.0, seed=7,
)
print("designed chain A:", seq)

ll, ll_withcoord = multichain.score_sequence_in_complex(
    params, cfg, alphabet, complex_coords, target_chain_id="A",
    target_seq="KALTARQQEVFDLIRDHISQKALT",
)
print(f"chain-A avg log-likelihood in complex: {float(ll):.3f}")
''',
        ),
        (
            "md",
            """
Real complexes: `multichain.load_complex_coords("1abc.pdb", ["A", "B"])`
returns the per-chain coordinate dict directly. The CLI equivalents are
`esm-if-sample --multichain-backbone --chain A` and `esm-if-score`.
""",
        ),
    ],
)


nb(
    "lm_design_fixed_backbone.ipynb",
    [
        (
            "md",
            """
# LM design: fixed-backbone MCMC

Design sequences by Metropolis-Hastings over an energy that combines the
masked-LM pseudo-likelihood with (optionally) a distogram match to a target
backbone and an n-gram KL to natural sequence statistics (the reference's
`examples/lm-design`). On TPU the whole chain — proposal, energy, accept —
runs on device as one `lax.scan`; 170k-iteration production chains are a
single compiled call.
""",
        ),
        ("code", LM_FALLBACK),
        (
            "code",
            '''
from esm_tpu.apps import lm_design

designer = lm_design.Designer(model.params, model.cfg, alphabet)
seed_seq = "MKTVRQERLKSIVRILERSKEPVSGAQLAEELS"
seqs, energies, acc = designer.design(
    seed_seq,
    lm_design.DesignConfig(num_iter=200, temperature=0.1),
    batch=2,
)
print(f"acceptance rate {acc:.1%}")
for i, s in enumerate(seqs):
    print(f"design {i}: E={float(energies[-1, i]):+.4f}  {s}")
''',
        ),
        (
            "code",
            '''
# energy trace: E of the state entering each step (chain 0)
e = np.asarray(energies)[:, 0]
step = max(1, len(e) // 10)
for t in range(0, len(e), step):
    print(f"iter {t:5d}  E={e[t]:+.4f}")
''',
        ),
        (
            "md",
            """
To add the structure term, load distogram-projection weights with
`lm_design.convert_distogram_projection` and pass target bins to the energy —
see `free_generation.ipynb` for the joint sequence/structure loop.
""",
        ),
    ],
)


nb(
    "lm_design_free_generation.ipynb",
    [
        (
            "md",
            """
# LM design: free generation (joint sequence + structure hallucination)

Alternate two phases on device (reference `utils/free_generation.py`): sample
a target structure from the distogram projection of the current sequence, then
run MH sequence steps against masked-LM energy + distogram cross-entropy to
that target. The projection is a 1x1 "conv" (a linear map) over the LM's
symmetrized attention maps -> distance/theta/phi/omega bin logits.
""",
        ),
        ("code", LM_FALLBACK),
        (
            "code",
            '''
import jax.numpy as jnp

from esm_tpu.apps import lm_design

# distogram projection weights: use converted released weights when you have
# them (lm_design.convert_distogram_projection); random here for the demo
nch = model.cfg.num_layers * model.cfg.attention_heads
bins = lm_design.DISTOGRAM_BINS
k1, k2 = jax.random.split(jax.random.PRNGKey(1))
proj = {
    "conv1": {"kernel": 0.1 * jax.random.normal(k1, (nch, bins["N_BINS"] + bins["OMEGA_BINS"])),
              "bias": jnp.zeros((bins["N_BINS"] + bins["OMEGA_BINS"],))},
    "conv2": {"kernel": 0.1 * jax.random.normal(k2, (nch, bins["THETA_BINS"] + bins["PHI_BINS"])),
              "bias": jnp.zeros((bins["THETA_BINS"] + bins["PHI_BINS"],))},
}
''',
        ),
        (
            "code",
            '''
_, _, toks = alphabet.get_batch_converter()([("seed", "KALTARQQEVFDLIRDHISQ")])
tokens, energies = lm_design.free_generation(
    model.params, model.cfg, proj, jnp.asarray(toks), jax.random.PRNGKey(0),
    num_iter=40, resample_y_every=10,
)
ids = np.asarray(tokens)[0, 1:-1]
print("generated:", "".join(alphabet.get_tok(int(i)) for i in ids))
print("energy trace shape (rounds, steps, batch):", np.asarray(energies).shape)
''',
        ),
        (
            "md",
            """
`lm_design.gibbs_free_generation` is the blocked-Gibbs variant (resample one
position from the full conditional each step) — often mixes faster at small L.
""",
        ),
    ],
)


nb(
    "ppl_tutorial.ipynb",
    [
        (
            "md",
            """
# Protein programming language

Compose design problems as a **program tree**: leaves are sequence segments
(fixed/variable length or constant), internal nodes group children (optionally
as separate chains) and attach **energy terms** evaluated on the ESMFold-
predicted structure of the current sequence. A simulated-annealing loop
mutates segments and re-folds.

With released weights use `cfg, params, alphabet = pretrained.esmfold_v1()`;
here a tiny random-init fold model keeps the notebook self-contained.
""",
        ),
        (
            "code",
            '''
import jax
import numpy as np

from esm_tpu import pretrained
from esm_tpu.apps import ppl

try:
    cfg, params, alphabet = pretrained.esmfold_v1()
except Exception as e:
    print(f"[{type(e).__name__}] esmfold_v1 unavailable -> tiny random-init fold model")
    from esm_tpu.data import Alphabet
    from esm_tpu.models import esm2, esmfold as ef
    from esm_tpu.models.esmfold.structure_module import StructureModuleConfig
    from esm_tpu.models.esmfold.trunk import FoldingTrunkConfig

    alphabet = Alphabet.from_architecture("ESM-1b")
    cfg = ef.ESMFoldConfig(
        esm=esm2.ESM2Config.from_alphabet(
            alphabet, num_layers=2, embed_dim=32, attention_heads=2
        ),
        trunk=FoldingTrunkConfig(
            num_blocks=1, sequence_state_dim=32, pairwise_state_dim=32,
            sequence_head_width=16, pairwise_head_width=16, max_recycles=1,
            structure_module=StructureModuleConfig(
                c_s=32, c_z=32, c_ipa=8, c_resnet=16, no_heads_ipa=4, no_blocks=1
            ),
        ),
    )
    params = ef.init_esmfold(jax.random.PRNGKey(1), cfg, alphabet)

callback = ppl.ESMFoldCallback(params, cfg, num_recycles=0, bucket=16)
''',
        ),
        (
            "code",
            '''
# a 2-fold symmetric ring: two copies of one designable protomer
np.random.seed(0)
protomer = ppl.FixedLengthSequenceSegment(10)
program = ppl.ProgramNode(
    children=[
        ppl.ProgramNode(sequence_segment=protomer),
        ppl.ProgramNode(sequence_segment=protomer),
    ],
    energy_function_terms=[ppl.MaximizePTM(), ppl.MaximizePLDDT(), ppl.SymmetryRing()],
    energy_function_weights=[1.0, 1.0, 1.0],
)
sequence, residue_indices = program.get_sequence_and_set_residue_index_ranges()
print("initial sequence:", sequence)
''',
        ),
        (
            "code",
            '''
state = ppl.run_simulated_annealing(
    program, callback,
    initial_temperature=1.0, annealing_rate=0.97,
    total_num_steps=5,  # production runs use thousands
    display_progress=False,
)
print("best energy:", float(state.best_energy))
print("best sequence:", state.best_sequence)
for name, weight, value in state.best_energy_term_fn_values:
    print(f"  {name:40s} w={weight:+.1f}  value={float(value):+.3f}")
''',
        ),
        (
            "md",
            """
Other energy terms: `MinimizeSurfaceHydrophobics`, `MatchSecondaryStructure`,
`MinimizeCRmsd`/`MinimizeDRmsd` against a template (load with
`ppl.pdb_file_to_atomview`), `MaximizeGlobularity`, surface-exposure terms.
Multimer programs set `children_are_different_chains=True` (chain breaks get
the reference's +1000 residue-index offsets). See
`examples/ppl_symmetric_design.py` and `examples/ppl_fixed_backbone.py`.
""",
        ),
    ],
)

print("done")


nb(
    "serving.ipynb",
    [
        ("md", """
# Serving ESM models: dynamic-batching inference server

The reference ships batch scripts only; `esm-serve` adds a long-lived HTTP
server whose batcher coalesces concurrent requests into shape-bucketed device
batches (one warm compiled program per length bucket) and reduces mean
embeddings on device before readback. This notebook drives the same
`InferenceServer` in-process. From a shell you would run:

```bash
esm-serve esm2_t33_650M_UR50D --port 8080 --bf16 --flash --fold-model esmfold_v1
curl -s localhost:8080/embed -d '{"sequences": ["MKTVRQERLK"], "include": ["mean"]}'
curl -s localhost:8080/fold  -d '{"sequences": ["MKTV:RQER"], "num_recycles": 3}'
```
"""),
        ("code", LM_FALLBACK),
        ("code", '''
import json, urllib.request

from esm_tpu.runtime.server import InferenceServer

server = InferenceServer(model, max_wait_ms=25.0, port=0).start()  # port 0 = auto
print("serving on", server.url)


def post(path, payload):
    req = urllib.request.Request(
        server.url + path, data=json.dumps(payload).encode())
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


out = post("/embed", {
    "sequences": [["my_protein", "MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVAT"]],
    "repr_layers": [-1],
    "include": ["mean", "logits"],
})
r = out["results"][0]
print("label:", r["label"], "| length:", r["length"])
print("mean embedding dim:", {k: len(v) for k, v in r["mean_representations"].items()})
print("logits rows:", len(r["logits"]))
'''),
        ("md", """
Concurrent requests arriving within the wait window share one device batch —
watch `mean_batch_seqs` and the latency percentiles in `/stats`:
"""),
        ("code", '''
import threading

seqs = ["KALTARQQEVFDLIRDHISQTGMPPTRAEIA", "QEVFDLIRD", "MKTVRQERLKSIVRILE"]
results = [None] * 6
barrier = threading.Barrier(6)


def worker(j):
    barrier.wait()
    results[j] = post("/embed", {"sequences": [seqs[j % 3]], "include": ["mean"]})


threads = [threading.Thread(target=worker, args=(j,)) for j in range(6)]
for t in threads:
    t.start()
for t in threads:
    t.join()
assert all(r is not None for r in results)

with urllib.request.urlopen(server.url + "/stats", timeout=30) as r:
    stats = json.loads(r.read())
print({k: stats[k] for k in ("requests", "batches", "mean_batch_seqs")})
'''),
        ("code", '''
server.stop()
print("stopped")
'''),
    ],
)


nb(
    "multichip_parallelism.ipynb",
    [
        ("md", """
# Multi-chip parallelism: fsdp/tp sharding, sequence parallelism, pipelining

The reference's only "distributed" feature is fairscale CPU offload at
world_size=1; this framework makes distribution first-class. Everything below
runs identically on a real TPU slice and on a virtual CPU mesh
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`), which is also how the
test suite pins sharded == single-device equivalence.
"""),
        ("code", '''
import jax
import jax.numpy as jnp
import numpy as np

from esm_tpu.data import Alphabet
from esm_tpu.models import esm2
from esm_tpu.parallel.mesh import MeshConfig, make_mesh
from esm_tpu.parallel.sharding import batch_sharding, shard_params

n_dev = len(jax.devices())
mesh_cfg = MeshConfig.for_devices(n_dev)
mesh = make_mesh(mesh_cfg)
print(f"{n_dev} devices -> mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")

alphabet = Alphabet.from_architecture("ESM-1b")
cfg = esm2.ESM2Config.from_alphabet(
    alphabet, num_layers=4, embed_dim=64, attention_heads=4
)
params = esm2.init(jax.random.PRNGKey(0), cfg)
seqs = [("a", "MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQD"),
        ("b", "KALTARQQEVFDLIRDHISQTGMPPTRAEIA")]
_, _, toks = alphabet.get_batch_converter(pad_to_multiple=8)(seqs)
toks = jnp.asarray(toks)
single = np.asarray(esm2.apply(params, cfg, toks)["logits"])
'''),
        ("md", """
**Tensor/FSDP sharding**: parameters get megatron column/row-parallel and
ZeRO-style PartitionSpecs; XLA SPMD inserts the collectives. The sharded
forward must (and does) equal the single-device one:
"""),
        ("code", '''
params_sh = shard_params(mesh, params)
toks_sh = jax.device_put(toks, batch_sharding(mesh))
sharded = np.asarray(esm2.apply(params_sh, cfg, toks_sh)["logits"])
print("sharded == single device:", np.allclose(sharded, single, atol=2e-5))
'''),
        ("md", """
**Sequence parallelism** for long contexts: the T axis shards over a mesh
axis and every attention runs as a ring — KV blocks rotate via `ppermute`
while each chip attends to the block in front of it. Per-chip activation
memory is O(T/N); the reference's only long-context tool was truncation.
"""),
        ("code", '''
tp = dict(zip(mesh.axis_names, mesh.devices.shape))["tp"]
if toks.shape[1] % tp == 0:
    out_seq = esm2.apply_seq_sharded(params_sh, cfg, toks_sh, mesh=mesh, seq_axis="tp")
    print("seq-parallel == single device:",
          np.allclose(np.asarray(out_seq["logits"]), single, atol=2e-5))
else:
    print(f"T={toks.shape[1]} not divisible by tp={tp}; pad to a multiple to enable")
'''),
        ("md", """
**Training composes with all of it** — the same MLM step runs data/fsdp/tp
sharded (`train_step`), GPipe-pipelined over a `pp` axis (`train_step_pp`),
or sequence-parallel (`train_step_seq`); each matches the single-device
step's loss and grads exactly in the test suite.
"""),
        ("code", '''
from esm_tpu import training

tx = training.make_optimizer(1e-4, warmup_steps=1, total_steps=10)
state = training.init_state(shard_params(mesh, esm2.init(jax.random.PRNGKey(0), cfg)), tx)
state, metrics = training.train_step(
    state, cfg, tx, jax.random.PRNGKey(1), toks_sh
)
print(f"sharded MLM step: loss {float(metrics['loss']):.3f}, "
      f"{int(metrics['num_masked'])} masked positions")
'''),
        ("md", """
For real runs: `esm_tpu.parallel.mesh.init_multihost()` brings up the slice
(one call per host) and `make_hybrid_mesh()` places the data axis on DCN with
fsdp/tp inside each host's ICI domain. Measured single-chip numbers and the
memory planner (`esm_tpu.parallel.memory_plan.plan_train`) live in
`BENCH_NOTES.md`.
"""),
    ],
)
