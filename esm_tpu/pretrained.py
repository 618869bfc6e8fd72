"""Pretrained checkpoint registry and loading.

Reference semantics: esm/pretrained.py — name->URL download with torch-hub
cache, per-architecture legacy fairseq key upgrades (v1) / prefix stripping
(v2), contact-regression weight merge, strict key checking. The .pt files are
parsed with torch (host-side IO only) and converted to JAX pytrees via
esm_tpu.io.convert*.

Returns lightweight model handles exposing the reference's calling convention:
``model, alphabet = esm_tpu.pretrained.esm2_t33_650M_UR50D()`` then
``model(tokens, repr_layers=[33], return_contacts=True)``.
"""

from __future__ import annotations

import re
import warnings
from argparse import Namespace
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

from .data.alphabet import Alphabet

MODEL_URL = "https://dl.fbaipublicfiles.com/fair-esm/models/{}.pt"
REGRESSION_URL = "https://dl.fbaipublicfiles.com/fair-esm/regression/{}-contact-regression.pt"


def _has_regression_weights(model_name: str) -> bool:
    """(reference esm/pretrained.py:18-21)"""
    return not (
        "esm1v" in model_name
        or "esm_if" in model_name
        or "270K" in model_name
        or "500K" in model_name
    )


def _torch():
    import torch

    return torch


def _cache_dir() -> Path:
    import os

    d = Path(os.environ.get("ESM_TPU_CACHE", Path.home() / ".cache/esm_tpu/checkpoints"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _download(url: str) -> Path:
    import urllib.request

    dest = _cache_dir() / Path(url).name
    if not dest.exists():
        tmp = dest.with_suffix(".tmp")
        urllib.request.urlretrieve(url, tmp)
        tmp.rename(dest)
    return dest


def _load_checkpoint(model_name: str):
    torch = _torch()
    path = _download(MODEL_URL.format(model_name))
    model_data = torch.load(path, map_location="cpu", weights_only=False)
    regression_data = None
    if _has_regression_weights(model_name):
        rpath = _download(REGRESSION_URL.format(model_name))
        regression_data = torch.load(rpath, map_location="cpu", weights_only=False)
    return model_data, regression_data


def load_hub_workaround(url: str):
    """Download a checkpoint URL into the cache and torch-load it
    (reference esm/pretrained.py:31-43 public helper)."""
    torch = _torch()
    try:
        path = _download(url)
    except Exception as e:
        raise Exception(f"Could not load {url}, check if you specified a correct model name?") from e
    return torch.load(path, map_location="cpu", weights_only=False)


def load_regression_hub(model_name: str):
    """Load the separate contact-regression weights for ``model_name``
    (reference esm/pretrained.py:52-55)."""
    return load_hub_workaround(REGRESSION_URL.format(model_name))


# ---------------------------------------------------------------------------
# Legacy key upgrades (reference esm/pretrained.py:85-183)
# ---------------------------------------------------------------------------


def has_emb_layer_norm_before(model_state) -> bool:
    """Distinguish ESM-1b-style checkpoints (reference esm/pretrained.py:76-82)."""
    return any(k.startswith("emb_layer_norm_before") for k in model_state)


_has_emb_layer_norm_before = has_emb_layer_norm_before  # internal alias


def _strip_through(key: str, marker: str, guard: str) -> str:
    """Drop everything up to and including the first ``marker`` in ``key`` (and
    delete any later occurrences), but only when ``guard`` appears in the key.

    This reproduces the *mapping* of the reference's fairseq-era key renames
    (reference esm/pretrained.py:91-108) — including the corner case where a
    key contains ``guard`` but not ``marker`` (maps to the empty string) — as
    one named helper instead of per-arch lambdas.
    """
    if guard not in key:
        return key
    _, hit, tail = key.partition(marker)
    if not hit:
        return ""
    return tail.replace(marker, "")


def _rename_v1_args(args: Dict[str, Any], stem: str) -> Dict[str, Any]:
    """Argparse-namespace keys lose their ``{stem}_`` module prefix."""
    return {_strip_through(k, stem + "_", stem): v for k, v in args.items()}


def _rename_v1_state(state: Dict, stem: str) -> Dict:
    """State-dict keys lose the ``{stem}.sentence_encoder.`` / ``{stem}.``
    module paths (fairseq wrapped the model in an encoder/decoder shell)."""
    out = {}
    for k, v in state.items():
        k = _strip_through(k, "sentence_encoder.", "sentence_encoder")
        k = _strip_through(k, stem + ".", stem)
        out[k] = v
    return out


def _swap_row_column(key: str) -> str:
    """Early MSA checkpoints named the row/column attention modules the other
    way around (reference esm/pretrained.py:121-125): any key mentioning
    ``row`` becomes ``column``; otherwise ``column`` becomes ``row``."""
    if "row" in key:
        return key.replace("row", "column")
    return key.replace("column", "row")


# Inverse-folding checkpoints predate the module layout the reference (and this
# repo) use; ordered substring renames, applied first-to-last
# (mapping parity with reference esm/pretrained.py:128-146).
_GVP_KEY_RENAMES: Tuple[Tuple[str, str], ...] = (
    ("W_v", "embed_graph.embed_node"),
    ("W_e", "embed_graph.embed_edge"),
    ("embed_scores.0", "embed_confidence"),
    ("embed_score.", "embed_graph.embed_confidence."),
    ("seq_logits_projection.", ""),
    ("embed_ingraham_features", "embed_dihedrals"),
    ("embed_gvp_in_local_frame.0", "embed_gvp_output"),
    ("embed_features_in_local_frame.0", "embed_gvp_input_features"),
)


def upgrade_state_v1(model_data) -> Tuple[Dict[str, Any], Dict, str]:
    """Per-architecture fairseq-era upgrades. Returns (args dict, state, arch).

    Mapping parity with reference esm/pretrained.py:85-161; the expression is
    table/helper-driven rather than the reference's lambda chains.
    """
    arch = model_data["args"].arch
    state = model_data["model"]
    args = vars(model_data["args"])

    if arch == "roberta_large":  # ESM-1b / ESM-1v
        args = _rename_v1_args(args, "encoder")
        state = _rename_v1_state(state, "encoder")
        alphabet = Alphabet.from_architecture("ESM-1b")
        state["embed_tokens.weight"][alphabet.mask_idx].zero_()  # token-drop row
        args["emb_layer_norm_before"] = _has_emb_layer_norm_before(state)
    elif arch == "protein_bert_base":  # ESM-1
        args = _rename_v1_args(args, "decoder")
        state = _rename_v1_state(state, "decoder")
    elif arch == "msa_transformer":
        args = _rename_v1_args(args, "encoder")
        state = _rename_v1_state({_swap_row_column(k): v for k, v in state.items()}, "encoder")
        if args.get("embed_positions_msa", False):
            args["embed_positions_msa_dim"] = state["msa_position_embedding"].size(-1)
    elif "invariant_gvp" in arch:
        renamed = {}
        for k, v in state.items():
            if "version" in k:
                continue
            for old, new in _GVP_KEY_RENAMES:
                k = k.replace(old, new)
            renamed[k] = v
        state = renamed
    else:
        raise ValueError(f"Unknown architecture {arch}")
    return args, state, arch


def upgrade_state_v2(state: Dict) -> Dict:
    """Strip 'encoder.sentence_encoder.' / 'encoder.' prefixes
    (reference esm/pretrained.py:164-174)."""
    pattern = re.compile("^" + "|".join(["encoder.sentence_encoder.", "encoder."]))
    return {pattern.sub("", k): v for k, v in state.items()}


# ---------------------------------------------------------------------------
# Model handles
# ---------------------------------------------------------------------------


class LMHandle:
    """Callable handle exposing the reference forward contract
    ({"logits","representations","attentions","contacts"})."""

    def __init__(self, kind: str, cfg, params, alphabet: Alphabet):
        self.kind = kind  # "esm2" | "esm1" | "msa"
        self.cfg = cfg
        self.params = params
        self.alphabet = alphabet

    @property
    def num_layers(self) -> int:
        return self.cfg.num_layers

    @property
    def embed_dim(self) -> int:
        return self.cfg.embed_dim

    @property
    def attention_heads(self) -> int:
        return self.cfg.attention_heads

    def with_options(self, **kw) -> "LMHandle":
        """Return a handle with execution options changed (compute_dtype,
        use_flash, ...). E.g. ``model.with_options(compute_dtype=jnp.bfloat16,
        use_flash=True)`` for TPU serving."""
        import dataclasses

        return LMHandle(
            self.kind, dataclasses.replace(self.cfg, **kw), self.params, self.alphabet
        )

    def quantized(self, **kw) -> "LMHandle":
        """Weight-only int8 handle (esm_tpu/quantization.py): ~2x smaller
        params, same API. The TPU-native replacement for the reference's
        FSDP CPU offload of 15B (esm2_infer_fairscale_fsdp_cpu_offloading.py)
        — 15B fits a single 16 GB chip at int8."""
        from .quantization import quantize_params

        return LMHandle(
            self.kind, self.cfg, quantize_params(self.params, **kw), self.alphabet
        )

    def __call__(
        self,
        tokens,
        repr_layers: Sequence[int] = (),
        need_head_weights: bool = False,
        return_contacts: bool = False,
    ):
        import jax.numpy as jnp

        from .models import esm1, esm2, msa_transformer
        from .utils.validation import check_repr_layers, check_tokens

        tokens = check_tokens(tokens, self.alphabet, msa=self.kind == "msa")
        check_repr_layers(repr_layers, self.num_layers)
        mod = {"esm2": esm2, "esm1": esm1, "msa": msa_transformer}[self.kind]
        if repr_layers and not (return_contacts and not need_head_weights):
            # memory-frugal path: only the requested layers are kept in-scan
            out = mod.apply(
                self.params,
                self.cfg,
                jnp.asarray(tokens),
                need_head_weights=need_head_weights,
                return_contacts=return_contacts,
                repr_layers=tuple(repr_layers),
            )
            return dict(out)
        out = mod.apply(
            self.params,
            self.cfg,
            jnp.asarray(tokens),
            need_head_weights=need_head_weights,
            return_contacts=return_contacts,
            return_representations=bool(repr_layers),
        )
        result = dict(out)
        if repr_layers:
            reps = out["representations"]
            n = reps.shape[0] - 1
            result["representations"] = {
                (i if i >= 0 else n + 1 + i): reps[i] for i in repr_layers
            }
        return result

    def predict_contacts(self, tokens):
        return self(tokens, return_contacts=True)["contacts"]


class IFHandle:
    """ESM-IF1 handle with sample/score APIs."""

    def __init__(self, cfg, params, alphabet: Alphabet):
        self.cfg = cfg
        self.params = params
        self.alphabet = alphabet

    def sample(self, coords, **kw):
        from .models import inverse_folding as ifm
        from .utils.validation import check_coords

        check_coords(coords)
        return ifm.sample(self.params, self.cfg, self.alphabet, coords, **kw)

    def score_sequence(self, coords, seq):
        from .models import inverse_folding as ifm
        from .utils.validation import check_coords

        check_coords(coords)
        return ifm.score_sequence(self.params, self.cfg, self.alphabet, coords, seq)

    def forward(self, coords, padding_mask, confidence, prev_output_tokens):
        from .models import inverse_folding as ifm

        return ifm.apply(
            self.params, self.cfg, coords, padding_mask, confidence, prev_output_tokens
        )


class ESMFoldHandle:
    """ESMFold handle exposing the reference model API
    (esm/esmfold/v1/esmfold.py:152,281,350,354: forward/infer/infer_pdb/
    output_to_pdb/set_chunk_size).

    Iterable as ``cfg, params, alphabet = handle`` so functional-style callers
    can unpack it directly.
    """

    def __init__(self, cfg, params, alphabet: Alphabet):
        self.cfg = cfg
        self.params = params
        self.alphabet = alphabet

    def __iter__(self):
        return iter((self.cfg, self.params, self.alphabet))

    def infer(self, sequences, **kw):
        from .models import esmfold as ef

        return ef.infer(self.params, self.cfg, sequences, **kw)

    def infer_pdbs(self, seqs, **kw):
        from .models import esmfold as ef

        return ef.infer_pdbs(self.params, self.cfg, seqs, **kw)

    def infer_pdb(self, seq, **kw):
        return self.infer_pdbs([seq], **kw)[0]

    @staticmethod
    def output_to_pdb(output):
        from .models import esmfold as ef

        return ef.output_to_pdb(output)

    def set_chunk_size(self, chunk_size: Optional[int]) -> None:
        """Chunked triangle attention (reference esmfold.py:354-360 semantics:
        in-place, trades speed for O(L) pair-stage memory)."""
        import dataclasses

        self.cfg = dataclasses.replace(
            self.cfg, trunk=dataclasses.replace(self.cfg.trunk, **{"chunk_size": chunk_size})
        )

    def with_options(self, *, lm_dtype=None, **trunk_updates) -> "ESMFoldHandle":
        """New handle with execution options changed.

        ``lm_dtype`` sets the frozen LM's compute dtype — ``jnp.float16``
        reproduces the reference's half-precision LM (esmfold.py:59-62;
        weights are cast at use, numerically identical to storing fp16).
        Remaining kwargs are trunk options (compute_dtype, use_flash_tri,
        chunk_size, pair_spec, ...)."""
        import dataclasses

        cfg = self.cfg
        if lm_dtype is not None:
            cfg = dataclasses.replace(
                cfg, esm=dataclasses.replace(cfg.esm, compute_dtype=lm_dtype)
            )
        if trunk_updates:
            cfg = dataclasses.replace(
                cfg, trunk=dataclasses.replace(cfg.trunk, **trunk_updates)
            )
        return ESMFoldHandle(cfg, self.params, self.alphabet)

    def quantized(self, **kw) -> "ESMFoldHandle":
        """Weight-only int8 LM+trunk (esm-fold --int8 equivalent)."""
        from .quantization import quantize_params

        return ESMFoldHandle(self.cfg, quantize_params(self.params, **kw), self.alphabet)


# ---------------------------------------------------------------------------
# Core loaders
# ---------------------------------------------------------------------------


def _build_lm_from_state(model_name, args, state, arch, regression_data):
    from .io import convert
    from .models import esm1 as esm1_mod
    from .models import esm2 as esm2_mod
    from .models import msa_transformer as msa_mod

    if regression_data is not None:
        state = dict(state)
        state.update(regression_data["model"])
    elif _has_regression_weights(model_name):
        warnings.warn(
            "Regression weights not found, predicting contacts will not produce "
            "correct results."
        )

    if arch == "esm2":
        alphabet = Alphabet.from_architecture("ESM-1b")
        cfg_src = args  # cfg namespace from checkpoint
        cfg = esm2_mod.ESM2Config.from_alphabet(
            alphabet,
            num_layers=cfg_src["encoder_layers"],
            embed_dim=cfg_src["encoder_embed_dim"],
            attention_heads=cfg_src["encoder_attention_heads"],
            token_dropout=cfg_src["token_dropout"],
        )
        params = convert.convert_esm2(state, attention_heads=cfg.attention_heads)
        return LMHandle("esm2", cfg, params, alphabet)
    if arch == "roberta_large":
        alphabet = Alphabet.from_architecture("ESM-1b")
        cfg = esm1_mod.ESM1Config.from_alphabet(
            alphabet,
            model_version="ESM-1b",
            num_layers=args["layers"],
            embed_dim=args["embed_dim"],
            ffn_embed_dim=args["ffn_embed_dim"],
            attention_heads=args["attention_heads"],
            max_positions=args["max_positions"],
            emb_layer_norm_before=args.get("emb_layer_norm_before", False),
            token_dropout=args.get("token_dropout", False),
        )
        params = convert.convert_esm1(
            state, model_version="ESM-1b", attention_heads=args["attention_heads"]
        )
        return LMHandle("esm1", cfg, params, alphabet)
    if arch == "protein_bert_base":
        alphabet = Alphabet.from_architecture("ESM-1")
        cfg = esm1_mod.ESM1Config.from_alphabet(
            alphabet,
            model_version="ESM-1",
            num_layers=args["layers"],
            embed_dim=args["embed_dim"],
            ffn_embed_dim=args["ffn_embed_dim"],
            attention_heads=args["attention_heads"],
            final_bias=args.get("final_bias", True),
            token_dropout=args.get("token_dropout", False),
        )
        params = convert.convert_esm1(
            state, model_version="ESM-1", attention_heads=args["attention_heads"]
        )
        return LMHandle("esm1", cfg, params, alphabet)
    if arch == "msa_transformer":
        alphabet = Alphabet.from_architecture("msa_transformer")
        cfg = msa_mod.MSATransformerConfig.from_alphabet(
            alphabet,
            num_layers=args["layers"],
            embed_dim=args["embed_dim"],
            ffn_embed_dim=args["ffn_embed_dim"],
            attention_heads=args["attention_heads"],
            max_positions=args["max_positions"],
            embed_positions_msa=args.get("embed_positions_msa", False),
        )
        params = convert.convert_msa_transformer(
            state, attention_heads=args["attention_heads"]
        )
        return LMHandle("msa", cfg, params, alphabet)
    raise ValueError(f"Unknown architecture {arch}")


def load_model_and_alphabet_core(model_name, model_data, regression_data=None):
    if model_name.startswith("esm2"):
        cfg = model_data["cfg"]["model"]
        args = {
            "encoder_layers": cfg.encoder_layers,
            "encoder_embed_dim": cfg.encoder_embed_dim,
            "encoder_attention_heads": cfg.encoder_attention_heads,
            "token_dropout": cfg.token_dropout,
        }
        state = upgrade_state_v2(model_data["model"])
        handle = _build_lm_from_state(model_name, args, state, "esm2", regression_data)
        return handle, handle.alphabet

    args, state, arch = upgrade_state_v1(model_data)
    if "invariant_gvp" in arch:
        from .io.convert_if import convert_gvp_transformer
        from .models.inverse_folding.model import GVPTransformerConfig

        alphabet = Alphabet.from_architecture("invariant_gvp")
        cfg = GVPTransformerConfig.from_alphabet(
            alphabet,
            encoder_embed_dim=args["encoder_embed_dim"],
            encoder_layers=args["encoder_layers"],
            encoder_attention_heads=args["encoder_attention_heads"],
            encoder_ffn_embed_dim=args["encoder_ffn_embed_dim"],
            decoder_embed_dim=args["decoder_embed_dim"],
            decoder_layers=args["decoder_layers"],
            decoder_attention_heads=args["decoder_attention_heads"],
            decoder_ffn_embed_dim=args["decoder_ffn_embed_dim"],
            gvp_top_k_neighbors=args["gvp_top_k_neighbors"],
            gvp_node_hidden_dim_scalar=args["gvp_node_hidden_dim_scalar"],
            gvp_node_hidden_dim_vector=args["gvp_node_hidden_dim_vector"],
            gvp_edge_hidden_dim_scalar=args["gvp_edge_hidden_dim_scalar"],
            gvp_edge_hidden_dim_vector=args["gvp_edge_hidden_dim_vector"],
            gvp_num_encoder_layers=args["gvp_num_encoder_layers"],
        )
        params = convert_gvp_transformer(state)
        return IFHandle(cfg, params, alphabet), alphabet

    handle = _build_lm_from_state(model_name, args, state, arch, regression_data)
    return handle, handle.alphabet


def load_model_and_alphabet(model_name: str):
    if model_name.endswith(".pt"):
        return load_model_and_alphabet_local(model_name)
    return load_model_and_alphabet_hub(model_name)


def load_model_and_alphabet_hub(model_name: str):
    model_data, regression_data = _load_checkpoint(model_name)
    return load_model_and_alphabet_core(model_name, model_data, regression_data)


def load_model_and_alphabet_local(model_location: str):
    torch = _torch()
    model_location = Path(model_location)
    model_data = torch.load(str(model_location), map_location="cpu", weights_only=False)
    model_name = model_location.stem
    regression_data = None
    if _has_regression_weights(model_name):
        rloc = str(model_location.with_suffix("")) + "-contact-regression.pt"
        if Path(rloc).exists():
            regression_data = torch.load(rloc, map_location="cpu", weights_only=False)
    return load_model_and_alphabet_core(model_name, model_data, regression_data)


# ---------------------------------------------------------------------------
# Named constructors (reference esm/pretrained.py:224-553)
# ---------------------------------------------------------------------------

_LM_NAMES = [
    "esm1_t34_670M_UR50S",
    "esm1_t34_670M_UR50D",
    "esm1_t34_670M_UR100",
    "esm1_t12_85M_UR50S",
    "esm1_t6_43M_UR50S",
    "esm1b_t33_650M_UR50S",
    "esm_msa1_t12_100M_UR50S",
    "esm_msa1b_t12_100M_UR50S",
    "esm1v_t33_650M_UR90S_1",
    "esm1v_t33_650M_UR90S_2",
    "esm1v_t33_650M_UR90S_3",
    "esm1v_t33_650M_UR90S_4",
    "esm1v_t33_650M_UR90S_5",
    "esm_if1_gvp4_t16_142M_UR50",
    "esm2_t6_8M_UR50D",
    "esm2_t12_35M_UR50D",
    "esm2_t30_150M_UR50D",
    "esm2_t33_650M_UR50D",
    "esm2_t36_3B_UR50D",
    "esm2_t48_15B_UR50D",
]


def _make_constructor(name):
    def ctor():
        return load_model_and_alphabet_hub(name)

    ctor.__name__ = name
    ctor.__doc__ = f"Load {name}. Returns (model, alphabet)."
    return ctor


for _name in _LM_NAMES:
    globals()[_name] = _make_constructor(_name)


def esm1v_t33_650M_UR90S():
    return load_model_and_alphabet_hub("esm1v_t33_650M_UR90S_1")


# ESMFold (reference esm/esmfold/v1/pretrained.py)

ESM_REGISTRY_FOR_FOLD = {
    "esm2_8M": "esm2_t6_8M_UR50D_500K",
    "esm2_8M_270K": "esm2_t6_8M_UR50D",
    "esm2_35M": "esm2_t12_35M_UR50D_500K",
    "esm2_35M_270K": "esm2_t12_35M_UR50D",
    "esm2_150M": "esm2_t30_150M_UR50D_500K",
    "esm2_150M_270K": "esm2_t30_150M_UR50D_270K",
    "esm2_650M": "esm2_t33_650M_UR50D",
    "esm2_650M_270K": "esm2_t33_650M_270K_UR50D",
    "esm2_3B": "esm2_t36_3B_UR50D",
    "esm2_3B_270K": "esm2_t36_3B_UR50D_500K",
    "esm2_15B": "esm2_t48_15B_UR50D",
}


def load_esmfold(model_name: str, fast: bool = False):
    """Load an ESMFold checkpoint (+ its LM) into (cfg, params, alphabet).

    Mirrors reference esm/esmfold/v1/pretrained.py:13-38: the esmfold .pt
    holds {cfg, model} with esm.* LM keys absent — the LM weights come from
    the LM checkpoint named by cfg.esm_type.

    ``fast=True`` applies the TPU serving preset: bf16 compute in the LM and
    trunk plus the fused Pallas triangle-attention kernels (L=1000 fold
    10.2 s -> 3.5 s on one v5e; fp32 defaults remain parity-grade).
    """
    import jax.numpy as jnp

    from .io.convert import convert_esm2
    from .io.convert_esmfold import convert_esmfold
    from .models import esm2 as esm2_mod
    from .models.esmfold.esmfold import ESMFoldConfig, af2_to_esm_table
    from .models.esmfold.structure_module import StructureModuleConfig
    from .models.esmfold.trunk import FoldingTrunkConfig

    torch = _torch()
    if model_name.endswith(".pt"):
        model_data = torch.load(model_name, map_location="cpu", weights_only=False)
    else:
        # constructor-style aliases: the released checkpoint files are named
        # esmfold_3B_v{0,1} — accepting the short names keeps --fold-model
        # esmfold_v1 (the documented spelling) from 404ing
        model_name = {
            "esmfold_v0": "esmfold_3B_v0", "esmfold_v1": "esmfold_3B_v1"
        }.get(model_name, model_name)
        path = _download(MODEL_URL.format(model_name))
        model_data = torch.load(path, map_location="cpu", weights_only=False)

    cfg_ck = model_data["cfg"]["model"]
    state = model_data["model"]

    lm_name = ESM_REGISTRY_FOR_FOLD[cfg_ck.esm_type]
    lm_handle, alphabet = load_model_and_alphabet_hub(lm_name)

    tcfg = cfg_ck.trunk
    smc = tcfg.structure_module
    cfg = ESMFoldConfig(
        esm=lm_handle.cfg,
        trunk=FoldingTrunkConfig(
            num_blocks=tcfg.num_blocks,
            sequence_state_dim=tcfg.sequence_state_dim,
            pairwise_state_dim=tcfg.pairwise_state_dim,
            sequence_head_width=tcfg.sequence_head_width,
            pairwise_head_width=tcfg.pairwise_head_width,
            position_bins=tcfg.position_bins,
            max_recycles=tcfg.max_recycles,
            structure_module=StructureModuleConfig(
                c_s=smc.c_s,
                c_z=smc.c_z,
                c_ipa=smc.c_ipa,
                c_resnet=smc.c_resnet,
                no_heads_ipa=smc.no_heads_ipa,
                no_qk_points=smc.no_qk_points,
                no_v_points=smc.no_v_points,
                no_blocks=smc.no_blocks,
                no_transition_layers=smc.no_transition_layers,
                no_resnet_blocks=smc.no_resnet_blocks,
                no_angles=smc.no_angles,
                trans_scale_factor=smc.trans_scale_factor,
            ),
        ),
        use_esm_attn_map=getattr(cfg_ck, "use_esm_attn_map", False),
        lddt_head_hid_dim=getattr(cfg_ck, "lddt_head_hid_dim", 128),
        esm_type=cfg_ck.esm_type,
    )
    if fast:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            esm=dataclasses.replace(cfg.esm, compute_dtype=jnp.bfloat16, use_flash=True),
            trunk=dataclasses.replace(
                cfg.trunk, compute_dtype=jnp.bfloat16, use_flash_tri=True
            ),
        )
    params = convert_esmfold({k: v for k, v in state.items() if not k.startswith("esm.")})
    params["esm"] = lm_handle.params
    params["af2_to_esm"] = jnp.asarray(af2_to_esm_table(alphabet))
    return ESMFoldHandle(cfg, params, alphabet)


def esmfold_v0(fast: bool = False):
    return load_esmfold("esmfold_3B_v0", fast=fast)


def esmfold_v1(fast: bool = False):
    return load_esmfold("esmfold_3B_v1", fast=fast)


# Structure-module-only ablations (reference esm/pretrained.py:422-553)

_SM_ONLY_SIZES = ["8M", "8M_270K", "35M", "35M_270K", "150M", "150M_270K",
                  "650M", "650M_270K", "3B", "3B_270K", "15B"]


def _make_smonly(size):
    def ctor():
        return load_esmfold(f"esmfold_structure_module_only_{size}")

    ctor.__name__ = f"esmfold_structure_module_only_{size}"
    ctor.__doc__ = (
        f"ESMFold baseline (structure-module-only) using ESM-2 {size}. "
        "Returns (cfg, params, alphabet)."
    )
    return ctor


for _size in _SM_ONLY_SIZES:
    globals()[f"esmfold_structure_module_only_{_size}"] = _make_smonly(_size)
