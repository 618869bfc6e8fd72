"""esm_tpu — TPU-native protein language model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/esm (ESM-2, ESM-1/1b/1v, MSA Transformer, ESMFold, ESM-IF1),
designed for TPU: scan-based stacks, pjit/mesh sharding, Pallas kernels on the
hot attention paths.
"""

from .data.alphabet import Alphabet, BatchConverter, MSABatchConverter
from .data.fasta import FastaBatchedDataset, read_fasta
from .data.msa import greedy_select, read_msa, remove_insertions
from . import pretrained

__version__ = "0.1.0"

__all__ = [
    "Alphabet",
    "BatchConverter",
    "MSABatchConverter",
    "FastaBatchedDataset",
    "read_fasta",
    "read_msa",
    "remove_insertions",
    "greedy_select",
    "pretrained",
    "models",
    "data",
    "native",
    "quantization",
    "training",
    "lora",
]

_LAZY_SUBMODULES = ("models", "native", "quantization", "training", "io",
                    "parallel", "runtime", "apps", "kernels", "ops", "utils",
                    "metrics", "lora")


def __getattr__(name):
    # Lazy submodule access (PEP 562): `esm_tpu.models` etc. work without
    # importing jax-heavy code at package-import time — the top-level import
    # stays light for CLI --help and data-only use.
    if name in _LAZY_SUBMODULES:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
