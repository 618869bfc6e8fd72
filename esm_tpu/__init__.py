"""esm_tpu — TPU-native protein language model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/esm (ESM-2, ESM-1/1b/1v, MSA Transformer, ESMFold, ESM-IF1),
designed for TPU: scan-based stacks, pjit/mesh sharding, Pallas kernels on the
hot attention paths.
"""

from .data.alphabet import Alphabet, BatchConverter, MSABatchConverter
from .data.fasta import FastaBatchedDataset, read_fasta
from . import pretrained

__version__ = "0.1.0"

__all__ = [
    "Alphabet",
    "BatchConverter",
    "MSABatchConverter",
    "FastaBatchedDataset",
    "read_fasta",
    "pretrained",
]
