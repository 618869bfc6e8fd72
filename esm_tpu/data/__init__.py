from .alphabet import Alphabet, BatchConverter, MSABatchConverter, PROTEIN_TOKS
from .fasta import FastaBatchedDataset, read_fasta, read_alignment_lines
from .structural import ESMStructuralSplitDataset
