from .alphabet import Alphabet, BatchConverter, MSABatchConverter, PROTEIN_TOKS
from .fasta import FastaBatchedDataset, read_fasta, read_alignment_lines
from .msa import greedy_select, read_msa, remove_insertions
from .structural import ESMStructuralSplitDataset
