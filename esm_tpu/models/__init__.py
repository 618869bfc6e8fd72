from . import esm1, esm2, msa_transformer
