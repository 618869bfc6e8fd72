from .model import (
    GVPTransformerConfig,
    apply,
    get_encoder_output,
    get_sequence_loss,
    sample,
    score_sequence,
)
from .init import init
from .util import CoordBatchConverter, load_coords, load_structure
