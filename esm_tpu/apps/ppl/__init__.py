from .energy import (
    EnergyTerm,
    MatchSecondaryStructure,
    MaximizeGlobularity,
    MaximizePLDDT,
    MaximizePTM,
    MaximizeSurfaceExposure,
    MinimizeCRmsd,
    MinimizeDRmsd,
    MinimizeSurfaceExposure,
    MinimizeSurfaceHydrophobics,
    SymmetryRing,
)
from .folding import ESMFoldCallback, FoldingCallback, FoldingResult
from .optimize import run_simulated_annealing
from .program import ProgramNode
from .sequence import (
    ConstantSequenceSegment,
    FixedLengthSequenceSegment,
    VariableLengthSequenceSegment,
)
from .utilities import (
    get_atomview_in_residue_range,
    pdb_file_to_atomview,
    sequence_from_atomview,
)
