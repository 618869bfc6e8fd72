from .profiling import profile_trace, timed
from .debug import enable_nan_checks
