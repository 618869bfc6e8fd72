"""Runtime checking (SURVEY §5.2): the reference has only shape asserts; here
jit-compatible NaN checking can be enabled globally."""

from __future__ import annotations

import jax


def enable_nan_checks(enable: bool = True) -> None:
    """Turn on jax debug_nans: any NaN produced under jit raises with a
    de-optimized re-run pinpointing the primitive."""
    jax.config.update("jax_debug_nans", enable)
