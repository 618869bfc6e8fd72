"""Host-side input validation at the public API boundary.

SURVEY §5.2: the reference's only runtime checking is scattered asserts
(esm/multihead_attention.py:192-194, esm/model/msa_transformer.py:158-163).
Here the checks live in one layer, called by the pretrained handles (and any
CLI/server path that does not already validate): token dtype/range/rank,
coordinate shapes, representation-layer indices. Everything is host-side and
O(input) cheap; traced values (inside a caller's jit) skip the value checks
but keep the static shape/dtype checks.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _is_traced(x) -> bool:
    import jax

    return isinstance(x, jax.core.Tracer)


def _on_accelerator(x) -> bool:
    """True for a jax.Array whose committed data lives on a non-CPU device."""
    import jax

    if not isinstance(x, jax.Array):
        return False
    try:
        return any(d.platform != "cpu" for d in x.devices())
    except Exception:
        # Can't determine residency (e.g. deleted/donated arrays): fall
        # through to the value check rather than silently skipping it — a
        # dead array then fails visibly at np.min instead of flowing garbage
        # into the embedding gather.
        return False


_warned_skip_range_check = False


def _warn_range_check_skipped(name: str) -> None:
    global _warned_skip_range_check
    if _warned_skip_range_check:
        return
    _warned_skip_range_check = True
    import warnings

    warnings.warn(
        f"{name} is accelerator-resident: the token value-range check is "
        "skipped to avoid a blocking device->host readback per call. "
        "Out-of-range ids are clamped by the embedding gather and produce "
        "garbage outputs silently — validate on host (numpy) if unsure. "
        "(warned once)",
        stacklevel=3,
    )


def check_tokens(tokens, alphabet, *, msa: bool = False, name: str = "tokens"):
    """Validate a token tensor against the model's alphabet.

    Accepts numpy/JAX arrays (or nested lists). Shape must be (B, T) — or
    (B, R, C) for MSA models; dtype integer; values in [0, len(alphabet)).
    Returns the array (converted with np.asarray when not already an array).
    """
    want = 3 if msa else 2
    if _is_traced(tokens):
        if tokens.ndim != want:
            raise ValueError(
                f"{name}: expected {want}D {'(B, R, C)' if msa else '(B, T)'}, "
                f"got shape {tokens.shape}"
            )
        if not np.issubdtype(tokens.dtype, np.integer):
            raise TypeError(f"{name}: expected integer dtype, got {tokens.dtype}")
        return tokens
    arr = tokens if hasattr(tokens, "ndim") else np.asarray(tokens)
    if arr.ndim != want:
        raise ValueError(
            f"{name}: expected {want}D {'(B, R, C)' if msa else '(B, T)'}, "
            f"got shape {arr.shape}"
        )
    if not np.issubdtype(np.dtype(arr.dtype), np.integer):
        raise TypeError(
            f"{name}: expected integer token ids, got dtype {arr.dtype} "
            "(use alphabet.get_batch_converter() to tokenize strings)"
        )
    if arr.size:
        if _on_accelerator(arr):
            # Value-range check needs the data; for an array already resident
            # on an accelerator that would force a blocking device->host
            # readback per call (a ~30 ms tunnel roundtrip here) and stall
            # async dispatch pipelines — skip it there, like the Tracer
            # carve-out above, but say so once.
            _warn_range_check_skipped(name)
        else:
            lo, hi = int(np.min(arr)), int(np.max(arr))
            if lo < 0 or hi >= len(alphabet):
                raise ValueError(
                    f"{name}: token ids must be in [0, {len(alphabet)}), "
                    f"found range [{lo}, {hi}]"
                )
    return arr


def check_coords(coords, *, name: str = "coords", batched: bool = False):
    """Validate backbone coordinates: (L, 3, 3) N/CA/C (or (B, L, 3, 3) when
    ``batched``), floating dtype. NaN/inf rows are legal (missing residues /
    padding convention, reference esm/inverse_folding/util.py:96-105)."""
    arr = coords if hasattr(coords, "ndim") else np.asarray(coords)
    want = 4 if batched else 3
    if arr.ndim != want or arr.shape[-2:] != (3, 3):
        raise ValueError(
            f"{name}: expected {'(B, L, 3, 3)' if batched else '(L, 3, 3)'} "
            f"N/CA/C backbone coordinates, got shape {tuple(arr.shape)}"
        )
    if not np.issubdtype(np.dtype(arr.dtype), np.floating):
        raise TypeError(f"{name}: expected floating coordinates, got {arr.dtype}")
    return arr


def check_repr_layers(repr_layers: Sequence[int], num_layers: int):
    """Representation-layer indices must resolve within [0, num_layers]
    (negative indices count from the end, reference scripts/extract.py:84-85)."""
    for i in repr_layers:
        if not isinstance(i, (int, np.integer)):
            raise TypeError(f"repr_layers entry {i!r}: expected an int")
        if not -(num_layers + 1) <= i <= num_layers:
            raise ValueError(
                f"repr_layers entry {i} out of range "
                f"[-{num_layers + 1}, {num_layers}]"
            )
