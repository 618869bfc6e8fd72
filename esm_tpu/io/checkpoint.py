"""Native (orbax) checkpoint save/load for sharded parameter pytrees.

The reference only *loads* torch .pt checkpoints (SURVEY §5.4); this adds the
TPU-native persistence path: params converted once from .pt are saved in orbax
format and thereafter restore directly onto a device mesh (each host reads its
shards — no full-tree host materialization).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str, template: Optional[Any] = None, mesh=None, specs=None):
    """Restore params. With (mesh, specs) the arrays are restored sharded;
    with a template they restore to its shapes/dtypes; bare restore otherwise."""
    import orbax.checkpoint as ocp

    if (mesh is not None or specs is not None) and template is None:
        # silently falling back to a bare (unsharded, single-host) restore
        # would materialize e.g. a 15B tree on one host and hand back arrays
        # the caller believes are mesh-sharded
        raise ValueError(
            "load_params: sharded restore needs a template for shapes/dtypes "
            "(e.g. a fresh init); got mesh/specs without one"
        )
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if mesh is not None and template is not None:
            from jax.sharding import NamedSharding

            if specs is None:
                from ..parallel.sharding import param_specs

                specs = param_specs(template)
            abstract = jax.tree.map(
                lambda x, s: jax.ShapeDtypeStruct(
                    x.shape, x.dtype, sharding=NamedSharding(mesh, s)
                ),
                template,
                specs,
                is_leaf=lambda x: hasattr(x, "shape"),
            )
            return ckptr.restore(path, abstract)
        if template is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
            )
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def save_train_state(path: str, state) -> None:
    """Persist a full ``training.TrainState`` (params + optimizer moments +
    step) mid-run. The reference has no training, hence no resume story
    (SURVEY §5.4); here a pre-empted TPU job continues bit-exactly: restore
    with :func:`load_train_state`, fold the step into the data/mask rng, and
    the resumed trajectory equals the uninterrupted one
    (tests/test_training.py::test_resume_is_bit_exact)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_train_state(path: str, template):
    """Restore a TrainState saved by :func:`save_train_state`. ``template`` is
    a same-structure state (e.g. fresh ``training.init_state`` output) giving
    shapes/dtypes; arrays restore to host and follow the caller's placement
    (re-shard with ``parallel.sharding.shard_params`` for mesh runs)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
        )
        return ckptr.restore(path, abstract)
