"""GPipe-style pipeline parallelism over a ``pp`` mesh axis.

The reference has no pipeline parallelism — its only distribution is
world-size-1 fairscale FSDP used for CPU offload
(examples/esm2_infer_fairscale_fsdp_cpu_offloading.py:27-40; SURVEY §2.5).
Here PP is a first-class strategy: the ESM stacks already keep per-layer
parameters stacked on a leading (L, ...) axis for ``lax.scan`` (see
models/lm_common.py), so pipeline parallelism is just a sharding of that axis
across S stages plus a schedule. A batch is split into M microbatches and
activations flow stage-to-stage over ICI via ``ppermute`` in the classic
GPipe schedule: M + S - 1 ticks, bubble fraction (S-1)/(M+S-1).

TPU-native design notes:
  * manual collectives only over ``pp`` (``jax.shard_map`` with
    ``axis_names={"pp"}``); the data/fsdp/tp mesh axes stay under automatic
    SPMD, so megatron tensor parallelism composes *inside* each stage;
  * the schedule is one ``lax.scan`` over ticks — a single compiled stage
    body regardless of S or M, like the layer scan it wraps;
  * fully differentiable (scan/ppermute transpose), so ``jax.grad`` through
    a pipelined forward yields the GPipe backward — no hand-written schedule;
  * bubble ticks compute on zeros with a clamped (real) padding mask, never
    on -inf-masked garbage, so no NaNs enter forward or backward values.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from .mesh import AXIS_DATA, AXIS_FSDP, AXIS_TP

AXIS_PP = "pp"
PP_AXES = (AXIS_PP, AXIS_DATA, AXIS_FSDP, AXIS_TP)


def make_pp_mesh(
    pp: int, data: int = 1, fsdp: int = 1, tp: int = 1, devices=None
) -> Mesh:
    """4-axis mesh ("pp", "data", "fsdp", "tp").

    ``pp`` leads so stages land on contiguous device blocks (neighbouring
    stages share ICI links); the inner axes keep the standard factorization
    from mesh.py so all existing PartitionSpecs apply unchanged.
    """
    if devices is None:
        devices = jax.devices()
    n = pp * data * fsdp * tp
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape((pp, data, fsdp, tp))
    return Mesh(arr, PP_AXES)


def stage_param_specs(stacked_params) -> Any:
    """Leading-(layer)-axis PartitionSpecs over ``pp`` for a stacked pytree."""
    return jax.tree.map(
        lambda leaf: PS(*((AXIS_PP,) + (None,) * (leaf.ndim - 1))),
        stacked_params,
    )


def shard_stacked_params(mesh: Mesh, stacked_params) -> Any:
    """Place stacked per-layer params with the layer axis over ``pp``."""
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        stage_param_specs(stacked_params),
        is_leaf=lambda x: isinstance(x, PS),
    )
    return jax.device_put(stacked_params, shardings)


def full_param_specs(params, stacked_key: str = "layers") -> Any:
    """Whole-model PartitionSpecs for a 4-axis pp mesh: the stacked layer
    subtree gets its leading (layer) axis over ``pp`` on top of the standard
    megatron/fsdp dims from sharding.spec_for_param; all other params keep
    their standard spec (replicated over pp)."""
    from .sharding import spec_for_param

    def f(path, leaf):
        spec = spec_for_param(path, leaf)
        in_stack = any(getattr(p, "key", None) == stacked_key for p in path)
        if not in_stack:
            return spec
        parts = list(spec) + [None] * (leaf.ndim - len(tuple(spec)))
        parts[0] = AXIS_PP
        return PS(*parts)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params_pp(mesh: Mesh, params, stacked_key: str = "layers") -> Any:
    """Place a full model pytree onto a pp mesh (layers pipelined, the rest
    following the standard tp/fsdp rules)."""
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        full_param_specs(params, stacked_key),
        is_leaf=lambda x: isinstance(x, PS),
    )
    return jax.device_put(params, shardings)


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array, Any], jax.Array],
    stacked_params,
    x: jax.Array,
    aux: Any = None,
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis_name: str = AXIS_PP,
) -> jax.Array:
    """Run ``x`` through a layer stack pipelined over ``mesh[axis_name]``.

    stage_fn(local_params, state, aux_mb) -> state applies one stage's block
    of layers; ``local_params`` is the (L/S, ...)-stacked slice held by the
    stage. ``x``: (B, ...) activations, B divisible by ``num_microbatches``.
    ``aux``: optional pytree of per-example arrays (leading axis B) that each
    microbatch needs alongside its activations (e.g. the padding mask); it is
    indexed per tick rather than flowed through the ring (it is read-only).

    Microbatch m enters stage 0 at tick m, exits stage S-1 at tick m+S-1;
    the result is psum-broadcast from the last stage (replicated output).
    """
    if axis_name not in mesh.shape:
        raise ValueError(f"mesh has no {axis_name!r} axis: {mesh.shape}")
    s = mesh.shape[axis_name]
    m = num_microbatches
    batch = x.shape[0]
    if batch % m:
        raise ValueError(f"batch {batch} not divisible by microbatches {m}")
    num_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if num_layers % s:
        raise ValueError(f"{num_layers} layers not divisible by {s} stages")

    xs = x.reshape((m, batch // m) + x.shape[1:])
    auxs = jax.tree.map(
        lambda a: a.reshape((m, batch // m) + a.shape[1:]), aux
    )
    perm = [(i, (i + 1) % s) for i in range(s)]

    def body(local_params, xs, auxs):
        idx = jax.lax.axis_index(axis_name)
        is_first = idx == 0
        is_last = idx == s - 1

        # mark the zero-init state as device-varying over pp (vma typing)
        state0, buf0 = jax.lax.pcast(
            (jnp.zeros_like(xs[0]), jnp.zeros_like(xs)),
            (axis_name,),
            to="varying",
        )

        def tick(carry, t):
            state, buf = carry
            # stage 0 ingests microbatch t while the schedule has them
            mb = jax.lax.dynamic_index_in_dim(
                xs, jnp.minimum(t, m - 1), axis=0, keepdims=False
            )
            state = jnp.where(jnp.logical_and(is_first, t < m), mb, state)
            # the microbatch in front of this stage at tick t (clamped into
            # range during bubble ticks so masks stay well-formed)
            mb_idx = jnp.clip(t - idx, 0, m - 1)
            aux_mb = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, mb_idx, axis=0, keepdims=False
                ),
                auxs,
            )
            y = stage_fn(local_params, state, aux_mb)
            # last stage emits microbatch t-(S-1) from tick S-1 on
            upd = jax.lax.dynamic_update_index_in_dim(
                buf, y.astype(buf.dtype), jnp.maximum(t - (s - 1), 0), 0
            )
            buf = jnp.where(jnp.logical_and(is_last, t >= s - 1), upd, buf)
            state = jax.lax.ppermute(y, axis_name, perm)
            return (state, buf), None

        (_, buf), _ = jax.lax.scan(
            tick, (state0, buf0), jnp.arange(m + s - 1)
        )
        # only the last stage wrote into buf (others still hold zeros):
        # psum broadcasts the result, making it pp-invariant for out_specs
        return jax.lax.psum(buf, axis_name)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(stage_param_specs(stacked_params), PS(), PS()),
        out_specs=PS(),
        axis_names=frozenset({axis_name}),
    )
    out = fn(stacked_params, xs, auxs)
    return out.reshape((batch,) + out.shape[2:])


def pipeline_transformer_stack(
    stacked_params,
    x: jax.Array,
    *,
    static,
    mesh: Mesh,
    num_microbatches: int,
    key_padding_mask: Optional[jax.Array] = None,
    axis_name: str = AXIS_PP,
) -> jax.Array:
    """Pipelined equivalent of lm_common.transformer_stack_apply's plain path
    (no hidden/attention collection — use the single-stage scan for those).
    """
    from ..models.lm_common import transformer_layer_apply

    if static.remat:
        from ..models.lm_common import checkpoint_policy

        layer_fn = jax.checkpoint(
            lambda p, h, mask: transformer_layer_apply(
                p, h, static=static, key_padding_mask=mask
            )[0],
            policy=checkpoint_policy(static.remat_policy),
        )
    else:
        layer_fn = lambda p, h, mask: transformer_layer_apply(
            p, h, static=static, key_padding_mask=mask
        )[0]

    def stage_fn(local_params, state, mask):
        def body(h, layer_params):
            return layer_fn(layer_params, h, mask), None

        h, _ = jax.lax.scan(body, state, local_params)
        return h

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros(x.shape[:2], bool)
    return pipeline_apply(
        stage_fn,
        stacked_params,
        x,
        key_padding_mask,
        mesh=mesh,
        num_microbatches=num_microbatches,
        axis_name=axis_name,
    )
