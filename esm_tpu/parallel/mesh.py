"""Device mesh construction for multi-chip execution.

The reference has no distributed layer (its only parallelism is fairscale FSDP
at world_size=1 for CPU offload — examples/esm2_infer_fairscale_fsdp_cpu_offloading.py:27-40).
Here distribution is first-class: one global mesh with named axes

    ("data", "fsdp", "tp")

  * data — batch parallelism (pure DP)
  * fsdp — parameter sharding (ZeRO-3 style weight gathering per layer)
  * tp   — tensor parallelism (megatron-style column/row parallel matmuls)

Shardings are expressed as PartitionSpecs (see sharding.py); XLA SPMD inserts
the all-gathers/psums and schedules them on ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_TP = "tp"
AXES = (AXIS_DATA, AXIS_FSDP, AXIS_TP)


@dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = 1
    tp: int = 1

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.data, self.fsdp, self.tp)

    @property
    def num_devices(self) -> int:
        return self.data * self.fsdp * self.tp

    @classmethod
    def for_devices(cls, n: int, *, prefer_tp: int = 4) -> "MeshConfig":
        """Heuristic factorization: give tp up to ``prefer_tp`` (ICI-local
        tensor parallel), the rest to fsdp."""
        tp = 1
        for cand in range(min(prefer_tp, n), 0, -1):
            if n % cand == 0:
                tp = cand
                break
        # all of the remainder goes to fsdp (param sharding beats pure data
        # parallel for these model sizes); pass an explicit MeshConfig for a
        # data>1 layout
        return cls(data=1, fsdp=n // tp, tp=tp)


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if cfg is None:
        cfg = MeshConfig.for_devices(len(devices))
    if cfg.num_devices > len(devices):
        raise ValueError(
            f"mesh {cfg.shape} needs {cfg.num_devices} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[: cfg.num_devices]).reshape(cfg.shape)
    return Mesh(arr, AXES)


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bring-up: call ONCE per host process before any jax op
    (SURVEY §5.8 — the reference's only 'distributed' init is a world_size=1
    NCCL group for CPU offload, scripts/fold.py:42-44). On Cloud TPU all
    arguments auto-detect from the TPU metadata; elsewhere pass the
    coordinator's host:port plus this process's rank. After this,
    ``jax.devices()`` spans every chip in the slice and ``make_mesh`` /
    ``make_hybrid_mesh`` build global meshes over them. Returns the process
    index. Safe to call when already initialized (no-op then)."""
    import jax.distributed

    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError as e:  # already initialized — keep bring-up idempotent
        if "already" not in str(e).lower():
            raise
    return jax.process_index()


def make_hybrid_mesh(cfg: Optional[MeshConfig] = None) -> Mesh:
    """Multi-host mesh with DCN/ICI-aware device order: the ``data`` axis maps
    across hosts (slow DCN — pure-DP gradient/batch traffic only) while
    ``fsdp``/``tp`` stay inside each host's ICI domain where the per-layer
    all-gathers and psums live — the scaling-book layout. Requires
    cfg.data == number of processes; falls back to :func:`make_mesh` in a
    single-process run."""
    n_proc = jax.process_count()
    if cfg is None:
        per_host = jax.local_device_count()
        local = MeshConfig.for_devices(per_host)
        cfg = MeshConfig(data=n_proc, fsdp=local.fsdp, tp=local.tp)
    if n_proc == 1:
        return make_mesh(cfg)
    if cfg.data % n_proc:
        raise ValueError(
            f"hybrid mesh: data axis ({cfg.data}) must be a multiple of the "
            f"process count ({n_proc}) so DCN carries only the data axis"
        )
    from jax.experimental import mesh_utils

    arr = mesh_utils.create_hybrid_device_mesh(
        (cfg.data // n_proc, cfg.fsdp, cfg.tp),
        (n_proc, 1, 1),
    )
    return Mesh(arr.reshape(cfg.shape), AXES)


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*spec))
