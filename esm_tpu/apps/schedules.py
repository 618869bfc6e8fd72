"""Annealing schedules for MCMC design, jit-friendly.

The reference drives temperatures through torch lr_scheduler wrappers stepped
once per iteration (examples/lm-design/utils/scheduler.py:15-68, config
default: StepLR step_size=10000 gamma=0.5 initial=8 —
examples/lm-design/conf/config.yaml:19-39). A stateful .step() object cannot
live inside ``lax.scan``; here each schedule is a frozen dataclass mapping the
*global step index* to a value, so it is hashable (usable in static jit args)
and traceable (step may be a traced int32 inside the scan).

Statefulness parity: torch schedulers mutate; evaluating a pure schedule at
the global iteration index reproduces the reference's ``resuming_stage``
behavior (schedulers keep state across free-generation rounds,
utils/free_generation.py:66-72) for free.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple, Union

import jax.numpy as jnp


@dataclass(frozen=True)
class ConstantSchedule:
    """A fixed value (reference scheduler.py ConstantSchedule)."""

    value: float

    def __call__(self, step) -> jnp.ndarray:
        del step
        return jnp.float32(self.value)


@dataclass(frozen=True)
class StepLR:
    """value = initial * gamma ** (step // step_size) — torch StepLR."""

    initial: float
    step_size: int
    gamma: float = 0.1

    def __call__(self, step) -> jnp.ndarray:
        k = jnp.asarray(step, jnp.int32) // self.step_size
        return jnp.float32(self.initial) * jnp.float32(self.gamma) ** k.astype(jnp.float32)


@dataclass(frozen=True)
class MultiStepLR:
    """value = initial * gamma ** (#milestones <= step) — torch MultiStepLR."""

    initial: float
    milestones: Tuple[int, ...]
    gamma: float = 0.1

    def __call__(self, step) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.int32)
        k = sum((step >= m).astype(jnp.float32) for m in self.milestones)
        return jnp.float32(self.initial) * jnp.float32(self.gamma) ** k


@dataclass(frozen=True)
class ExponentialLR:
    """value = initial * gamma ** step — torch ExponentialLR."""

    initial: float
    gamma: float

    def __call__(self, step) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        return jnp.float32(self.initial) * jnp.float32(self.gamma) ** step


@dataclass(frozen=True)
class LinearLR:
    """Linear factor ramp start_factor -> end_factor over total_iters
    (constant end_factor after) — torch LinearLR."""

    initial: float
    start_factor: float = 1.0 / 3.0
    end_factor: float = 1.0
    total_iters: int = 5

    def __call__(self, step) -> jnp.ndarray:
        frac = jnp.clip(
            jnp.asarray(step, jnp.float32) / max(self.total_iters, 1), 0.0, 1.0
        )
        factor = self.start_factor + (self.end_factor - self.start_factor) * frac
        return jnp.float32(self.initial) * factor


@dataclass(frozen=True)
class CosineAnnealingLR:
    """eta_min + (initial - eta_min) * (1 + cos(pi * step / T_max)) / 2 —
    torch CosineAnnealingLR (no restarts)."""

    initial: float
    T_max: int
    eta_min: float = 0.0

    def __call__(self, step) -> jnp.ndarray:
        frac = jnp.asarray(step, jnp.float32) / max(self.T_max, 1)
        cos = jnp.cos(jnp.float32(math.pi) * frac)
        return jnp.float32(self.eta_min) + (
            jnp.float32(self.initial) - jnp.float32(self.eta_min)
        ) * (1.0 + cos) / 2.0


Schedule = Union[
    ConstantSchedule, StepLR, MultiStepLR, ExponentialLR, LinearLR, CosineAnnealingLR
]
ScheduleSpec = Union[float, int, Dict, Schedule]

_SCHEDULE_CLASSES = {
    c.__name__: c
    for c in (StepLR, MultiStepLR, ExponentialLR, LinearLR, CosineAnnealingLR)
}


def to_schedule(spec: ScheduleSpec) -> Schedule:
    """Build a schedule from a config value (reference scheduler.to_scheduler):
    a number is constant; a dict names the scheduler like the reference YAML,
    e.g. ``{"scheduler": "StepLR", "initial": 8, "step_size": 10000,
    "gamma": 0.5}``; an existing schedule passes through."""
    if isinstance(spec, (int, float)):
        return ConstantSchedule(float(spec))
    if isinstance(spec, dict):
        kw = dict(spec)
        name = kw.pop("scheduler")
        cls = _SCHEDULE_CLASSES.get(name)
        if cls is None:
            raise ValueError(
                f"unknown scheduler {name!r}; known: {sorted(_SCHEDULE_CLASSES)}"
            )
        if "milestones" in kw:
            kw["milestones"] = tuple(kw["milestones"])
        return cls(**kw)
    if callable(spec):
        return spec
    raise TypeError(f"cannot build a schedule from {spec!r}")
