"""Simulated-annealing Metropolis-Hastings optimizer for program trees.

Reference semantics: examples/protein-programming-language/language/optimize.py —
annealed MH over program mutations, per-term energy logging, best-state
tracking. (The reference's rich.Live table becomes plain logging.)
"""

from __future__ import annotations

import logging
from copy import deepcopy
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from .folding import FoldingCallback
from .program import ProgramNode

logger = logging.getLogger(__name__)


@dataclass
class MetropolisHastingsState:
    program: ProgramNode
    temperature: float
    annealing_rate: float
    num_steps: int = 0
    current_energy: Optional[float] = None
    current_energy_term_fn_values: Optional[list] = None
    best_energy: Optional[float] = None
    best_energy_term_fn_values: Optional[list] = None
    best_program: Optional[ProgramNode] = None
    best_sequence: Optional[str] = None
    energy_trace: List[float] = field(default_factory=list)


def metropolis_hastings_step(
    state: MetropolisHastingsState,
    folding_callback: FoldingCallback,
    verbose: bool = False,
) -> MetropolisHastingsState:
    temperature = state.temperature * state.annealing_rate

    candidate = deepcopy(state.program)
    candidate.mutate()
    sequence, residue_indices = candidate.get_sequence_and_set_residue_index_ranges()
    folding_output = folding_callback.fold(sequence, residue_indices)

    term_values = [
        (name, weight, fn(folding_output))
        for name, weight, fn in candidate.get_energy_term_functions()
    ]
    candidate_energy = float(sum(w * v for _, w, v in term_values))

    if state.current_energy is None:
        accept = True
    else:
        # minimizing: accept ratio exp((current - candidate)/T)
        diff = -candidate_energy + state.current_energy
        accept_probability = min(1.0, float(np.exp(min(diff / temperature, 50.0))))
        accept = np.random.uniform() < accept_probability

    if accept and verbose:
        logger.info(f"Accepted {sequence} with energy {candidate_energy:.3f}")

    new_best = state.best_energy is None or candidate_energy < state.best_energy

    state = MetropolisHastingsState(
        program=candidate if accept else state.program,
        temperature=temperature,
        annealing_rate=state.annealing_rate,
        num_steps=state.num_steps + 1,
        current_energy=candidate_energy if accept else state.current_energy,
        current_energy_term_fn_values=term_values if accept else state.current_energy_term_fn_values,
        best_energy=candidate_energy if new_best else state.best_energy,
        best_energy_term_fn_values=term_values if new_best else state.best_energy_term_fn_values,
        best_program=deepcopy(candidate) if new_best else state.best_program,
        best_sequence=sequence if new_best else state.best_sequence,
        energy_trace=state.energy_trace + [candidate_energy],
    )
    return state


def run_simulated_annealing(
    program: ProgramNode,
    folding_callback: FoldingCallback,
    initial_temperature: float = 1.0,
    annealing_rate: float = 0.97,
    total_num_steps: int = 10_000,
    display_progress: bool = True,
    progress_every: int = 50,
) -> MetropolisHastingsState:
    """(reference optimize.py:96-158)"""
    state = MetropolisHastingsState(
        program=program,
        temperature=initial_temperature,
        annealing_rate=annealing_rate,
    )
    for step in range(total_num_steps):
        state = metropolis_hastings_step(state, folding_callback)
        if display_progress and (step % progress_every == 0):
            logger.info(
                f"step {step}: T={state.temperature:.4f} "
                f"E_cur={state.current_energy} E_best={state.best_energy}"
            )
    return state
