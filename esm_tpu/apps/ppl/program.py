"""Program tree for compositional protein design.

Reference semantics: examples/protein-programming-language/language/program.py —
nested ProgramNodes with per-node energy terms, multimer chain breaks via a
+1000 residue-index skip.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Tuple

import numpy as np

from .sequence import SequenceSegmentFactory

MULTIMER_RESIDUE_INDEX_SKIP_LENGTH: int = 1000


class ProgramNode:
    def __init__(
        self,
        children: Optional[List["ProgramNode"]] = None,
        sequence_segment: Optional[SequenceSegmentFactory] = None,
        children_are_different_chains: bool = False,
        energy_function_terms: Optional[List] = None,
        energy_function_weights: Optional[List[float]] = None,
    ) -> None:
        self.children = children
        self.sequence_segment = sequence_segment
        self.children_are_different_chains = children_are_different_chains
        self.energy_function_terms = energy_function_terms or []
        self.energy_function_weights = energy_function_weights or [
            1.0 for _ in self.energy_function_terms
        ]
        assert len(self.energy_function_terms) == len(self.energy_function_weights)
        self.residue_index_range: Optional[Tuple[int, int]] = None

    def is_leaf_node(self) -> bool:
        return self.children is None

    def get_children(self):
        return self.children

    def get_sequence_and_set_residue_index_ranges(
        self, residue_index_offset: int = 1
    ) -> Tuple[str, List[int]]:
        if self.is_leaf_node():
            sequence = self.sequence_segment.get()
            self.residue_index_range = (
                residue_index_offset,
                residue_index_offset + len(sequence),
            )
            return sequence, list(range(*self.residue_index_range))

        offset = residue_index_offset
        sequence = ""
        residue_indices: List[int] = []
        for child in self.children:
            seg, idxs = child.get_sequence_and_set_residue_index_ranges(offset)
            sequence += seg
            residue_indices += idxs
            offset = residue_indices[-1] + 1
            if self.children_are_different_chains:
                offset += MULTIMER_RESIDUE_INDEX_SKIP_LENGTH
        self.residue_index_range = (residue_indices[0], residue_indices[-1] + 1)
        return sequence, residue_indices

    def get_residue_index_range(self) -> Tuple[int, int]:
        assert self.residue_index_range is not None
        return self.residue_index_range

    def get_energy_term_functions(self, name_prefix: str = ""):
        name_prefix = name_prefix or "root"
        terms = [
            (f"{name_prefix}:{type(term).__name__}", weight, partial(term.compute, self))
            for weight, term in zip(
                self.energy_function_weights, self.energy_function_terms
            )
        ]
        if self.is_leaf_node():
            return terms
        for i, child in enumerate(self.children):
            terms += child.get_energy_term_functions(f"{name_prefix}.n{i+1}")
        return terms

    def mutate(self) -> None:
        if self.is_leaf_node():
            return self.sequence_segment.mutate()
        weights = np.array(
            [float(c.num_mutation_candidates()) for c in self.children]
        )
        assert weights.sum() > 0
        child = np.random.choice(self.children, p=weights / weights.sum())
        child.mutate()

    def num_mutation_candidates(self) -> int:
        if self.is_leaf_node():
            return self.sequence_segment.num_mutation_candidates()
        return sum(c.num_mutation_candidates() for c in self.children)
