"""Atom selectors: pick the "problematic" atoms from per-atom uncertainties.

(reference: active_learning_loop/atom_selector/{base_atom_selector,
threshold_atom_selector,top_k_atom_selector,atom_selector_factory}.py)
"""

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Dict

import numpy as np


@dataclass(kw_only=True)
class BaseAtomSelectorArguments:
    """Configuration of an atom selector."""

    algorithm: str


class BaseAtomSelector(ABC):
    """Selects central atoms for excision from per-atom uncertainties."""

    def __init__(self, atom_selector_arguments: BaseAtomSelectorArguments):
        self.arguments = atom_selector_arguments

    @abstractmethod
    def select_central_atoms(self, uncertainty_per_atom: np.ndarray) -> np.ndarray:
        """Indices of selected atoms, sorted by decreasing uncertainty."""


@dataclass(kw_only=True)
class ThresholdAtomSelectorArguments(BaseAtomSelectorArguments):
    algorithm: str = "threshold"
    uncertainty_threshold: float


class ThresholdAtomSelector(BaseAtomSelector):
    """All atoms with uncertainty above a threshold (most uncertain first)."""

    def select_central_atoms(self, uncertainty_per_atom: np.ndarray) -> np.ndarray:
        uncertainty_per_atom = np.asarray(uncertainty_per_atom)
        above = np.where(
            uncertainty_per_atom > self.arguments.uncertainty_threshold
        )[0]
        order = np.argsort(uncertainty_per_atom[above])[::-1]
        return above[order]


@dataclass(kw_only=True)
class TopKAtomSelectorArguments(BaseAtomSelectorArguments):
    algorithm: str = "top_k"
    top_k_environment: int


class TopKAtomSelector(BaseAtomSelector):
    """The k most uncertain atoms (most uncertain first)."""

    def select_central_atoms(self, uncertainty_per_atom: np.ndarray) -> np.ndarray:
        uncertainty_per_atom = np.asarray(uncertainty_per_atom)
        k = min(self.arguments.top_k_environment, len(uncertainty_per_atom))
        return np.argsort(uncertainty_per_atom)[::-1][:k]


_SELECTOR_ARGUMENTS = {
    "threshold": ThresholdAtomSelectorArguments,
    "top_k": TopKAtomSelectorArguments,
}
_SELECTORS = {
    "threshold": ThresholdAtomSelector,
    "top_k": TopKAtomSelector,
}


def create_atom_selector_arguments(config: Dict[str, Any]) -> BaseAtomSelectorArguments:
    cfg = dict(config)
    algorithm = cfg.pop("algorithm")
    assert algorithm in _SELECTOR_ARGUMENTS, f"unknown atom selector '{algorithm}'"
    return _SELECTOR_ARGUMENTS[algorithm](**cfg)


def create_atom_selector(arguments: BaseAtomSelectorArguments) -> BaseAtomSelector:
    return _SELECTORS[arguments.algorithm](arguments)
