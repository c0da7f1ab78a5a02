"""Sampling-trajectory artifact recorder.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/sample_trajectory.py:7)

The Langevin scan returns whole-trajectory arrays (stacked over time steps);
the recorder just keys them with metadata and serializes to a pickle, with
device arrays converted to numpy on write.
"""

import pickle
from collections import defaultdict
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


class SampleTrajectory:
    """Record named entries during sampling; write them to one pickle."""

    def __init__(self):
        self._data: Dict[str, list] = defaultdict(list)

    def reset(self) -> None:
        self._data = defaultdict(list)

    def record(self, key: str, entry: Any) -> None:
        self._data[key].append(entry)

    @property
    def data(self) -> Dict[str, list]:
        return dict(self._data)

    def write_to_pickle(self, path: str) -> None:
        payload = {k: _to_numpy(v) for k, v in self._data.items()}
        with open(path, "wb") as fh:
            pickle.dump(payload, fh)
