"""Closest-pair helper on the torus.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/closest_neighbors.py:10)
"""

from typing import Tuple

import numpy as np


def get_closest_relative_coordinates_and_index(
    relative_coordinates: np.ndarray, target: np.ndarray
) -> Tuple[float, int]:
    """Distance (fractional, minimum-image) and index of the closest atom."""
    delta = np.mod(relative_coordinates - target, 1.0)
    delta = np.where(delta > 0.5, delta - 1.0, delta)
    distances = np.linalg.norm(delta, axis=-1)
    index = int(np.argmin(distances))
    return float(distances[index]), index
