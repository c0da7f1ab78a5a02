"""MaxVol row selection: pick the most informative rows of a tall matrix.

Used by the ACE active-learning path to choose training structures whose
basis-projection rows maximize the submatrix volume (extrapolation grade).

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/maxvol.py:13)
"""

from typing import Tuple

import numpy as np


def maxvol(
    matrix: np.ndarray, tolerance: float = 1.05, max_iterations: int = 100
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy MaxVol: indices of n rows of an (m >= n) x n matrix maximizing |det|.

    Args:
        matrix: [m, n] with m >= n, full column rank.
        tolerance: swap until every coefficient is below this (>= 1).
        max_iterations: hard cap on swap iterations.

    Returns:
        (row_indices [n], coefficients [m, n]) with
        matrix = coefficients @ matrix[row_indices].
    """
    m, n = matrix.shape
    assert m >= n, "maxvol needs a tall (or square) matrix"
    assert tolerance >= 1.0

    # Greedy orthogonal pivoting start: repeatedly take the row with the
    # largest residual norm, then project it out.
    selected = []
    residual = matrix.copy().astype(np.float64)
    for _ in range(n):
        norms = np.linalg.norm(residual, axis=1)
        pick = int(np.argmax(norms))
        selected.append(pick)
        v = residual[pick] / (norms[pick] ** 2 + 1e-300)
        residual = residual - np.outer(residual @ residual[pick], v)
    indices = np.asarray(selected)

    coefficients = matrix @ np.linalg.pinv(matrix[indices])
    for _ in range(max_iterations):
        flat = np.argmax(np.abs(coefficients))
        i, j = np.unravel_index(flat, coefficients.shape)
        if np.abs(coefficients[i, j]) <= tolerance:
            break
        # Swap row j of the selection for row i.
        indices[j] = i
        coefficients = matrix @ np.linalg.pinv(matrix[indices])
    return indices, coefficients


def get_extrapolation_grades(matrix: np.ndarray, active_set: np.ndarray) -> np.ndarray:
    """Extrapolation grade gamma of each row w.r.t. an active set.

    gamma > 1 marks rows outside the span of the active set's convex
    envelope — the MaxVol uncertainty measure used by MTP/ACE.
    """
    coefficients = matrix @ np.linalg.pinv(active_set)
    return np.max(np.abs(coefficients), axis=1)
