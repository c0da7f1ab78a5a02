"""Permutation and point-group helpers for equivariance (tests and models).

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/symmetry_utils.py:15,
 utils/geometric_utils.py:6)
"""

import itertools

import numpy as np

from .lattice_shells import get_cubic_point_group_symmetries  # noqa: F401


def get_all_permutation_indices(number_of_atoms: int):
    """All n! permutations and their inverses, [n!, n] integer arrays.

    Only tractable for small n; used by the permutation-invariant MLP and
    analytical score networks.
    """
    perms = np.array(
        list(itertools.permutations(range(number_of_atoms))), dtype=np.int64
    )
    inverse = np.empty_like(perms)
    rows = np.arange(perms.shape[0])[:, None]
    inverse[rows, perms] = np.arange(number_of_atoms)[None, :]
    return perms, inverse
