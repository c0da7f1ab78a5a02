"""Integer reciprocal-lattice (Bloch) vector shells for the cubic point group.

Host-side numpy: these are tiny static constants baked into the model, not
device computation.

Capability parity with the reference's lattice utilities
(src/diffusion_for_multi_scale_molecular_dynamics/utils/lattice_utils.py:66-177):
complete symmetry orbits of integer vectors sorted by length (degenerate-norm
orbits included together), halved under inversion so that {exp(iKr)} can be
represented by real (cos, sin) pairs. Representative/sign conventions differ
from the reference; the EGNN score projection is invariant to them as long as
uplift and projection share the same K list.
"""

import itertools
from functools import lru_cache
from typing import List

import numpy as np


@lru_cache(maxsize=None)
def get_cubic_point_group_symmetries(spatial_dimension: int = 3) -> np.ndarray:
    """All signed permutation matrices (the full cubic/hyper-octahedral group).

    48 elements in 3D, 8 in 2D, 2 in 1D.
    """
    mats = []
    for perm in itertools.permutations(range(spatial_dimension)):
        for signs in itertools.product((-1, 1), repeat=spatial_dimension):
            m = np.zeros((spatial_dimension, spatial_dimension), dtype=np.int64)
            for row, (col, s) in enumerate(zip(perm, signs)):
                m[row, col] = s
            mats.append(m)
    return np.stack(mats)


def get_complete_lattice_shells(
    number_of_complete_shells: int, spatial_dimension: int = 3
) -> List[np.ndarray]:
    """Symmetry orbits of integer lattice vectors, sorted by squared norm.

    Orbits sharing the squared norm of the last requested shell are all
    included, so the returned set is closed under the point group and has no
    "torn" degeneracies.
    """
    symmetries = get_cubic_point_group_symmetries(spatial_dimension)
    m = 2 * number_of_complete_shells
    candidates = np.array(
        [
            v
            for v in itertools.product(range(-m, m + 1), repeat=spatial_dimension)
            if any(v)
        ],
        dtype=np.int64,
    )
    order = np.argsort((candidates**2).sum(-1), kind="stable")
    candidates = candidates[order]

    seen = set()
    shells: List[np.ndarray] = []
    last_included_norm = None
    for vec in candidates:
        key = tuple(vec)
        if key in seen:
            continue
        norm_sq = int((vec**2).sum())
        if len(shells) >= number_of_complete_shells and norm_sq != last_included_norm:
            break
        orbit = {tuple(s @ vec) for s in symmetries}
        seen.update(orbit)
        shells.append(np.array(sorted(orbit), dtype=np.int64))
        last_included_norm = norm_sq
    return shells


def get_positive_bloch_wave_vectors(
    number_of_complete_shells: int, spatial_dimension: int = 3
) -> np.ndarray:
    """One representative per {K, -K} pair over the requested shells.

    With inversion symmetry, {exp(iKr), exp(-iKr)} reduces to real
    {cos(Kr), sin(Kr)}; keeping a single signed representative per pair
    fixes the basis of the uplifted Euclidean space.

    Returns:
        integer array [n_bloch, spatial_dimension].
    """
    halves = []
    for shell in get_complete_lattice_shells(
        number_of_complete_shells, spatial_dimension
    ):
        kept = []
        seen = set()
        for vec in shell:
            key = tuple(vec)
            if key in seen:
                continue
            seen.add(key)
            seen.add(tuple(-vec))
            kept.append(vec)
        halves.append(np.array(kept, dtype=np.int64))
    return np.concatenate(halves, axis=0)
