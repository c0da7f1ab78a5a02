"""Periodic neighbor analysis with static shapes.

The reference builds dynamic COO edge lists on GPU with pykeops
(src/diffusion_for_multi_scale_molecular_dynamics/utils/neighbors.py:36-246).
Dynamic edge counts are hostile to XLA, so the TPU-native design is different:

  * ``get_periodic_pair_distances`` — dense minimum-image (or full 3^d-image)
    pair distances for a batch, [batch, natoms, natoms(, n_images)]. For the
    system sizes this framework targets (8..216 atoms) the dense O(n^2)
    tensor is small, lives in VMEM, and feeds the MXU-friendly dense message
    passing of the EGNN score network.
  * ``get_fixed_capacity_neighbors`` — per-atom top-K neighbor tables
    (indices, displacement vectors, mask), [batch, natoms, K]. This is the
    static-shape replacement for the COO adjacency used by the
    Stillinger-Weber oracle's triplet sums.

All outputs are masked, never ragged, so every consumer jits cleanly.
"""

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EXACT = jax.lax.Precision.HIGHEST


def get_relative_lattice_shifts(spatial_dimension: int = 3) -> np.ndarray:
    """All 3^d integer shifts with components in {-1, 0, 1} (host-side const)."""
    return np.array(
        list(itertools.product((-1.0, 0.0, 1.0), repeat=spatial_dimension)),
        dtype=np.float32,
    )


class PeriodicImages(NamedTuple):
    """Dense pairwise geometry over periodic images.

    Attributes:
        displacements: r_j + shift - r_i, [batch, natoms, natoms, n_images, d]
        distances: Euclidean norms, [batch, natoms, natoms, n_images]
        self_mask: True where (i == j and shift == 0), [natoms, natoms, n_images]
    """

    displacements: jnp.ndarray
    distances: jnp.ndarray
    self_mask: jnp.ndarray


def get_periodic_images(
    cartesian_positions: jnp.ndarray, basis_vectors: jnp.ndarray
) -> PeriodicImages:
    """Pairwise displacements/distances over one shell of 3^d image cells.

    Args:
        cartesian_positions: [batch, natoms, d]
        basis_vectors: row-stacked cells, [batch, d, d]

    Returns:
        PeriodicImages with dense [batch, n, n, 3^d] geometry.
    """
    batch, natoms, d = cartesian_positions.shape
    shifts = jnp.asarray(
        get_relative_lattice_shifts(d), dtype=cartesian_positions.dtype
    )  # [S, d]
    cart_shifts = jnp.einsum(
        "sd,bde->bse", shifts, basis_vectors, precision=_EXACT
    )  # [batch, S, d]

    # disp[b, i, j, s] = r_j + shift_s - r_i
    disp = (
        cartesian_positions[:, None, :, None, :]
        + cart_shifts[:, None, None, :, :]
        - cartesian_positions[:, :, None, None, :]
    )
    # Zero-distance self pairs would make sqrt's gradient inf, poisoning
    # downstream grads (0 * inf = NaN) even though they are masked; guard the
    # argument so masked lanes have exact-zero gradients.
    r2 = jnp.sum(disp**2, axis=-1)
    nonzero = r2 > 1e-12
    dist = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, r2, 1.0)), 0.0)

    n_images = shifts.shape[0]
    zero_shift = n_images // 2  # shifts are lexicographic; the all-zero one is central
    eye = jnp.eye(natoms, dtype=bool)
    image_is_zero = jnp.arange(n_images) == zero_shift
    self_mask = eye[:, :, None] & image_is_zero[None, None, :]

    return PeriodicImages(displacements=disp, distances=dist, self_mask=self_mask)


def get_min_image_pair_distances(
    cartesian_positions: jnp.ndarray, basis_vectors: jnp.ndarray
) -> jnp.ndarray:
    """Minimum-image pair distances, [batch, natoms, natoms] (inf on diagonal images excluded)."""
    images = get_periodic_images(cartesian_positions, basis_vectors)
    dist = jnp.where(images.self_mask[None], jnp.inf, images.distances)
    return jnp.min(dist, axis=-1)


def get_orthogonal_min_image_displacements(
    relative_coordinates: jnp.ndarray, basis_vectors: jnp.ndarray
) -> jnp.ndarray:
    """Minimum-image displacements r_j - r_i for *orthogonal* cells, O(n^2 d).

    Wrapping each fractional component into [-1/2, 1/2) yields the minimum
    image directly — no 3^d image expansion (and none of its [.., 3^d, d]
    HBM intermediates). Exact whenever the box exceeds twice the interaction
    cutoff, which the EGNN/equivariant edge paths guarantee by clipping the
    cell (the reference's 2.2 x cutoff guard).

    Args:
        relative_coordinates: [batch, natoms, d]
        basis_vectors: diagonal cells, [batch, d, d]

    Returns:
        displacements disp[b, i, j] = min-image (r_j - r_i), [batch, n, n, d].
    """
    delta = (
        relative_coordinates[:, None, :, :] - relative_coordinates[:, :, None, :]
    )
    delta = delta - jnp.round(delta)  # each component into [-1/2, 1/2)
    lengths = jnp.diagonal(basis_vectors, axis1=-2, axis2=-1)  # [batch, d]
    return delta * lengths[:, None, None, :]


class NeighborTable(NamedTuple):
    """Fixed-capacity per-atom neighbor table (static shapes).

    Attributes:
        indices: neighbor atom index j for each slot, [batch, natoms, K]
        displacements: r_j + shift - r_i for each slot, [batch, natoms, K, d]
        distances: |displacement|, [batch, natoms, K]
        mask: slot validity (distance <= cutoff, not self), [batch, natoms, K]
    """

    indices: jnp.ndarray
    displacements: jnp.ndarray
    distances: jnp.ndarray
    mask: jnp.ndarray


def get_fixed_capacity_neighbors(
    cartesian_positions: jnp.ndarray,
    basis_vectors: jnp.ndarray,
    cutoff: float,
    capacity: int,
    atom_mask: jnp.ndarray = None,
) -> NeighborTable:
    """Top-``capacity`` neighbors within ``cutoff`` over one image shell.

    Every (j, image) candidate within the cutoff occupies one slot, so an
    atom seen both directly and through a periodic image contributes twice —
    the same multiplicity semantics as the reference's KeOps edge list.

    Args:
        cartesian_positions: [batch, natoms, d]
        basis_vectors: [batch, d, d]
        cutoff: radial cutoff (static float).
        capacity: K, max neighbors kept per atom (static int).
        atom_mask: optional [batch, natoms] validity of atoms; invalid atoms
            neither have nor are neighbors.

    Returns:
        NeighborTable with [batch, natoms, K] slots, mask False on padding.
    """
    batch, natoms, d = cartesian_positions.shape
    images = get_periodic_images(cartesian_positions, basis_vectors)
    n_images = images.distances.shape[-1]

    dist = jnp.where(images.self_mask[None], jnp.inf, images.distances)
    if atom_mask is not None:
        pair_valid = atom_mask[:, :, None] & atom_mask[:, None, :]
        dist = jnp.where(pair_valid[..., None], dist, jnp.inf)

    # Flatten (j, image) candidates and keep the K closest per atom.
    flat_dist = dist.reshape(batch, natoms, natoms * n_images)
    neg_top, flat_idx = jax.lax.top_k(-flat_dist, capacity)
    top_dist = -neg_top

    j_idx = flat_idx // n_images
    flat_disp = images.displacements.reshape(batch, natoms, natoms * n_images, d)
    top_disp = jnp.take_along_axis(flat_disp, flat_idx[..., None], axis=2)

    mask = top_dist <= cutoff
    return NeighborTable(
        indices=j_idx, displacements=top_disp, distances=top_dist, mask=mask
    )


def compute_distances_in_batch(
    cartesian_positions: jnp.ndarray,
    basis_vectors: jnp.ndarray,
    max_distance: float,
) -> jnp.ndarray:
    """All pair distances below ``max_distance``, masked with +inf elsewhere.

    Dense replacement for the reference's KeOps pair-distance helper used by
    the structure-factor KS metric (utils/structure_utils.py:41): consumers
    histogram/ sort the finite entries host-side.

    Returns:
        [batch, natoms * natoms * n_images] distances, +inf outside the
        cutoff or on self-pairs (i == j in the home cell). Each unordered
        pair appears twice, matching the reference's directed-edge counting.
    """
    batch = cartesian_positions.shape[0]
    images = get_periodic_images(cartesian_positions, basis_vectors)
    dist = jnp.where(images.self_mask[None], jnp.inf, images.distances)
    dist = jnp.where(dist <= max_distance, dist, jnp.inf)
    return dist.reshape(batch, -1)


def get_shortest_distance_that_crosses_unit_cell(
    basis_vectors: jnp.ndarray,
) -> jnp.ndarray:
    """Shortest distance across the cell: volume / max face area.

    A single image shell is geometrically sufficient only for cutoffs below
    this distance (reference: utils/neighbors.py:248).
    """
    if basis_vectors.shape[-1] == 3:
        a, b, c = (
            basis_vectors[..., 0, :],
            basis_vectors[..., 1, :],
            basis_vectors[..., 2, :],
        )
        cross_ab = jnp.cross(a, b)
        cross_bc = jnp.cross(b, c)
        cross_ca = jnp.cross(c, a)
        volume = jnp.abs(jnp.sum(cross_ab * c, axis=-1))
        max_area = jnp.maximum(
            jnp.linalg.norm(cross_ab, axis=-1),
            jnp.maximum(
                jnp.linalg.norm(cross_bc, axis=-1),
                jnp.linalg.norm(cross_ca, axis=-1),
            ),
        )
        return volume / max_area
    if basis_vectors.shape[-1] == 2:
        a, b = basis_vectors[..., 0, :], basis_vectors[..., 1, :]
        area = jnp.abs(a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0])
        max_len = jnp.maximum(
            jnp.linalg.norm(a, axis=-1), jnp.linalg.norm(b, axis=-1)
        )
        return area / max_len
    return jnp.abs(basis_vectors[..., 0, 0])
