"""Geometry: fractional <-> cartesian transforms and unit-cell wrapping.

Pure jnp functions; everything is shape-polymorphic over leading batch axes
and jit/vmap friendly.

Capability parity with the reference's basis transformations
(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/basis_transformations.py),
with the same conventions:
  * basis vectors are stored as rows:  cell[..., i, :] = a_i,
  * cartesian = relative @ cell,
  * lattice parameters are a flat vector [l_1..l_d, angles...] with the
    d(d-1)/2 trailing angles fixed at zero (orthogonal boxes only).
"""

import math

import jax
import jax.numpy as jnp

# Coordinate transforms are physical quantities (Angstroms); keep them in
# full fp32 rather than the backend's default (possibly bf16) matmul path.
_EXACT = jax.lax.Precision.HIGHEST


def get_number_of_lattice_parameters(spatial_dimension: int) -> int:
    """Number of independent lattice parameters: d lengths + d(d-1)/2 angles."""
    return spatial_dimension * (spatial_dimension + 1) // 2


def get_spatial_dimension_from_number_of_lattice_parameters(
    number_of_lattice_parameters: int,
) -> int:
    """Invert d(d+1)/2 to recover the spatial dimension."""
    return int((-1 + math.sqrt(1 + 8 * number_of_lattice_parameters)) / 2)


def get_reciprocal_basis_vectors(basis_vectors: jnp.ndarray) -> jnp.ndarray:
    """Columns b_j with A @ B = I, for row-stacked basis vectors A."""
    return jnp.linalg.inv(basis_vectors)


def get_positions_from_coordinates(
    relative_coordinates: jnp.ndarray, basis_vectors: jnp.ndarray
) -> jnp.ndarray:
    """Cartesian positions p = x @ A for row-stacked basis vectors A.

    Args:
        relative_coordinates: [..., natoms, d]
        basis_vectors: [..., d, d]

    Returns:
        cartesian positions, [..., natoms, d].
    """
    return jnp.matmul(relative_coordinates, basis_vectors, precision=_EXACT)


def get_relative_coordinates_from_cartesian_positions(
    cartesian_positions: jnp.ndarray, reciprocal_basis_vectors: jnp.ndarray
) -> jnp.ndarray:
    """Relative coordinates x = p @ B where B = A^{-1}."""
    return jnp.matmul(cartesian_positions, reciprocal_basis_vectors, precision=_EXACT)


def map_relative_coordinates_to_unit_cell(
    relative_coordinates: jnp.ndarray,
) -> jnp.ndarray:
    """Wrap relative coordinates into [0, 1).

    Floating-point remainders of tiny negative inputs can land exactly on 1.0
    (the same edge case the reference works around, see
    basis_transformations.py:95-119); those are snapped back to 0 so the
    invariant x in [0, 1) holds bitwise.
    """
    wrapped = jnp.remainder(relative_coordinates, 1.0)
    return jnp.where(wrapped >= 1.0, 0.0, wrapped)


def map_axl_composition_to_unit_cell(composition):
    """Wrap the X component of an AXL composition into the unit cell."""
    return composition._replace(
        X=map_relative_coordinates_to_unit_cell(composition.X)
    )


def map_lattice_parameters_to_unit_cell_vectors(
    lattice_parameters: jnp.ndarray,
) -> jnp.ndarray:
    """Lattice parameter vector -> row-stacked cell matrix (diagonal).

    Only orthogonal cells are supported (trailing angle entries are ignored;
    they are zero throughout the pipeline).

    Args:
        lattice_parameters: [..., d(d+1)/2]

    Returns:
        cell matrices, [..., d, d].
    """
    d = get_spatial_dimension_from_number_of_lattice_parameters(
        lattice_parameters.shape[-1]
    )
    lengths = lattice_parameters[..., :d]
    eye = jnp.eye(d, dtype=lattice_parameters.dtype)
    return lengths[..., :, None] * eye


def map_unit_cell_to_lattice_parameters(unit_cell: jnp.ndarray) -> jnp.ndarray:
    """Row-stacked cell matrix -> flat lattice parameter vector.

    The diagonal gives the box lengths; angle entries are set to zero
    (orthogonal cells only).
    """
    d = unit_cell.shape[-1]
    n_params = get_number_of_lattice_parameters(d)
    diag = jnp.diagonal(unit_cell, axis1=-2, axis2=-1)
    pad = n_params - d
    if pad:
        zeros = jnp.zeros(diag.shape[:-1] + (pad,), dtype=diag.dtype)
        return jnp.concatenate([diag, zeros], axis=-1)
    return diag


def map_noisy_lattice_parameters_to_unit_cell_vectors(
    lattice_parameters: jnp.ndarray, min_box_size: float = 4.0
) -> jnp.ndarray:
    """Cell matrix from *noisy* lattice parameters, clipped to a minimum size.

    Noisy lattice parameters can be negative or tiny; clipping keeps the box
    physical before any geometric use (reference:
    basis_transformations.py:230-257 with the same 4 Angstrom default).
    """
    d = get_spatial_dimension_from_number_of_lattice_parameters(
        lattice_parameters.shape[-1]
    )
    clipped = jnp.clip(lattice_parameters, min=min_box_size)
    clipped = clipped.at[..., d:].set(0.0)
    return map_lattice_parameters_to_unit_cell_vectors(clipped)


def image_coverage_nan_guard(
    values: jnp.ndarray,
    box_lengths: jnp.ndarray,
    radial_cutoff: float,
    image_shells: int,
) -> jnp.ndarray:
    """Fail loudly (NaN) when the periodic-image grid cannot cover the cutoff.

    A fixed pair grid over offsets {-s..s}^d reaches displacements of at
    most (s + 1/2) x box per axis (s = 0 is the minimum-image path). If a
    *diffusing* cell shrinks below ``radial_cutoff / (s + 1/2)``, images
    inside the cutoff silently vanish from the graph — wrong physics with
    no error. Cell size is data under jit, so this cannot raise; instead
    samples whose cell fails coverage have ``values`` (a float edge mask or
    distance tensor) replaced by NaN, which propagates to every score and
    loss consuming them. The check costs one scalar compare per sample.

    The reference sidesteps this by clipping the box to >= 2.2 r_max
    (mace_score_network.py:170-175 in /root/reference), silently distorting
    small-cell geometry instead; here geometry stays exact and
    under-coverage is loud (PARITY "Known gaps", closed in round 4).
    """
    coverage = (image_shells + 0.5) * jnp.min(box_lengths, axis=-1)  # [B]
    covered = coverage >= radial_cutoff
    expand = covered.reshape(covered.shape + (1,) * (values.ndim - 1))
    return jnp.where(expand, values, jnp.nan)
