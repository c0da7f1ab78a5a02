"""Namespace: shared string keys and the AXL state container.

The generative state of a periodic crystal is an AXL triple:
  * A — atom types (discrete classes, diffused with D3PM; the last class is MASK),
  * X — relative (fractional) coordinates on the torus [0, 1)^d,
  * L — lattice parameters, a flat vector of d box lengths followed by
        d(d-1)/2 angles (angles are fixed to zero in the current model).

Batches move through the framework as plain dicts keyed by the string
constants below, so that every subsystem agrees on names.

Capability parity with the reference implementation's namespace module
(reference: src/diffusion_for_multi_scale_molecular_dynamics/namespace.py:16-45),
re-designed for JAX: ``AXL`` is a NamedTuple and therefore automatically a
JAX pytree, so entire compositions flow through ``jit``/``vmap``/``lax.scan``
and ``jax.sharding`` without adapters.
"""

from typing import Any, NamedTuple


class AXL(NamedTuple):
    """Atom types / relative coordinates (X) / Lattice parameters triple.

    Being a NamedTuple, AXL is a JAX pytree: jit, vmap, scan, grad and
    sharding all traverse it natively.
    """

    A: Any
    X: Any
    L: Any


CARTESIAN_POSITIONS = "cartesian_positions"
RELATIVE_COORDINATES = "relative_coordinates"
CARTESIAN_FORCES = "cartesian_forces"

NOISY_RELATIVE_COORDINATES = "noisy_relative_coordinates"
NOISY_CARTESIAN_POSITIONS = "noisy_cartesian_positions"

TIME = "time"
NOISE = "noise_parameter"  # sigma(t), the exploding-variance scale
UNIT_CELL = "unit_cell"

ATOM_TYPES = "atom_types"
NOISY_ATOM_TYPES = "noisy_atom_types"

LATTICE_PARAMETERS = "lattice_parameters"
NOISY_LATTICE_PARAMETERS = "noisy_lattice_parameters"

AXL_NAME_DICT = {"A": ATOM_TYPES, "X": RELATIVE_COORDINATES, "L": LATTICE_PARAMETERS}

NOISY_AXL_COMPOSITION = "noisy_axl"
AXL_COMPOSITION = "original_axl"

TIME_INDICES = "time_indices"

Q_MATRICES = "q_matrices"
Q_BAR_MATRICES = "q_bar_matrices"
Q_BAR_TM1_MATRICES = "q_bar_tm1_matrices"

# Mask of valid (non-padding) atoms, shape [batch, natoms]; an upgrade over the
# reference's NaN padding, required for static-shape TPU batches.
ATOM_MASK = "atom_mask"
