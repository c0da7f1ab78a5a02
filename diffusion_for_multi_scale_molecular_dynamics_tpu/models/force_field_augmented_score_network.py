r"""Force-field-augmented score network (anti-overlap repulsion for sampling).

Wraps any score network and adds a repulsive pseudo-force to the coordinate
score so atoms do not collapse onto each other during generation:

    phi(r) = s (r - r0)^2  for r < r0,
    F_i = sum_{j, images} -dphi/dr * rhat_ij,

converted to fractional coordinates through the reciprocal cell.

TPU-first redesign of the reference wrapper
(src/diffusion_for_multi_scale_molecular_dynamics/models/score_networks/force_field_augmented_score_network.py:19-236):
the reference scatters per-edge contributions from a KeOps COO list; here the
contributions are a dense masked sum over the 3^d-image pair tensor — no
dynamic edge counts, fuses into the sampling scan.
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..namespace import AXL, NOISY_AXL_COMPOSITION
from ..ops.geometry import (
    get_reciprocal_basis_vectors,
    get_relative_coordinates_from_cartesian_positions,
    get_positions_from_coordinates,
    map_noisy_lattice_parameters_to_unit_cell_vectors,
)
from ..ops.neighbors import get_periodic_images


@dataclass(kw_only=True)
class ForceFieldParameters:
    """Repulsive pseudo-force parameters."""

    radial_cutoff: float  # r0, Angstrom
    strength: float  # s


class ForceFieldAugmentedScoreNetwork:
    """Callable wrapper: batch -> AXL with an augmented X score."""

    def __init__(self, score_network, force_field_parameters: ForceFieldParameters):
        """Args:
        score_network: bound callable batch -> AXL (or a flax apply partial).
        force_field_parameters: repulsion parameters.
        """
        self._score_network = score_network
        self._force_field_parameters = force_field_parameters

    def __call__(
        self, batch: Dict[str, Any], conditional: Optional[bool] = None
    ) -> AXL:
        if conditional is None:
            raw_scores = self._score_network(batch)
        else:
            raw_scores = self._score_network(batch, conditional)
        forces = self.get_relative_coordinates_pseudo_force(batch)
        return raw_scores._replace(X=raw_scores.X + forces)

    def get_relative_coordinates_pseudo_force(
        self, batch: Dict[str, Any]
    ) -> jnp.ndarray:
        """Repulsive pseudo-force in fractional coordinates, [b, n, d]."""
        r0 = self._force_field_parameters.radial_cutoff
        s = self._force_field_parameters.strength

        composition = batch[NOISY_AXL_COMPOSITION]
        basis_vectors = map_noisy_lattice_parameters_to_unit_cell_vectors(
            composition.L, min_box_size=1.0
        )
        cartesian_positions = get_positions_from_coordinates(
            composition.X, basis_vectors
        )
        images = get_periodic_images(cartesian_positions, basis_vectors)

        # displacement convention: disp[b, i, j, s] = r_j + shift - r_i; the
        # force on i from j is along (r_i - r_j) = -disp for r < r0.
        r = images.distances
        within = (r < r0) & ~images.self_mask[None]
        prefactor = jnp.where(within, 2.0 * s * (r - r0) / (r + 1.0e-8), 0.0)
        # F_i = sum_{j, s} prefactor * (r_j - r_i) pointing *away* when
        # prefactor < 0 (r < r0) — matches the reference's sign convention
        # (forces accumulate at the edge source with +displacement).
        cartesian_forces = jnp.sum(
            prefactor[..., None] * images.displacements, axis=(2, 3)
        )

        reciprocal = get_reciprocal_basis_vectors(basis_vectors)
        return get_relative_coordinates_from_cartesian_positions(
            cartesian_forces, reciprocal
        )


def wrap_axl_network_with_force_field(
    axl_network, radial_cutoff: float, strength: float
):
    """Add the repulsive pseudo-force while preserving the fast path.

    ``load_axl_network_from_checkpoint`` returns
    ``functools.partial(apply_fn, params)``; the Langevin generator detects
    that exact shape and feeds the parameters to its compiled scan as
    *arguments* (langevin_generator.py). A plain
    ``ForceFieldAugmentedScoreNetwork`` hides the partial and drops the
    generator to the closure path that bakes every weight into the HLO as
    literals (minutes of client-side lowering per compiled variant). The
    pseudo-force is a pure function of the batch, so for a bare partial we
    rebuild a new bare partial whose function applies the force after the
    network; any other callable falls back to the plain wrapper.

    (Promoted from experiments/_ff_partial.py in round 5 so production
    surfaces — e.g. the active-learning sample maker's repaint generator —
    can enable the force field from configuration.)
    """
    import functools

    parameters = ForceFieldParameters(
        radial_cutoff=radial_cutoff, strength=strength
    )
    if (
        isinstance(axl_network, functools.partial)
        and len(axl_network.args) == 1
        and not axl_network.keywords
    ):
        base_apply = axl_network.func
        params = axl_network.args[0]
        force_field = ForceFieldAugmentedScoreNetwork(None, parameters)

        def apply_with_force_field(p, batch):
            raw = base_apply(p, batch)
            forces = force_field.get_relative_coordinates_pseudo_force(batch)
            return raw._replace(X=raw.X + forces)

        return functools.partial(apply_with_force_field, params)
    return ForceFieldAugmentedScoreNetwork(axl_network, parameters)
