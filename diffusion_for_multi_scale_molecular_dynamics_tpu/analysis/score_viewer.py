"""Score viewer: predicted vs analytical scores along 1D paths.

Draws an 8-pane figure (one pane per diffusion time) of the score projected
on the tangent of a straight path through configuration space, comparing the
trained network against the analytical (Gaussian-around-equilibrium) score
and the naive single-Gaussian baseline. Visual inspection of these curves is
the fastest way to see where a score model is wrong.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/analysis/score_viewer.py:30-388)
"""

from dataclasses import dataclass, field
from typing import Callable, List

import jax.numpy as jnp
import numpy as np

from ..models.analytical_score_network import (
    AnalyticalScoreNetwork,
    AnalyticalScoreNetworkConfig,
)
from ..namespace import AXL, CARTESIAN_FORCES, NOISE, NOISY_AXL_COMPOSITION, TIME
from ..noise_schedulers.sigma_calculator import get_sigma_functions
from ..ops.geometry import (
    get_number_of_lattice_parameters,
    map_relative_coordinates_to_unit_cell,
)

VIEWER_TIMES = np.array([0.0, 0.1, 0.2, 0.3, 0.4, 0.8, 0.9, 1.0])


@dataclass(kw_only=True)
class ScoreViewerParameters:
    """Configuration of the score viewer."""

    sigma_min: float
    sigma_max: float
    schedule_type: str = "exponential"
    number_of_space_steps: int = 100
    cell_dimensions: List[float] = field(default_factory=lambda: [1.0])
    # [natoms, d] endpoints of the 1D path through configuration space.
    starting_relative_coordinates: List[List[float]] = None
    ending_relative_coordinates: List[List[float]] = None


class ScoreViewer:
    """Builds the 8-pane projected-score comparison figure."""

    def __init__(
        self,
        score_viewer_parameters: ScoreViewerParameters,
        analytical_score_network_config: AnalyticalScoreNetworkConfig,
    ):
        p = score_viewer_parameters
        self.parameters = p
        sigma_fn, _, _ = get_sigma_functions(
            p.schedule_type, p.sigma_min, p.sigma_max
        )
        self.times = VIEWER_TIMES
        self.sigmas = np.asarray(sigma_fn(jnp.asarray(self.times)))

        self.analytical_score_network = AnalyticalScoreNetwork(
            analytical_score_network_config
        )
        self.natoms = analytical_score_network_config.number_of_atoms
        self.spatial_dimension = analytical_score_network_config.spatial_dimension

        start = np.asarray(p.starting_relative_coordinates, dtype=np.float32)
        end = np.asarray(p.ending_relative_coordinates, dtype=np.float32)
        direction = (end - start) / (p.number_of_space_steps + 1)
        steps = np.arange(1, p.number_of_space_steps + 1)
        coordinates = start[None] + steps[:, None, None] * direction[None]
        self.relative_coordinates = jnp.asarray(
            np.mod(coordinates, 1.0), dtype=jnp.float32
        )
        self.displacements = steps * np.linalg.norm(direction)
        flat_direction = (end - start).ravel()
        self.direction_vector = jnp.asarray(
            flat_direction / np.linalg.norm(flat_direction)
        )

        self.projected_analytical_scores = self._compute_projected_scores(
            lambda batch: self.analytical_score_network.apply({}, batch, False)
        )

    def _get_batch(self, time: float, sigma: float):
        n_points = self.relative_coordinates.shape[0]
        n_lattice = get_number_of_lattice_parameters(self.spatial_dimension)
        cell = np.asarray(self.parameters.cell_dimensions, dtype=np.float32)
        if cell.size == 1:
            cell = np.full(self.spatial_dimension, float(cell.ravel()[0]))
        lattice = np.zeros((n_points, n_lattice), dtype=np.float32)
        lattice[:, : self.spatial_dimension] = cell
        return {
            NOISY_AXL_COMPOSITION: AXL(
                A=jnp.zeros((n_points, self.natoms), jnp.int32),
                X=self.relative_coordinates,
                L=jnp.asarray(lattice),
            ),
            TIME: jnp.full((n_points, 1), time, jnp.float32),
            NOISE: jnp.full((n_points, 1), sigma, jnp.float32),
            CARTESIAN_FORCES: jnp.zeros_like(self.relative_coordinates),
        }

    def _compute_projected_scores(self, score_fn: Callable) -> np.ndarray:
        """[len(times), n_points] projections of sigma-normalized scores."""
        projections = []
        for time, sigma in zip(self.times, self.sigmas):
            batch = self._get_batch(float(time), float(sigma))
            scores = score_fn(batch).X.reshape(len(self.displacements), -1)
            projections.append(np.asarray(scores @ self.direction_vector))
        return np.stack(projections)

    def create_figure(self, score_fn: Callable):
        """The 8-pane comparison figure for the provided (bound) score network."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        projected_model_scores = self._compute_projected_scores(score_fn)

        fig, axes = plt.subplots(2, 4, figsize=(16, 7), sharex=True)
        for pane, (time, sigma) in enumerate(zip(self.times, self.sigmas)):
            ax = axes.flat[pane]
            ax.plot(
                self.displacements,
                self.projected_analytical_scores[pane],
                color="black",
                lw=1.5,
                label="analytical",
            )
            ax.plot(
                self.displacements,
                projected_model_scores[pane],
                color="red",
                lw=1.0,
                label="model",
            )
            ax.set_title(f"t = {time:.2f}, $\\sigma$ = {sigma:.3g}")
            if pane == 0:
                ax.legend(fontsize=8)
            if pane >= 4:
                ax.set_xlabel("displacement")
            if pane % 4 == 0:
                ax.set_ylabel("projected $\\sigma \\times$ score")
        fig.tight_layout()
        return fig
