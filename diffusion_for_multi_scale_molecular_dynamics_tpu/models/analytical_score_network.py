"""Analytical score networks (exact scores for Gaussian-around-equilibrium data).

If the data distribution is an isotropic Gaussian of width sigma_d around
known equilibrium coordinates, the perturbed distribution is a mixture of
wrapped Gaussians of effective width sqrt(sigma_d^2 + sigma_t^2) and the
score is available in closed form. These "networks" have no parameters; they
are debugging/validation oracles and drive the score-viewer callback.

Two variants, as in the reference:
  * AnalyticalScoreNetwork — optional exact permutation symmetrization by
    softmax-weighting scores from all n! permuted equilibrium images
    (reference: models/score_networks/analytical_score_network.py:32-298);
  * EquivariantAnalyticalScoreNetwork — equivariance via optimal-transport
    alignment to the nearest symmetry image instead of the n! sum
    (reference: equivariant_analytical_score_network.py:22-235).
"""

from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..namespace import AXL, NOISE, NOISY_AXL_COMPOSITION
from ..ops.geometry import map_relative_coordinates_to_unit_cell
from ..ops.lattice_shells import get_cubic_point_group_symmetries
from ..ops.symmetry import get_all_permutation_indices
from ..ops.wrapped_gaussian_score import (
    get_coordinates_sigma_normalized_score,
    get_log_wrapped_gaussians,
)
from ..transport import Transporter
from .score_network import ScoreNetworkConfig


def _validate_equilibrium(config) -> None:
    assert config.sigma_d > 0.0, "the sigma_d parameter should be positive."
    assert len(config.equilibrium_relative_coordinates) == config.number_of_atoms, (
        "There should be exactly one list of equilibrium coordinates per atom."
    )
    for x in config.equilibrium_relative_coordinates:
        assert len(x) == config.spatial_dimension, (
            "Equilibrium coordinates inconsistent with the spatial dimension."
        )


@dataclass(frozen=True, kw_only=True)
class AnalyticalScoreNetworkConfig(ScoreNetworkConfig):
    architecture: str = "analytical"
    number_of_atoms: int
    kmax: int
    equilibrium_relative_coordinates: Tuple[Tuple[float, ...], ...]
    sigma_d: float
    use_permutation_invariance: bool = False

    def __post_init__(self):
        # YAML gives lists; store hashably for jit static-arg friendliness.
        object.__setattr__(
            self,
            "equilibrium_relative_coordinates",
            tuple(tuple(row) for row in self.equilibrium_relative_coordinates),
        )
        _validate_equilibrium(self)


@dataclass(frozen=True, kw_only=True)
class EquivariantAnalyticalScoreNetworkConfig(ScoreNetworkConfig):
    architecture: str = "equivariant_analytical"
    number_of_atoms: int
    kmax: int
    equilibrium_relative_coordinates: Tuple[Tuple[float, ...], ...]
    sigma_d: float
    use_point_group_symmetries: bool = True

    def __post_init__(self):
        object.__setattr__(
            self,
            "equilibrium_relative_coordinates",
            tuple(tuple(row) for row in self.equilibrium_relative_coordinates),
        )
        _validate_equilibrium(self)


def _perfect_atom_logits(batch_size, natoms, num_classes, dtype):
    """Logits of a deterministic single-species prediction (MASK at -inf)."""
    logits = jnp.zeros((batch_size, natoms, num_classes), dtype=dtype)
    return logits.at[..., -1].set(-jnp.inf)


class AnalyticalScoreNetwork(nn.Module):
    """Closed-form score of a wrapped-Gaussian mixture around equilibrium."""

    config: AnalyticalScoreNetworkConfig

    def _all_equilibrium_images(self) -> jnp.ndarray:
        """[n_images, natoms, d]: one image, or all n! permuted images."""
        cfg = self.config
        x0 = np.asarray(cfg.equilibrium_relative_coordinates, dtype=np.float32)
        if cfg.use_permutation_invariance:
            perms, _ = get_all_permutation_indices(cfg.number_of_atoms)
            return jnp.asarray(x0[perms])
        return jnp.asarray(x0[None])

    def get_log_probabilities_and_scores(
        self, relative_coordinates: jnp.ndarray, sigmas_t: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-image log wrapped Gaussians and sigma_t-normalized scores.

        Args:
            relative_coordinates: [batch, natoms, d]
            sigmas_t: same shape.

        Returns:
            log_w: [n_images, batch]; scores: [n_images, batch, natoms, d].
        """
        cfg = self.config
        all_x0 = self._all_equilibrium_images()  # [M, n, d]
        effective_sigmas = jnp.sqrt(cfg.sigma_d**2 + sigmas_t**2)

        def per_image(x0):
            u = map_relative_coordinates_to_unit_cell(relative_coordinates - x0)
            log_w = get_log_wrapped_gaussians(u, effective_sigmas, cfg.kmax)
            s_eff = get_coordinates_sigma_normalized_score(
                u, effective_sigmas, cfg.kmax
            )
            # Renormalize from the effective sigma to the sampling sigma_t.
            return log_w, sigmas_t * s_eff / effective_sigmas

        return jax.vmap(per_image)(all_x0)

    def get_probabilities_and_normalized_scores(
        self, relative_coordinates: jnp.ndarray, sigmas_t: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mixture probability P(x, t) [batch] and score sigma*S [batch, n, d]."""
        log_w, scores = self.get_log_probabilities_and_scores(
            relative_coordinates, sigmas_t
        )
        n_images = log_w.shape[0]
        probabilities = jnp.sum(jnp.exp(log_w), axis=0) / n_images
        weights = jax.nn.softmax(log_w, axis=0)[:, :, None, None]
        return probabilities, jnp.sum(weights * scores, axis=0)

    def __call__(self, batch: Dict[str, Any], conditional: bool = False) -> AXL:
        cfg = self.config
        composition = batch[NOISY_AXL_COMPOSITION]
        x = composition.X
        batch_size, natoms, d = x.shape
        sigmas = jnp.broadcast_to(
            batch[NOISE][:, :, None], (batch_size, natoms, d)
        ).astype(x.dtype)
        _, scores = self.get_probabilities_and_normalized_scores(x, sigmas)
        return AXL(
            A=_perfect_atom_logits(batch_size, natoms, cfg.num_classes, x.dtype),
            X=scores,
            L=jnp.zeros_like(composition.L),
        )


class EquivariantAnalyticalScoreNetwork(nn.Module):
    """Analytical score made equivariant by optimal-transport alignment."""

    config: EquivariantAnalyticalScoreNetworkConfig

    def _transporter(self) -> Transporter:
        cfg = self.config
        if cfg.use_point_group_symmetries:
            ops = get_cubic_point_group_symmetries(cfg.spatial_dimension).astype(
                np.float32
            )
        else:
            ops = np.eye(cfg.spatial_dimension, dtype=np.float32)[None]
        return Transporter(jnp.asarray(ops))

    def get_normalized_scores(
        self, xt: jnp.ndarray, sigmas_t: jnp.ndarray
    ) -> jnp.ndarray:
        cfg = self.config
        transporter = self._transporter()
        effective_sigmas = jnp.sqrt(cfg.sigma_d**2 + sigmas_t**2)

        x_invariant = transporter.get_translation_invariant(xt)
        mu = jnp.broadcast_to(
            jnp.asarray(cfg.equilibrium_relative_coordinates, dtype=xt.dtype)[None],
            xt.shape,
        )
        mu_aligned = transporter.get_optimal_transport(xt, mu)

        u = map_relative_coordinates_to_unit_cell(x_invariant - mu_aligned)
        s_eff = get_coordinates_sigma_normalized_score(u, effective_sigmas, cfg.kmax)
        return sigmas_t * s_eff / effective_sigmas

    def __call__(self, batch: Dict[str, Any], conditional: bool = False) -> AXL:
        cfg = self.config
        composition = batch[NOISY_AXL_COMPOSITION]
        x = composition.X
        batch_size, natoms, d = x.shape
        sigmas = jnp.broadcast_to(
            batch[NOISE][:, :, None], (batch_size, natoms, d)
        ).astype(x.dtype)
        scores = self.get_normalized_scores(x, sigmas)
        return AXL(
            A=_perfect_atom_logits(batch_size, natoms, cfg.num_classes, x.dtype),
            X=scores,
            L=jnp.zeros_like(composition.L),
        )
