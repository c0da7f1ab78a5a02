"""Score-network interface: configs, batch validation, output conventions.

A score network maps an augmented batch (noisy AXL composition + time +
sigma (+ forces)) to an AXL of model outputs with the convention

    output.A = logits of p(a_0 | a_t)        [batch, natoms, num_classes]
    output.X = sigma * score(x_t, t)          [batch, natoms, d]
    output.L = sigma_n * score(l_t, t)        [batch, n_lattice_params]

and the MASK class logit forced to -inf (a real atom type must be predicted;
reference: src/diffusion_for_multi_scale_molecular_dynamics/models/score_networks/score_network.py:183).

TPU-first design: networks are flax.linen modules whose ``__call__`` is a
pure function of (params, batch); the ``conditional`` flag is a *static*
argument so both guidance branches compile once each. Batch validation is a
host-side helper used by eager callers/tests — asserts don't belong inside
jit.
"""

from dataclasses import dataclass, field
from typing import Any, Dict

import jax.numpy as jnp

from ..namespace import (
    AXL,
    CARTESIAN_FORCES,
    NOISE,
    NOISY_AXL_COMPOSITION,
    TIME,
)
from ..ops.geometry import get_number_of_lattice_parameters


@dataclass(frozen=True, kw_only=True)
class ScoreNetworkConfig:
    """Base hyperparameters shared by all score networks.

    (reference: score_network.py:26-45)
    """

    architecture: str
    num_atom_types: int
    spatial_dimension: int = 3
    # Probability of a conditional (force-guided) forward during training.
    conditional_prob: float = 0.0
    # Classifier-free-guidance weight gamma (MatterGen eq. B45).
    conditional_gamma: float = 2.0

    @property
    def num_classes(self) -> int:
        return self.num_atom_types + 1  # + MASK

    @property
    def num_lattice_parameters(self) -> int:
        return get_number_of_lattice_parameters(self.spatial_dimension)


def impose_non_mask_atomic_type_prediction(output: AXL) -> AXL:
    """Force the MASK logit to -inf so p(a_0 = MASK) = 0."""
    masked_logits = output.A.at[..., -1].set(-jnp.inf)
    return output._replace(A=masked_logits)


def broadcast_per_graph_scalar_to_nodes(x: jnp.ndarray, natoms: int) -> jnp.ndarray:
    """[batch, 1] -> [batch, natoms, 1]."""
    return jnp.broadcast_to(x[:, None, :], (x.shape[0], natoms, x.shape[-1]))


def guided_forward(apply_fn, batch: Dict[str, Any], conditional_gamma: float) -> AXL:
    """Classifier-free-guidance mixing of conditional/unconditional forwards.

    out = gamma * f(cond) + (1 - gamma) * f(uncond)
    """
    cond = apply_fn(batch, True)
    uncond = apply_fn(batch, False)
    g = conditional_gamma
    return AXL(
        A=g * cond.A + (1.0 - g) * uncond.A,
        X=g * cond.X + (1.0 - g) * uncond.X,
        L=g * cond.L + (1.0 - g) * uncond.L,
    )


def validate_score_network_batch(
    batch: Dict[str, Any], config: ScoreNetworkConfig
) -> None:
    """Host-side structural/range checks of an augmented batch.

    Mirrors the invariants the reference asserts on every forward
    (score_network.py:68-181); here they run eagerly in tests and CLI entry
    points, never inside compiled steps.
    """
    assert NOISY_AXL_COMPOSITION in batch, (
        f"batch must contain '{NOISY_AXL_COMPOSITION}'"
    )
    composition = batch[NOISY_AXL_COMPOSITION]

    x = composition.X
    assert x.ndim == 3 and x.shape[2] == config.spatial_dimension, (
        "relative coordinates must be [batch, natoms, spatial_dimension]"
    )
    batch_size = x.shape[0]
    assert ((x >= 0.0) & (x < 1.0)).all(), "relative coordinates must be in [0, 1)"

    assert TIME in batch, f"batch must contain '{TIME}'"
    times = batch[TIME]
    assert times.shape == (batch_size, 1), "times must be [batch, 1]"
    assert ((times >= 0.0) & (times <= 1.0)).all(), "times must be in [0, 1]"

    assert NOISE in batch, f"batch must contain '{NOISE}'"
    assert batch[NOISE].shape == times.shape, "sigma must have the time shape"

    lattice = composition.L
    assert lattice.shape == (batch_size, config.num_lattice_parameters), (
        "lattice parameters must be [batch, d(d+1)/2]"
    )

    atom_types = composition.A
    assert atom_types.shape == (batch_size, x.shape[1]), (
        "atom types must be [batch, natoms]"
    )
    assert ((atom_types >= 0) & (atom_types < config.num_classes)).all(), (
        f"atom types must be in [0, {config.num_atom_types}]"
    )

    if config.conditional_prob > 0:
        assert CARTESIAN_FORCES in batch, (
            f"batch must contain '{CARTESIAN_FORCES}' for conditional networks"
        )
        forces = batch[CARTESIAN_FORCES]
        assert forces.ndim == 3 and forces.shape[2] == config.spatial_dimension
