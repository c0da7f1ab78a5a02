"""Tests of the generic training step (training/diffusion_model.py).

Translation of the reference's lightning-model tests
(tests/models/test_axl_diffusion_lightning_model.py): the target scores the
step produces are re-derived with independent implementations (brute-force
wrapped Gaussian for X, the closed form for L), the weighted loss is
recomputed from the unreduced pieces including padded-atom masking, and
padding content cannot leak into the loss.
"""

from dataclasses import dataclass, field

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.loss.loss_parameters import (
    create_loss_parameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.models.mlp_score_network import (
    MLPScoreNetwork,
    MLPScoreNetworkConfig,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    ATOM_MASK,
    ATOM_TYPES,
    AXL_COMPOSITION,
    LATTICE_PARAMETERS,
    NOISY_AXL_COMPOSITION,
    RELATIVE_COORDINATES,
    TIME_INDICES,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.gaussian_score import (
    scale_sigma_by_number_of_atoms,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.geometry import (
    map_relative_coordinates_to_unit_cell,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.wrapped_gaussian_score import (
    get_sigma_normalized_score_brute_force,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.training.diffusion_model import (
    AXLDiffusionConfig,
    make_generic_step,
)

BATCH, NATOMS, D = 4, 3, 3
KMAX = 4


@pytest.fixture(scope="module")
def setup():
    network_config = MLPScoreNetworkConfig(
        architecture="mlp",
        num_atom_types=1,
        number_of_atoms=NATOMS,
        n_hidden_dimensions=2,
        hidden_dimensions_size=16,
        noise_embedding_dimensions_size=4,
        relative_coordinates_embedding_dimensions_size=8,
        time_embedding_dimensions_size=4,
        atom_type_embedding_dimensions_size=4,
        lattice_parameters_embedding_dimensions_size=4,
    )
    loss_parameters = create_loss_parameters(
        {
            "loss": {
                "coordinates": {"algorithm": "mse", "lambda_weight": 1.0},
                "atom_types": {"algorithm": "d3pm", "lambda_weight": 0.5,
                               "ce_weight": 0.1},
                "lattice_parameters": {"algorithm": "mse",
                                       "lambda_weight": 0.25},
            }
        }
    )
    config = AXLDiffusionConfig(
        score_network_config=network_config,
        loss_parameters=loss_parameters,
        noise_parameters=NoiseParameters(
            total_time_steps=10, sigma_min=0.01, sigma_max=0.3
        ),
        kmax_target_score=KMAX,
        use_fixed_lattice_parameters=False,
    )
    network = MLPScoreNetwork(network_config)

    rng = np.random.default_rng(123)
    batch = {
        RELATIVE_COORDINATES: jnp.asarray(
            rng.uniform(0, 1, (BATCH, NATOMS, D)), dtype=jnp.float32
        ),
        ATOM_TYPES: jnp.zeros((BATCH, NATOMS), dtype=jnp.int32),
        LATTICE_PARAMETERS: jnp.asarray(
            np.concatenate(
                [rng.uniform(5, 6, (BATCH, D)), np.zeros((BATCH, D))], axis=-1
            ),
            dtype=jnp.float32,
        ),
    }
    generic_step = make_generic_step(network, config)
    init_key = jax.random.PRNGKey(0)
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL,
        NOISE,
        TIME,
    )

    init_batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=batch[ATOM_TYPES],
            X=batch[RELATIVE_COORDINATES],
            L=batch[LATTICE_PARAMETERS],
        ),
        TIME: jnp.full((BATCH, 1), 0.5),
        NOISE: jnp.full((BATCH, 1), 0.1),
    }
    params = network.init(init_key, init_batch, False)
    loss, aux = generic_step(params, batch, jax.random.PRNGKey(7))
    return config, batch, loss, aux


class TestGenericStepTargets:
    def test_coordinates_target_is_brute_force_wrapped_gaussian(self, setup):
        """aux target X == sigma-normalized score of u = wrap(xt - x0) via the
        float64 brute-force sum (reference _get_coordinates_target:383-412)."""
        _, _, _, aux = setup
        x0 = np.asarray(aux[AXL_COMPOSITION].X)
        xt = np.asarray(aux[NOISY_AXL_COMPOSITION].X)
        sigmas = np.asarray(aux["sigmas"])
        u = np.asarray(
            map_relative_coordinates_to_unit_cell(jnp.asarray(xt - x0))
        )
        expected = np.asarray(
            get_sigma_normalized_score_brute_force(
                jnp.asarray(u.ravel()),
                jnp.asarray(sigmas.ravel()),
                kmax=KMAX,
            )
        ).reshape(u.shape)
        computed = np.asarray(
            aux["target_coordinates_normalized_conditional_scores"]
        )
        np.testing.assert_allclose(computed, expected, rtol=2e-3, atol=2e-4)

    def test_lattice_target_closed_form(self, setup):
        """target L == -(lt - l0) / sigma_n with sigma_n = sigma / n^(1/d)."""
        _, _, _, aux = setup
        l0 = np.asarray(aux[AXL_COMPOSITION].L)
        lt = np.asarray(aux[NOISY_AXL_COMPOSITION].L)
        sigmas_l = np.asarray(aux["sigmas"])[:, 0, :]  # [B, d] slice
        sigma_full = np.concatenate(
            [sigmas_l, sigmas_l], axis=-1
        )  # lattice params are d(d+1)/2 = 6 wide
        sigma_n = np.asarray(
            scale_sigma_by_number_of_atoms(
                jnp.asarray(sigma_full), NATOMS, D
            )
        )
        expected = -(lt - l0) / sigma_n
        computed = np.asarray(
            aux["target_lattice_normalized_conditional_scores"]
        )
        np.testing.assert_allclose(computed, expected, rtol=1e-4, atol=1e-5)

    def test_weighted_loss_composition(self, setup):
        """loss == mean over samples of the lambda-weighted per-modality
        means, recomputed from the unreduced losses."""
        config, _, loss, aux = setup
        unreduced = aux["unreduced_loss"]
        mean_x = np.asarray(unreduced.X).mean(axis=(1, 2))
        mean_a = np.asarray(unreduced.A).mean(axis=(1, 2))
        mean_l = np.asarray(unreduced.L).mean(axis=-1)
        expected = np.mean(1.0 * mean_x + 0.5 * mean_a + 0.25 * mean_l)
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
        np.testing.assert_allclose(
            float(aux["loss_X"]), mean_x.mean(), rtol=1e-5
        )

    def test_determinism(self, setup):
        """Same key, same batch -> bit-identical loss."""
        config, batch, loss, _ = setup
        network = MLPScoreNetwork(config.score_network_config)
        generic_step = make_generic_step(network, config)
        from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
            AXL,
            NOISE,
            TIME,
        )

        init_batch = {
            NOISY_AXL_COMPOSITION: AXL(
                A=batch[ATOM_TYPES],
                X=batch[RELATIVE_COORDINATES],
                L=batch[LATTICE_PARAMETERS],
            ),
            TIME: jnp.full((BATCH, 1), 0.5),
            NOISE: jnp.full((BATCH, 1), 0.1),
        }
        params = network.init(jax.random.PRNGKey(0), init_batch, False)
        loss1, _ = generic_step(params, batch, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(loss1), np.asarray(loss))

    def test_time_indices_in_range(self, setup):
        config, _, _, aux = setup
        indices = np.asarray(aux[TIME_INDICES])
        assert indices.shape == (BATCH,)
        assert (indices >= 0).all()
        assert (indices < config.noise_parameters.total_time_steps).all()
