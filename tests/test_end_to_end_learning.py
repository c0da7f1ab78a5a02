"""End-to-end learning fidelity: train on the Gaussian toy, then sample.

The trained MLP score network (not the analytical oracle) must generate
configurations concentrated on the data distribution's modes. This is the
round-1 analogue of the reference's Si 1x1x1 fidelity gate.
"""

import functools

import jax
import numpy as np
import pytest
import yaml


@pytest.mark.slow
def test_trained_mlp_generates_data_distribution(tmp_path):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import (
        build_argument_parser,
        run,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.configuration import (
        load_and_backup_hyperparameters,
    )

    sigma_d = 0.05
    equilibrium = [[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]
    config = {
        "exp_name": "fidelity",
        "max_epoch": 40,
        "seed": 7,
        "elements": ["Si"],
        "spatial_dimension": 3,
        "data": {
            "data_source": "gaussian",
            "batch_size": 128,
            "max_atom": 2,
            "number_of_atoms": 2,
            "random_seed": 11,
            "sigma_d": sigma_d,
            "equilibrium_relative_coordinates": equilibrium,
            "train_dataset_size": 2048,
            "valid_dataset_size": 256,
            "use_fixed_lattice_parameters": True,
            "noise": {
                "total_time_steps": 50,
                "sigma_min": 0.001,
                "sigma_max": 0.5,
            },
        },
        "model": {
            "loss": {
                "coordinates": {"algorithm": "mse", "lambda_weight": 1.0},
                "atom_types": {"algorithm": "d3pm", "lambda_weight": 0.0},
                "lattice_parameters": {"algorithm": "mse", "lambda_weight": 0.0},
            },
            "score_network": {
                "architecture": "mlp",
                "number_of_atoms": 2,
                "n_hidden_dimensions": 3,
                "hidden_dimensions_size": 64,
                "noise_embedding_dimensions_size": 16,
                "relative_coordinates_embedding_dimensions_size": 32,
                "time_embedding_dimensions_size": 16,
                "atom_type_embedding_dimensions_size": 4,
                "lattice_parameters_embedding_dimensions_size": 4,
            },
        },
        "optimizer": {"name": "adamw", "learning_rate": 0.005},
        "model_checkpoint": {"monitor": "validation_epoch_loss", "mode": "min"},
        "logging": ["csv"],
    }
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as fh:
        yaml.safe_dump(config, fh)
    output = str(tmp_path / "out")
    args = build_argument_parser().parse_args(
        ["--config", str(config_path), "--output", output]
    )
    hyper_params = load_and_backup_hyperparameters(str(config_path), output)
    metrics = run(args, hyper_params)

    # The loss floor is the (nonzero) variance of the conditional score
    # around the marginal score; measure it with the *optimal* (analytical)
    # network and require the trained model to be within 15% of it.
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
        AnalyticalScoreNetwork,
        AnalyticalScoreNetworkConfig,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.diffusion_model import (
        make_generic_step,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.instantiate_diffusion_model import (
        load_diffusion_model,
    )

    analytical_config = AnalyticalScoreNetworkConfig(
        num_atom_types=1,
        number_of_atoms=2,
        kmax=4,
        equilibrium_relative_coordinates=equilibrium,
        sigma_d=sigma_d,
        use_permutation_invariance=True,
    )
    _, diffusion_config = load_diffusion_model(hyper_params)
    floor_diffusion_config = diffusion_config.__class__(
        score_network_config=analytical_config,
        loss_parameters=diffusion_config.loss_parameters,
        noise_parameters=diffusion_config.noise_parameters,
        use_fixed_lattice_parameters=True,
    )
    floor_step = jax.jit(
        functools.partial(
            make_generic_step(
                AnalyticalScoreNetwork(analytical_config), floor_diffusion_config
            ),
            conditional=False,
        )
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.data.gaussian_data_module import (
        GaussianDataModule,
        GaussianDataModuleParameters,
    )

    dm = GaussianDataModule(
        GaussianDataModuleParameters(
            elements=["Si"],
            batch_size=128,
            max_atom=2,
            number_of_atoms=2,
            random_seed=13,
            sigma_d=sigma_d,
            equilibrium_relative_coordinates=equilibrium,
            train_dataset_size=128,
            valid_dataset_size=512,
            use_fixed_lattice_parameters=True,
        )
    )
    key = jax.random.PRNGKey(0)
    floor_losses = []
    for batch in dm.valid_batches():
        key, k = jax.random.split(key)
        _, aux = floor_step({}, batch, k)
        floor_losses.append(float(aux["loss_X"]))
    loss_floor = float(np.mean(floor_losses))

    assert metrics["validation_epoch_loss_X"] < 1.15 * loss_floor, (
        metrics["validation_epoch_loss_X"],
        loss_floor,
    )

    # Sample from the trained network.
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    axl_network = load_axl_network_from_checkpoint(output, prefer="best")
    generator = LangevinGenerator(
        NoiseParameters(total_time_steps=50, sigma_min=0.001, sigma_max=0.5),
        PredictorCorrectorSamplingParameters(
            num_atom_types=1,
            number_of_atoms=2,
            number_of_samples=128,
            number_of_corrector_steps=2,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[1.0, 1.0, 1.0],
        ),
        axl_network,
    )
    samples = generator.sample(jax.random.PRNGKey(3), 128)
    x = np.asarray(samples.X)

    equilibrium = np.asarray(equilibrium)
    displacements = []
    for sample in x:
        for atom in sample:
            delta = np.mod(atom - equilibrium, 1.0)
            delta = np.where(delta > 0.5, delta - 1.0, delta)
            displacements.append(delta[np.argmin(np.linalg.norm(delta, axis=-1))])
    displacements = np.asarray(displacements)
    distances = np.linalg.norm(displacements, axis=-1)

    # Most atoms near a mode with roughly the right spread.
    assert np.quantile(distances, 0.9) < 4 * sigma_d, distances.max()
    measured_std = displacements.std(axis=0).mean()
    assert 0.4 * sigma_d < measured_std < 2.5 * sigma_d, measured_std
