"""The shipped configuration templates must parse through the real factories."""

import os

import yaml

TEMPLATE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configuration_templates",
)


def load(name):
    with open(os.path.join(TEMPLATE_DIR, name)) as fh:
        return yaml.safe_load(fh)


def test_mlp_gaussian_template_builds_components():
    from diffusion_for_multi_scale_molecular_dynamics_tpu.data.instantiate_data_module import (
        load_data_module,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.callbacks import (
        create_all_callbacks,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.instantiate_diffusion_model import (
        load_diffusion_model,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.optimizer import (
        create_optimizer_parameters,
        create_scheduler_parameters,
    )

    config = load("config_diffusion_mlp_gaussian.yaml")
    # Shrink the dataset so this stays a parsing test.
    config["data"]["train_dataset_size"] = 128
    config["data"]["valid_dataset_size"] = 128
    load_data_module(config, None)
    network, diffusion_config = load_diffusion_model(config)
    assert diffusion_config.noise_parameters.total_time_steps == 50
    create_optimizer_parameters(config["optimizer"])
    create_scheduler_parameters(config["scheduler"])
    callbacks = create_all_callbacks(config)
    assert "early_stopping" in callbacks and "score_viewer" in callbacks


def test_egnn_production_template_builds_components():
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
        EGNNScoreNetwork,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.instantiate_diffusion_model import (
        load_diffusion_model,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.instantiate_generator import (
        load_sampling_parameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.energy_oracle_factory import (
        create_energy_oracle_parameters,
    )

    config = load("config_diffusion_egnn_si_2x2x2.yaml")
    network, diffusion_config = load_diffusion_model(config)
    assert isinstance(network, EGNNScoreNetwork)
    assert network.config.use_fused_message_block
    assert network.config.radial_cutoff == 7.5

    sampling_config = config["diffusion_sampling"]
    NoiseParameters(**sampling_config["noise"])
    params = load_sampling_parameters(sampling_config["sampling"])
    assert params.number_of_corrector_steps == 2
    create_energy_oracle_parameters(config["oracle"], config["elements"])


def test_mace_template_builds_components():
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.mace_score_network import (
        MaceScoreNetwork,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.instantiate_diffusion_model import (
        load_diffusion_model,
    )

    config = load("config_diffusion_mace_si_1x1x1.yaml")
    network, diffusion_config = load_diffusion_model(config)
    assert isinstance(network, MaceScoreNetwork)
    assert network.config.max_ell == 3
    assert network.config.correlation == 3
    assert network.config.hidden_irreps == "32x0e + 32x1o"
    assert network.config.use_pretrained is None


def test_sampling_and_al_templates_parse():
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.instantiate_generator import (
        load_sampling_parameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.force_field_augmented_score_network import (
        ForceFieldParameters,
    )

    sampling = load("config_sampling_si_2x2x2.yaml")
    NoiseParameters(**sampling["noise"])
    load_sampling_parameters(sampling["sampling"])
    ForceFieldParameters(**sampling["force_field"])

    al = load("config_active_learning.yaml")
    from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.atom_selector import (
        create_atom_selector,
        create_atom_selector_arguments,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.excisor import (
        create_excisor,
        create_excisor_arguments,
    )

    create_atom_selector(
        create_atom_selector_arguments(al["sample_maker"]["atom_selector"])
    )
    create_excisor(create_excisor_arguments(al["sample_maker"]["excisor"]))


def test_orion_template_resolves_and_builds():
    """orion~ placeholders resolve deterministically and parse through the
    real factories (exercising the Orion code path without orion installed)."""
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.instantiate_diffusion_model import (
        load_diffusion_model,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.optimizer import (
        create_optimizer_parameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.configuration import (
        resolve_orion_placeholders,
    )

    config = load("config_diffusion_mlp_orion.yaml")
    resolved = resolve_orion_placeholders(config)
    network_config = resolved["model"]["score_network"]
    assert network_config["n_hidden_dimensions"] == 1  # first choice
    assert network_config["hidden_dimensions_size"] == 16
    learning_rate = resolved["optimizer"]["learning_rate"]
    assert abs(learning_rate - (1e-6 * 1e-3) ** 0.5) < 1e-9  # geometric mean

    network, diffusion_config = load_diffusion_model(resolved)
    assert diffusion_config.score_network_config.architecture == "mlp"
    create_optimizer_parameters(resolved["optimizer"])


def test_orion_placeholders_resolved_by_config_loader(tmp_path):
    """The training config loader substitutes placeholders when orion is off."""
    import yaml as yaml_module

    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.configuration import (
        load_and_backup_hyperparameters,
    )

    config = load("config_diffusion_mlp_orion.yaml")
    path = tmp_path / "orion_template.yaml"
    with open(path, "w") as fh:
        yaml_module.safe_dump(config, fh)
    hyper_params = load_and_backup_hyperparameters(str(path), str(tmp_path / "out"))
    assert hyper_params["model"]["score_network"]["n_hidden_dimensions"] == 1
    assert isinstance(hyper_params["optimizer"]["learning_rate"], float)


def test_equivariant_template_builds_network():
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.instantiate_diffusion_model import (
        load_diffusion_model,
    )

    config = load("config_diffusion_equivariant_si_1x1x1.yaml")
    network, diffusion_config = load_diffusion_model(config)
    assert diffusion_config.score_network_config.architecture == "diffusion_mace"
    assert diffusion_config.score_network_config.num_features == 64
