"""A simple experiment: a tutorial (runnable script).

The TPU-native counterpart of the reference's
``tutorials/simple_experiment_01.ipynb`` (/root/reference): train a small
MLP score network on an in-memory Gaussian toy dataset (atoms normally
distributed around fixed equilibrium sites), then draw samples from the
trained model with the predictor-corrector generator and compare them to
the equilibrium sites. The whole flow is the real production stack — YAML
config -> train_diffusion -> orbax checkpoint -> sampling — at toy scale.
Runs on CPU in a few minutes:

    JAX_PLATFORMS=cpu python tutorials/tutorial_01_simple_experiment.py
"""

import os
import shutil
import sys

import numpy as np
import yaml

HERE = os.path.dirname(os.path.abspath(__file__))
OUTPUT = os.path.join(HERE, "output", "tutorial_simple_experiment")

EQUILIBRIUM = [[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]
SIGMA_D = 0.05

CONFIG = {
    "exp_name": "tutorial_simple_experiment",
    "max_epoch": 15,
    "log_every_n_steps": 5,
    "seed": 1234,
    "elements": ["Si"],
    "spatial_dimension": 3,
    "data": {
        "data_source": "gaussian",
        "batch_size": 128,
        "max_atom": 2,
        "number_of_atoms": 2,
        "random_seed": 42,
        "sigma_d": SIGMA_D,
        "equilibrium_relative_coordinates": EQUILIBRIUM,
        "train_dataset_size": 2048,
        "valid_dataset_size": 256,
        "use_fixed_lattice_parameters": True,
        "noise": {"total_time_steps": 50, "sigma_min": 0.001,
                  "sigma_max": 0.5, "corrector_step_epsilon": 2.0e-6},
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
    "scheduler": {"name": "CosineAnnealingLR", "t_max": 15},
    "model_checkpoint": {"monitor": "validation_epoch_loss", "mode": "min"},
    "logging": ["csv"],
}


def main():
    import functools

    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sys.path.insert(0, os.path.dirname(HERE))
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import (
        main as train_main,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    if os.path.isdir(OUTPUT):
        shutil.rmtree(OUTPUT)
    os.makedirs(OUTPUT, exist_ok=True)
    config_path = os.path.join(OUTPUT, "config.yaml")
    with open(config_path, "w") as fh:
        yaml.safe_dump(CONFIG, fh)

    # --- train (the real CLI entry point) ---
    run_dir = os.path.join(OUTPUT, "run")
    train_main(["--config", config_path, "--output", run_dir])

    # --- sample from the trained checkpoint ---
    axl_network = load_axl_network_from_checkpoint(run_dir, prefer="best")
    generator = LangevinGenerator(
        NoiseParameters(total_time_steps=50, schedule_type="linear",
                        sigma_min=0.001, sigma_max=0.5,
                        corrector_step_epsilon=2.0e-6),
        PredictorCorrectorSamplingParameters(
            num_atom_types=1,
            number_of_atoms=2,
            number_of_samples=256,
            number_of_corrector_steps=6,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[1.0, 1.0, 1.0],
        ),
        axl_network,
    )
    samples = np.asarray(generator.sample(jax.random.PRNGKey(0), 256).X)

    equilibrium = np.asarray(EQUILIBRIUM)
    delta = samples[:, :, None, :] - equilibrium[None, None, :, :]
    delta -= np.round(delta)
    nearest = np.linalg.norm(delta, axis=-1).min(axis=-1)
    print(f"256 samples x 2 atoms: median distance to the nearest "
          f"equilibrium site {np.median(nearest):.4f} (sigma_d={SIGMA_D})")

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(samples[:, :, 0].ravel(), samples[:, :, 1].ravel(), s=6,
               alpha=0.3, label="sampled (x, y)")
    ax.scatter(equilibrium[:, 0], equilibrium[:, 1], s=250,
               facecolors="none", edgecolors="tab:blue",
               label="equilibrium sites")
    ax.set_xlim(0, 1); ax.set_ylim(0, 1); ax.set_aspect("equal")
    ax.legend(fontsize=8)
    path = os.path.join(OUTPUT, "trained_model_samples.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print("wrote", path)
    assert np.median(nearest) < 4 * SIGMA_D


if __name__ == "__main__":
    main()
