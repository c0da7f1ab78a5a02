"""Sampling CLI: generate structures from a trained checkpoint.

(reference surface: src/diffusion_for_multi_scale_molecular_dynamics/sample_diffusion.py:52-274)
Writes samples.pkl (AXL arrays), energies.npz (oracle energies/forces) and
trajectories.pkl (when recording) to the output directory.
"""

import argparse
import functools
import logging
import os
import pickle

import jax
import numpy as np
import yaml

from .generators.instantiate_generator import (
    instantiate_generator,
    load_sampling_parameters,
)
from .generators.sampling_constraint import read_sampling_constraint
from .generators.trajectory_initializer import instantiate_trajectory_initializer
from .models.force_field_augmented_score_network import (
    ForceFieldAugmentedScoreNetwork,
    ForceFieldParameters,
)
from .namespace import AXL, AXL_COMPOSITION, CARTESIAN_POSITIONS
from .noise_schedulers import NoiseParameters
from .oracle.energy_oracle_factory import (
    create_energy_oracle,
    create_energy_oracle_parameters,
)
from .sampling.diffusion_sampling import create_batch_of_samples
from .utils.logging_utils import configure_logging
from .utils.restore import load_axl_network_from_checkpoint

logger = logging.getLogger(__name__)


def build_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Sample from a diffusion model")
    parser.add_argument("--config", required=True, help="sampling YAML config")
    parser.add_argument(
        "--checkpoint", required=True, help="training output dir or checkpoint dir"
    )
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument(
        "--starting-configuration",
        default=None,
        help="pickle with a noisy AXL + start index (partial denoising)",
    )
    parser.add_argument(
        "--sampling-constraints",
        default=None,
        help="pickle with a SamplingConstraint (repaint inpainting)",
    )
    parser.add_argument("--seed", type=int, default=42)
    return parser


def extract_and_validate_parameters(config: dict):
    """Pull NoiseParameters + SamplingParameters out of the sampling config."""
    assert "noise" in config, "sampling config must contain a 'noise' block"
    assert "sampling" in config, "sampling config must contain a 'sampling' block"
    noise_parameters = NoiseParameters(**config["noise"])
    sampling_parameters = load_sampling_parameters(config["sampling"])
    return noise_parameters, sampling_parameters


def create_samples_and_write_to_disk(
    args, config: dict, axl_network, output_directory: str
) -> None:
    """Generate, score and persist samples."""
    noise_parameters, sampling_parameters = extract_and_validate_parameters(config)

    if "force_field" in config:
        axl_network = ForceFieldAugmentedScoreNetwork(
            axl_network, ForceFieldParameters(**config["force_field"])
        )

    trajectory_initializer = instantiate_trajectory_initializer(
        sampling_parameters, args.starting_configuration
    )
    sampling_constraints = (
        read_sampling_constraint(args.sampling_constraints)
        if args.sampling_constraints
        else None
    )
    generator = instantiate_generator(
        sampling_parameters,
        noise_parameters,
        axl_network,
        trajectory_initializer=trajectory_initializer,
        sampling_constraints=sampling_constraints,
    )

    # Multi-chip: shard the sample axis over the data mesh (embarrassingly
    # parallel trajectories, one compiled SPMD scan).
    from .parallel.mesh import make_data_mesh

    mesh = make_data_mesh()
    if mesh is not None and hasattr(generator, "_scan_chunk"):
        batch_size = sampling_parameters.sample_batchsize or (
            sampling_parameters.number_of_samples
        )
        if batch_size % mesh.devices.size == 0:
            from .parallel.sharded_sampling import shard_generator_over_mesh

            shard_generator_over_mesh(generator, mesh)
        else:
            logger.warning(
                "sample batch %d not divisible by %d devices; sampling on one device",
                batch_size,
                mesh.devices.size,
            )

    key = jax.random.PRNGKey(args.seed)
    logger.info(
        "Generating %d samples...", sampling_parameters.number_of_samples
    )
    sample_batch = create_batch_of_samples(generator, sampling_parameters, key)
    composition = sample_batch[AXL_COMPOSITION]

    samples_path = os.path.join(output_directory, "samples.pkl")
    with open(samples_path, "wb") as fh:
        pickle.dump(
            AXL(
                A=np.asarray(composition.A),
                X=np.asarray(composition.X),
                L=np.asarray(composition.L),
            ),
            fh,
        )
    logger.info("Wrote %s", samples_path)

    if "oracle" in config:
        oracle_parameters = create_energy_oracle_parameters(
            config["oracle"], config["elements"]
        )
        oracle = create_energy_oracle(oracle_parameters)
        energies, forces = oracle.compute_oracle_energies_and_forces(
            composition,
            cartesian_positions=np.asarray(sample_batch[CARTESIAN_POSITIONS]),
        )
        energies_path = os.path.join(output_directory, "energies.npz")
        np.savez(energies_path, energies=energies, forces=forces)
        logger.info(
            "Wrote %s (mean energy %.4f)", energies_path, float(np.mean(energies))
        )

    if sampling_parameters.record_samples:
        trajectories_path = os.path.join(output_directory, "trajectories.pkl")
        generator.sample_trajectory_recorder.write_to_pickle(trajectories_path)
        logger.info("Wrote %s", trajectories_path)


def main(argv=None) -> None:
    args = build_argument_parser().parse_args(argv)
    from .utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    os.makedirs(args.output, exist_ok=True)
    configure_logging(args.output)

    with open(args.config, "r") as fh:
        config = yaml.safe_load(fh)

    axl_network = load_axl_network_from_checkpoint(args.checkpoint)
    create_samples_and_write_to_disk(args, config, axl_network, args.output)


if __name__ == "__main__":
    main()
