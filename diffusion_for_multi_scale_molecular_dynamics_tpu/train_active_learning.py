"""Active-learning CLI: run FLARE + ARTn campaigns with diffusion repainting.

(reference surface: src/diffusion_for_multi_scale_molecular_dynamics/train_active_learning.py:35-221)

The config YAML drives everything; per uncertainty threshold one campaign is
run in its own working directory.
"""

import argparse
import logging
import os

import yaml

from .active_learning.active_learning import ActiveLearning
from .active_learning.artn import ArtnDriver, ArtnDriverParameters
from .active_learning.configuration_parsing import (
    get_sample_maker_from_configuration,
)
from .active_learning.flare_trainer import (
    FlareConfiguration,
    FlareHyperparametersOptimizer,
    FlareOptimizerConfiguration,
    FlareTrainer,
)
from .active_learning.lammps_io import instantiate_lammps_runner
from .active_learning.single_point_calculators import (
    instantiate_single_point_calculator,
)
from .utils.logging_utils import configure_logging, log_exp_details

logger = logging.getLogger(__name__)


def build_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Run active-learning campaigns")
    parser.add_argument("--config", required=True, help="campaign YAML config")
    parser.add_argument(
        "--path_to_reference_directory",
        required=True,
        help="directory containing artn.in and initial_configuration.dat",
    )
    parser.add_argument("--path_to_lammps_executable", default="lmp")
    parser.add_argument(
        "--path_to_artn_library_plugin", required=True, help="ARTn plugin library"
    )
    parser.add_argument(
        "--path_to_initial_flare_checkpoint",
        required=True,
        help="pretrained FLARE json checkpoint",
    )
    parser.add_argument(
        "--path_to_score_network_checkpoint",
        default=None,
        help="diffusion checkpoint for excise_and_repaint",
    )
    parser.add_argument("--output", required=True, help="output directory")
    return parser


def run(args, config) -> None:
    elements = config["elements"]

    lammps_config = dict(config.get("lammps", {}))
    lammps_config.setdefault("lammps_executable", args.path_to_lammps_executable)
    lammps_runner = instantiate_lammps_runner(lammps_config)

    artn_driver = ArtnDriver(
        ArtnDriverParameters(
            reference_directory=args.path_to_reference_directory,
            artn_library_plugin=args.path_to_artn_library_plugin,
            elements=elements,
        ),
        lammps_runner,
    )

    oracle_calculator = instantiate_single_point_calculator(
        config["oracle"], elements, lammps_runner=lammps_runner
    )

    sample_maker = get_sample_maker_from_configuration(
        config["sample_maker"],
        elements,
        score_network_checkpoint=args.path_to_score_network_checkpoint,
    )

    optimizer = FlareHyperparametersOptimizer(
        FlareOptimizerConfiguration(**config.get("flare_optimizer", {}))
    )

    active_learning = ActiveLearning(
        oracle_single_point_calculator=oracle_calculator,
        sample_maker=sample_maker,
        artn_driver=artn_driver,
        flare_hyperparameters_optimizer=optimizer,
    )

    thresholds = config["uncertainty_thresholds"]
    for threshold in thresholds:
        campaign_dir = os.path.join(
            args.output, f"campaign_threshold_{threshold}"
        )
        logger.info("=== campaign with uncertainty threshold %s ===", threshold)
        flare_trainer = FlareTrainer.from_checkpoint(
            args.path_to_initial_flare_checkpoint
        )
        details = active_learning.run_campaign(
            uncertainty_threshold=threshold,
            flare_trainer=flare_trainer,
            working_directory=campaign_dir,
            maximum_number_of_rounds=config.get("maximum_number_of_rounds", 100),
        )
        logger.info("campaign finished: %s", details)


def main(argv=None) -> None:
    args = build_argument_parser().parse_args(argv)
    os.makedirs(args.output, exist_ok=True)
    configure_logging(args.output)
    log_exp_details(__file__, args)
    with open(args.config, "r") as fh:
        config = yaml.safe_load(fh)
    run(args, config)


if __name__ == "__main__":
    main()
