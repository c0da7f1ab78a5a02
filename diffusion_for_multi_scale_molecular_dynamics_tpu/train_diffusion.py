"""Training CLI: ``python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion``.

Mirrors the reference's entry point surface
(src/diffusion_for_multi_scale_molecular_dynamics/train_diffusion.py:33-226):
one YAML config + an output directory; an existing output directory resumes
(with a config-consistency check), --start-from-scratch wipes it.
"""

import argparse
import logging
import os
import shutil
import sys
from typing import Any, Dict

from .data.element_types import ElementTypes
from .data.instantiate_data_module import load_data_module
from .training.callbacks import create_all_callbacks
from .training.checkpointing import CheckpointManager
from .training.instantiate_diffusion_model import load_diffusion_model
from .training.loggers import create_all_loggers
from .training.optimizer import (
    create_optimizer_parameters,
    create_scheduler_parameters,
)
from .training.trainer import Trainer
from .utils.configuration import load_and_backup_hyperparameters
from .utils.logging_utils import configure_logging, log_exp_details
from .utils.reproducibility import set_seed

logger = logging.getLogger(__name__)


def build_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train an AXL diffusion model")
    parser.add_argument("--config", required=True, help="experiment YAML config")
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument(
        "--data", default=None, help="LAMMPS raw data directory (for data_source=LAMMPS)"
    )
    parser.add_argument(
        "--processed_datadir", default=None, help="processed parquet cache directory"
    )
    parser.add_argument(
        "--start-from-scratch",
        action="store_true",
        help="wipe the output directory instead of resuming",
    )
    return parser


# Every top-level config key this CLI consumes. A key outside this set is
# almost always a typo or an unsupported reference knob — warn instead of
# silently ignoring it (migration hazard).
_KNOWN_TOP_LEVEL_KEYS = frozenset(
    {
        "exp_name",
        "run_name",
        "max_epoch",
        "log_every_n_steps",
        "gradient_clipping",
        "accumulate_grad_batches",
        "seed",
        "elements",
        "spatial_dimension",
        "data",
        "model",
        "optimizer",
        "scheduler",
        "early_stopping",
        "model_checkpoint",
        "diffusion_sampling",
        "sampling_visualization",
        "oracle",
        "loss_monitoring",
        "score_viewer",
        "logging",
    }
)


def warn_on_unknown_top_level_keys(hyper_params: Dict[str, Any]) -> None:
    unknown = sorted(set(hyper_params) - _KNOWN_TOP_LEVEL_KEYS)
    if unknown:
        logger.warning(
            "Config keys not consumed by this trainer (typo or unsupported "
            "knob?): %s", ", ".join(unknown)
        )


def run(args, hyper_params: Dict[str, Any]) -> Dict[str, float]:
    """Configure every component and run the training loop."""
    warn_on_unknown_top_level_keys(hyper_params)
    seed = hyper_params.get("seed")
    if seed is not None:
        set_seed(seed)

    ElementTypes.validate_elements(hyper_params["elements"])

    datamodule = load_data_module(hyper_params, args)
    score_network, diffusion_config = load_diffusion_model(hyper_params)

    optimizer_parameters = create_optimizer_parameters(hyper_params["optimizer"])
    # The top-level gradient_clipping / accumulate_grad_batches knobs (the
    # reference keeps them at the trainer level) feed the optax chain.
    from dataclasses import replace

    clip = hyper_params.get("gradient_clipping", 0) or None
    if clip:
        optimizer_parameters = replace(optimizer_parameters, gradient_clipping=clip)
    accumulate = int(hyper_params.get("accumulate_grad_batches", 1) or 1)
    if accumulate > 1:
        optimizer_parameters = replace(
            optimizer_parameters, accumulate_grad_batches=accumulate
        )
    scheduler_parameters = create_scheduler_parameters(hyper_params.get("scheduler"))

    checkpoint_config = hyper_params.get("model_checkpoint", {})
    checkpoint_manager = CheckpointManager(
        args.output,
        monitor=checkpoint_config.get("monitor", "validation_epoch_loss"),
        mode=checkpoint_config.get("mode", "min"),
    )

    exp_name = hyper_params.get("exp_name", "experiment")
    if hyper_params.get("run_name"):
        exp_name = f"{exp_name}/{hyper_params['run_name']}"
    loggers = create_all_loggers(
        hyper_params.get("logging", ["csv"]), args.output, exp_name
    )
    callbacks = create_all_callbacks(
        hyper_params, hyper_params.get("spatial_dimension", 3)
    )

    validation_hooks = []
    if "diffusion_sampling" in hyper_params:
        from .sampling.validation_sampling import create_validation_sampling_hook

        validation_hooks.append(
            create_validation_sampling_hook(hyper_params, args.output)
        )

    trainer = Trainer(
        score_network=score_network,
        diffusion_config=diffusion_config,
        optimizer_parameters=optimizer_parameters,
        scheduler_parameters=scheduler_parameters,
        output_directory=args.output,
        max_epoch=hyper_params.get("max_epoch", 10),
        loggers=loggers,
        callbacks=callbacks,
        checkpoint_manager=checkpoint_manager,
        seed=seed if seed is not None else 1234,
        log_every_n_steps=hyper_params.get("log_every_n_steps", 1),
        validation_hooks=validation_hooks,
    )
    return trainer.fit(datamodule)


def main(argv=None) -> None:
    args = build_argument_parser().parse_args(argv)
    from .utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    if args.start_from_scratch and os.path.isdir(args.output):
        shutil.rmtree(args.output)
    os.makedirs(args.output, exist_ok=True)

    configure_logging(args.output)
    log_exp_details(__file__, args)

    hyper_params = load_and_backup_hyperparameters(args.config, args.output)

    from .utils.main_utils import report_to_orion_if_on

    early_stopping_metric = hyper_params.get("early_stopping", {}).get(
        "metric", "validation_epoch_loss"
    )
    try:
        metrics = run(args, hyper_params)
    except RuntimeError:
        # Report the crashed trial (e.g. device OOM) so HPO prunes it.
        report_to_orion_if_on(None, run_crashed=True)
        raise
    logger.info("Training finished: %s", metrics)
    report_to_orion_if_on(metrics.get(early_stopping_metric))


if __name__ == "__main__":
    main()
