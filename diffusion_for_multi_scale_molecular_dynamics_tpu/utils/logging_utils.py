"""Experiment logging setup and environment reporting.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/logging_utils.py)
"""

import logging
import os
import subprocess
import sys

logger = logging.getLogger(__name__)


def configure_logging(experiment_dir: str, level=logging.INFO) -> None:
    """Log to console and to <experiment_dir>/console.log."""
    os.makedirs(experiment_dir, exist_ok=True)
    handlers = [
        logging.StreamHandler(sys.stdout),
        logging.FileHandler(os.path.join(experiment_dir, "console.log")),
    ]
    logging.basicConfig(
        level=level,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=handlers,
        force=True,
    )


def get_git_hash() -> str:
    """Current commit hash, or a placeholder outside a repo."""
    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL
            )
            .decode()
            .strip()
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return "no-git-hash"


def log_exp_details(script_location: str, args) -> None:
    """Record reproducibility details at experiment start."""
    import jax

    details = dict(
        script=script_location,
        git_hash=get_git_hash(),
        hostname=os.uname().nodename,
        python=sys.version.split()[0],
        jax=jax.__version__,
        devices=[str(d) for d in jax.devices()],
        command_line_args=vars(args) if args is not None else None,
    )
    logger.info("Experiment details: %s", details)
