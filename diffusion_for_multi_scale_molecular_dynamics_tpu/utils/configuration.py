"""YAML configuration loading, backup-on-resume validation, generic dispatch.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/main_utils.py:145,
 utils/configuration_parsing.py:5; deepdiff replaced by a recursive compare)
"""

import logging
import os
from typing import Any, Dict

import yaml

logger = logging.getLogger(__name__)

CONFIG_BACKUP_NAME = "config_backup.yaml"


def _deep_equal(a: Any, b: Any) -> bool:
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_deep_equal(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_deep_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            return abs(float(a) - float(b)) <= 1e-12 * max(1.0, abs(float(a)))
        except (TypeError, ValueError):
            return False
    return a == b


def load_and_backup_hyperparameters(
    config_file_path: str, output_directory: str
) -> Dict[str, Any]:
    """Load the experiment YAML; on resume, require it to match the backup.

    A changed config on an existing output directory silently corrupts a
    resumed run, so it is a hard error — the same policy as the reference.
    """
    with open(config_file_path, "r") as fh:
        hyper_params = yaml.safe_load(fh)

    os.makedirs(output_directory, exist_ok=True)
    backup_path = os.path.join(output_directory, CONFIG_BACKUP_NAME)
    if os.path.exists(backup_path):
        with open(backup_path, "r") as fh:
            backup = yaml.safe_load(fh)
        if not _deep_equal(hyper_params, backup):
            raise ValueError(
                "The configuration differs from the backed-up configuration in "
                f"{backup_path}; refusing to resume with inconsistent settings."
            )
        logger.info("Configuration matches backup; resuming.")
    else:
        with open(backup_path, "w") as fh:
            yaml.safe_dump(hyper_params, fh)
    return hyper_params


def create_parameters_from_configuration_dictionary(
    configuration: Dict[str, Any],
    identifier: str,
    options: Dict[str, Any],
    **kwargs,
):
    """Generic discriminator-keyed dataclass dispatch.

    Args:
        configuration: config dict containing the discriminator field.
        identifier: name of the discriminator field (e.g. "algorithm").
        options: mapping from discriminator value to dataclass.
        kwargs: extra fields merged into the dataclass constructor.
    """
    assert identifier in configuration, (
        f"The configuration should contain a '{identifier}' field."
    )
    key = configuration[identifier]
    assert key in options, f"Unknown {identifier} '{key}'. Options: {sorted(options)}"
    return options[key](**configuration, **kwargs)
