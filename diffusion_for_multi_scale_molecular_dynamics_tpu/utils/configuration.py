"""YAML configuration loading, backup-on-resume validation, generic dispatch.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/main_utils.py:145,
 utils/configuration_parsing.py:5; deepdiff replaced by a recursive compare)
"""

import logging
import os
import re
from typing import Any, Dict

import yaml

logger = logging.getLogger(__name__)

CONFIG_BACKUP_NAME = "config_backup.yaml"

_ORION_PATTERN = re.compile(r"^orion~(\w+)\((.*)\)$")


def resolve_orion_placeholders(configuration: Any) -> Any:
    """Substitute ``orion~...`` search-space strings with deterministic values.

    Orion HPO templates carry values like ``orion~choices([16, 32])`` or
    ``orion~loguniform(1e-6, 1e-3)``; under ``orion hunt`` the orion client
    rewrites them before the program sees the config. When such a template is
    run *without* orion, this helper makes it usable by picking a
    deterministic representative (first choice / geometric mean / midpoint).
    (reference behavior: templates crash without orion — this is an upgrade.)
    """
    if isinstance(configuration, dict):
        return {
            key: resolve_orion_placeholders(value)
            for key, value in configuration.items()
        }
    if isinstance(configuration, list):
        return [resolve_orion_placeholders(value) for value in configuration]
    if not isinstance(configuration, str):
        return configuration
    match = _ORION_PATTERN.match(configuration.strip())
    if match is None:
        return configuration
    distribution, arguments = match.group(1), match.group(2)
    if distribution == "choices":
        values = yaml.safe_load(arguments)
        return values[0]
    numbers = [float(x) for x in arguments.split(",")]
    if distribution == "loguniform":
        value = (numbers[0] * numbers[1]) ** 0.5
    elif distribution == "uniform":
        value = 0.5 * (numbers[0] + numbers[1])
    else:
        raise ValueError(f"unsupported orion distribution '{distribution}'")
    return int(value) if all(n == int(n) for n in numbers) else value


def _contains_orion_placeholder(configuration: Any) -> bool:
    if isinstance(configuration, dict):
        return any(_contains_orion_placeholder(v) for v in configuration.values())
    if isinstance(configuration, list):
        return any(_contains_orion_placeholder(v) for v in configuration)
    return isinstance(configuration, str) and bool(
        _ORION_PATTERN.match(configuration.strip())
    )


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

    if _contains_orion_placeholder(hyper_params):
        from .main_utils import is_orion_on

        if not is_orion_on():
            logger.warning(
                "Config contains orion~ search-space placeholders but orion "
                "is not driving this run; substituting deterministic "
                "representatives."
            )
            hyper_params = resolve_orion_placeholders(hyper_params)

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
