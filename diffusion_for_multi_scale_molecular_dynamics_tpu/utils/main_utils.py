"""HPO (Orion) reporting and run-level helpers.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/main_utils.py:98-145,
 utils/hp_utils.py:6, utils/file_utils.py:8)
"""

import logging
import subprocess
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)


def is_orion_on() -> bool:
    """True when running under an Orion hyperparameter-search trial."""
    try:
        from orion.client import cli as orion_cli  # noqa: F401

        import os

        return os.environ.get("ORION_TRIAL_ID") is not None
    except ImportError:
        return False


def report_to_orion_if_on(
    metric_value: Optional[float], run_crashed: bool = False
) -> None:
    """Report the objective (or a bad-trial marker) to Orion when active.

    Crashed runs (e.g. OOM) report a 'bad trial' so ASHA prunes the
    configuration instead of retrying it.
    """
    if not is_orion_on():
        return
    from orion.client import cli as orion_cli

    if run_crashed or metric_value is None:
        logger.warning("Reporting a bad trial to Orion.")
        orion_cli.report_bad_trial()
    else:
        logger.info("Reporting objective %f to Orion.", metric_value)
        orion_cli.report_objective(float(metric_value))


def check_and_log_hp(
    names: List[str], hyper_params: Dict[str, Any], allow_extra: bool = True
) -> None:
    """Assert required hyperparameters exist; log everything.

    (reference: utils/hp_utils.py:6)
    """
    missing = [name for name in names if name not in hyper_params]
    assert not missing, f"missing required hyperparameters: {missing}"
    if not allow_extra:
        extra = [key for key in hyper_params if key not in names]
        assert not extra, f"unexpected hyperparameters: {extra}"
    for key in sorted(hyper_params):
        logger.info("hp: %s = %s", key, hyper_params[key])


def rsync_folder(source: str, destination: str) -> None:
    """Mirror a folder with rsync (cluster data staging helper)."""
    subprocess.run(["rsync", "-a", source, destination], check=True)
