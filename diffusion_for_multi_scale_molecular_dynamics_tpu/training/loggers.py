"""Experiment metric loggers: csv, tensorboard, comet.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/loggers/logger_loader.py:32-187)
TensorBoard uses torch's SummaryWriter (CPU-only dependency); comet is gated
on the comet_ml package and persists its experiment key for resume like the
reference does.
"""

import csv
import logging
import os
from typing import Any, Dict, List, Optional

import yaml

logger = logging.getLogger(__name__)

COMET_EXPERIMENT_KEY_FILE = "comet_experiment_key.yaml"


class CSVLogger:
    """Append scalar metrics to metrics.csv (one row per log call)."""

    name = "csv"

    def __init__(self, output_directory: str):
        self._path = os.path.join(output_directory, "metrics.csv")
        self._fieldnames: List[str] = ["step"]
        self._rows: List[Dict[str, Any]] = []
        if os.path.exists(self._path):
            with open(self._path, newline="") as fh:
                reader = csv.DictReader(fh)
                self._fieldnames = list(reader.fieldnames or ["step"])
                self._rows = list(reader)

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        row = {"step": step, **metrics}
        self._rows.append(row)
        for key in row:
            if key not in self._fieldnames:
                self._fieldnames.append(key)
        # Metric sets differ between step- and epoch-level logs; rewrite the
        # small file with the union header so every column stays aligned.
        with open(self._path, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=self._fieldnames)
            writer.writeheader()
            writer.writerows(self._rows)

    def log_figure(self, name: str, figure, step: int) -> None:
        pass

    def finalize(self) -> None:
        pass


class TensorBoardLogger:
    """Scalars and matplotlib figures to tensorboard event files."""

    name = "tensorboard"

    def __init__(self, output_directory: str):
        from torch.utils.tensorboard import SummaryWriter

        self._writer = SummaryWriter(log_dir=os.path.join(output_directory, "tensorboard"))

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        for key, value in metrics.items():
            self._writer.add_scalar(key, value, global_step=step)

    def log_figure(self, name: str, figure, step: int) -> None:
        self._writer.add_figure(name, figure, global_step=step)

    def finalize(self) -> None:
        self._writer.flush()
        self._writer.close()


class CometLogger:
    """Comet.ml logger with experiment-key persistence for resume."""

    name = "comet"

    def __init__(self, output_directory: str, exp_name: str):
        import comet_ml  # gated optional dependency

        key_path = os.path.join(output_directory, COMET_EXPERIMENT_KEY_FILE)
        experiment_key = None
        if os.path.exists(key_path):
            with open(key_path, "r") as fh:
                experiment_key = yaml.safe_load(fh).get("experiment_key")
        if experiment_key:
            self._experiment = comet_ml.ExistingExperiment(
                previous_experiment=experiment_key
            )
        else:
            self._experiment = comet_ml.Experiment(project_name=exp_name)
            with open(key_path, "w") as fh:
                yaml.safe_dump({"experiment_key": self._experiment.get_key()}, fh)

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        self._experiment.log_metrics(metrics, step=step)

    def log_figure(self, name: str, figure, step: int) -> None:
        self._experiment.log_figure(figure_name=name, figure=figure, step=step)

    def finalize(self) -> None:
        self._experiment.end()


def create_all_loggers(
    logging_config: Optional[List[Any]], output_directory: str, exp_name: str = ""
) -> List[Any]:
    """Instantiate the configured loggers (csv / tensorboard / comet)."""
    loggers: List[Any] = []
    for entry in logging_config or []:
        name = entry if isinstance(entry, str) else next(iter(entry))
        if name == "csv":
            loggers.append(CSVLogger(output_directory))
        elif name == "tensorboard":
            loggers.append(TensorBoardLogger(output_directory))
        elif name == "comet":
            try:
                loggers.append(CometLogger(output_directory, exp_name))
            except ImportError:
                logger.warning("comet_ml is not installed; skipping comet logger.")
        else:
            raise ValueError(f"Unknown logger '{name}'")
    return loggers


def log_metrics_to_all(loggers, metrics: Dict[str, float], step: int) -> None:
    for lg in loggers:
        lg.log_metrics(metrics, step)


def log_figure_to_all(loggers, name: str, figure, step: int) -> None:
    for lg in loggers:
        lg.log_figure(name, figure, step)
