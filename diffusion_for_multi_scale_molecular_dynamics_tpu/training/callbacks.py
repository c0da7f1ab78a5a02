"""Training callbacks: early stopping, loss-vs-sigma monitoring, registry.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/callbacks/{callback_loader,
standard_callbacks,loss_monitoring_callback}.py; the sampling-visualization and
score-viewer callbacks live in their own modules.)
"""

import logging
import math
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


class Callback:
    """Minimal callback interface for the trainer loop."""

    def on_epoch_end(self, trainer, epoch: int, metrics: Dict[str, float]) -> None:
        pass

    def on_validation_batch(self, trainer, epoch: int, aux: Dict[str, Any]) -> None:
        pass

    def should_stop(self) -> bool:
        return False


class EarlyStopping(Callback):
    """Stop when the monitored metric stops improving."""

    def __init__(self, metric: str = "validation_epoch_loss", mode: str = "min",
                 patience: int = 10):
        assert mode in ("min", "max")
        self.metric = metric
        self.mode = mode
        self.patience = patience
        self._best = math.inf if mode == "min" else -math.inf
        self._bad_epochs = 0
        self._stop = False

    def on_epoch_end(self, trainer, epoch: int, metrics: Dict[str, float]) -> None:
        value = metrics.get(self.metric)
        if value is None:
            return
        improved = value < self._best if self.mode == "min" else value > self._best
        if improved:
            self._best = value
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs >= self.patience:
                logger.info(
                    "Early stopping: %s did not improve for %d epochs.",
                    self.metric,
                    self.patience,
                )
                self._stop = True

    def should_stop(self) -> bool:
        return self._stop

    @property
    def best_value(self) -> float:
        return self._best


class LossMonitoringCallback(Callback):
    """Bin the unreduced validation X-loss against sigma(t) and plot it.

    (reference: callbacks/loss_monitoring_callback.py:31)
    """

    def __init__(self, number_of_bins: int = 50, sample_every_n_epochs: int = 25,
                 spatial_dimension: int = 3):
        self.number_of_bins = number_of_bins
        self.sample_every_n_epochs = sample_every_n_epochs
        self._sigmas: List[np.ndarray] = []
        self._losses: List[np.ndarray] = []

    def _active(self, epoch: int) -> bool:
        return (epoch + 1) % self.sample_every_n_epochs == 0

    def on_validation_batch(self, trainer, epoch: int, aux: Dict[str, Any]) -> None:
        if not self._active(epoch):
            return
        sigmas = np.asarray(aux["sigmas"])[:, 0, 0]
        loss_x = np.asarray(aux["unreduced_loss"].X).mean(axis=(1, 2))
        self._sigmas.append(sigmas)
        self._losses.append(loss_x)

    def on_epoch_end(self, trainer, epoch: int, metrics: Dict[str, float]) -> None:
        if not self._active(epoch) or not self._sigmas:
            return
        sigmas = np.concatenate(self._sigmas)
        losses = np.concatenate(self._losses)
        self._sigmas.clear()
        self._losses.clear()
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            bins = np.linspace(sigmas.min(), sigmas.max(), self.number_of_bins + 1)
            idx = np.clip(np.digitize(sigmas, bins) - 1, 0, self.number_of_bins - 1)
            means = np.array(
                [
                    losses[idx == b].mean() if (idx == b).any() else np.nan
                    for b in range(self.number_of_bins)
                ]
            )
            fig, ax = plt.subplots(figsize=(6, 4))
            centers = 0.5 * (bins[:-1] + bins[1:])
            ax.scatter(sigmas, losses, s=4, alpha=0.3, label="per sample")
            ax.plot(centers, means, color="red", label="bin mean")
            ax.set_xlabel("$\\sigma(t)$")
            ax.set_ylabel("coordinates loss")
            ax.set_yscale("log")
            ax.legend()
            trainer.log_figure("loss_vs_sigma", fig, epoch)
            plt.close(fig)
        except ImportError:
            logger.warning("matplotlib unavailable; skipping loss-vs-sigma figure")


def create_all_callbacks(
    hyper_params: Dict[str, Any], spatial_dimension: int = 3
) -> Dict[str, Callback]:
    """Instantiate the optional callbacks present in the experiment config."""
    callbacks: Dict[str, Callback] = {}
    if "early_stopping" in hyper_params:
        cfg = dict(hyper_params["early_stopping"])
        callbacks["early_stopping"] = EarlyStopping(
            metric=cfg.get("metric", "validation_epoch_loss"),
            mode=cfg.get("mode", "min"),
            patience=cfg.get("patience", 10),
        )
    if "loss_monitoring" in hyper_params:
        cfg = dict(hyper_params["loss_monitoring"])
        callbacks["loss_monitoring"] = LossMonitoringCallback(
            number_of_bins=cfg.get("number_of_bins", 50),
            sample_every_n_epochs=cfg.get("sample_every_n_epochs", 25),
            spatial_dimension=spatial_dimension,
        )
    if "score_viewer" in hyper_params:
        from .score_viewer_callback import instantiate_score_viewer_callback

        callbacks["score_viewer"] = instantiate_score_viewer_callback(
            hyper_params["score_viewer"], hyper_params
        )
    return callbacks
