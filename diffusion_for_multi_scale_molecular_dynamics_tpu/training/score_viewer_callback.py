"""Score-viewer training callback: log the projected-score figure per epoch.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/callbacks/score_viewer_callback.py:25-104)
"""

import functools
import logging
from dataclasses import dataclass
from typing import Any, Dict

from ..analysis.score_viewer import ScoreViewer, ScoreViewerParameters
from ..models.analytical_score_network import AnalyticalScoreNetworkConfig
from .callbacks import Callback

logger = logging.getLogger(__name__)


@dataclass(kw_only=True)
class ScoreViewerCallbackParameters:
    record_every_n_epochs: int = 1
    score_viewer_parameters: ScoreViewerParameters = None
    analytical_score_network_config: AnalyticalScoreNetworkConfig = None


class ScoreViewerCallback(Callback):
    """Renders and logs the score-comparison figure on schedule."""

    def __init__(self, parameters: ScoreViewerCallbackParameters):
        self.parameters = parameters
        self.score_viewer = ScoreViewer(
            parameters.score_viewer_parameters,
            parameters.analytical_score_network_config,
        )

    def on_epoch_end(self, trainer, epoch: int, metrics: Dict[str, float]) -> None:
        if (epoch + 1) % self.parameters.record_every_n_epochs != 0:
            return
        score_fn = functools.partial(
            trainer.score_network.apply,
            getattr(trainer, "eval_params", trainer.params),
        )
        try:
            figure = self.score_viewer.create_figure(score_fn)
            trainer.log_figure("projected_scores", figure, epoch)
            import matplotlib.pyplot as plt

            plt.close(figure)
        except ImportError:
            logger.warning("matplotlib unavailable; skipping score viewer figure")


def instantiate_score_viewer_callback(
    callback_config: Dict[str, Any], global_config: Dict[str, Any]
) -> ScoreViewerCallback:
    """Build the callback from the experiment config's score_viewer block."""
    cfg = dict(callback_config)
    analytical_cfg = dict(cfg.pop("analytical_score_network"))
    analytical_cfg.setdefault("num_atom_types", len(global_config["elements"]))
    analytical_cfg.setdefault(
        "spatial_dimension", global_config.get("spatial_dimension", 3)
    )
    analytical_cfg.pop("architecture", None)
    parameters = ScoreViewerCallbackParameters(
        record_every_n_epochs=cfg.pop("record_every_n_epochs", 1),
        score_viewer_parameters=ScoreViewerParameters(
            **cfg.pop("score_viewer_parameters")
        ),
        analytical_score_network_config=AnalyticalScoreNetworkConfig(
            **analytical_cfg
        ),
    )
    return ScoreViewerCallback(parameters)
