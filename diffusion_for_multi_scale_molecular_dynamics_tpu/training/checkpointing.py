"""Orbax checkpointing: best + last policy with resume.

(reference equivalent: Lightning ModelCheckpoint best+last,
src/diffusion_for_multi_scale_molecular_dynamics/callbacks/standard_callbacks.py:28-53,
and trainer.fit(ckpt_path="last"), train_diffusion.py:198)
"""

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

BEST_MODEL_DIR = "best_model"
LAST_MODEL_DIR = "last_model"


class CheckpointManager:
    """Saves {params, opt_state, epoch, key, monitor} as best/last checkpoints."""

    def __init__(self, output_directory: str, monitor: str = "validation_epoch_loss",
                 mode: str = "min"):
        assert mode in ("min", "max")
        self.monitor = monitor
        self.mode = mode
        self._best_value: Optional[float] = None
        self._root = os.path.abspath(output_directory)
        self._checkpointer = ocp.StandardCheckpointer()
        os.makedirs(self._root, exist_ok=True)

    def _save(self, directory: str, state: Dict[str, Any]) -> None:
        path = os.path.join(self._root, directory)
        self._checkpointer.save(path, state, force=True)
        # StandardCheckpointer.save is async; wait so "last" is always valid.
        self._checkpointer.wait_until_finished()

    def _is_improvement(self, value: float) -> bool:
        if self._best_value is None:
            return True
        return value < self._best_value if self.mode == "min" else value > self._best_value

    def save_epoch(
        self, state: Dict[str, Any], monitored_value: Optional[float]
    ) -> bool:
        """Save 'last'; save 'best' too when the monitored metric improves.

        Returns:
            True when this epoch became the new best.
        """
        self._save(LAST_MODEL_DIR, state)
        became_best = False
        if monitored_value is not None and self._is_improvement(monitored_value):
            self._best_value = float(monitored_value)
            self._save(BEST_MODEL_DIR, state)
            became_best = True
        return became_best

    def restore_last(self, template_state: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """Restore the 'last' checkpoint if present (resume), else None."""
        path = os.path.join(self._root, LAST_MODEL_DIR)
        if not os.path.exists(path):
            return None
        restored = self._checkpointer.restore(path, template_state)
        logger.info("Resumed from %s", path)
        return restored

    def restore_best(self, template_state: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        path = os.path.join(self._root, BEST_MODEL_DIR)
        if not os.path.exists(path):
            return None
        return self._checkpointer.restore(path, template_state)
