"""Unit tests for the best/last checkpoint policy (training/checkpointing.py).

The reference's ModelCheckpoint semantics (standard_callbacks.py:28-53):
'last' is always rewritten, 'best' only on monitored-metric improvement with
min/max modes, and resume restores the exact state.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.training.checkpointing import (
    CheckpointManager,
)


def make_state(value: float):
    return {
        "params": {"dense": {"kernel": jnp.full((3, 2), value)}},
        "epoch": np.asarray(int(value)),
    }


class TestCheckpointManager:
    def test_best_tracks_min_mode(self, tmp_path):
        manager = CheckpointManager(str(tmp_path), monitor="loss", mode="min")
        assert manager.save_epoch(make_state(1.0), 0.5)  # first is best
        assert not manager.save_epoch(make_state(2.0), 0.7)  # worse
        assert manager.save_epoch(make_state(3.0), 0.3)  # better

        template = make_state(0.0)
        best = manager.restore_best(template)
        last = manager.restore_last(template)
        assert int(best["epoch"]) == 3
        assert int(last["epoch"]) == 3
        np.testing.assert_allclose(
            np.asarray(best["params"]["dense"]["kernel"]), 3.0
        )

    def test_best_tracks_max_mode(self, tmp_path):
        manager = CheckpointManager(str(tmp_path), monitor="acc", mode="max")
        manager.save_epoch(make_state(1.0), 0.5)
        assert manager.save_epoch(make_state(2.0), 0.9)
        assert not manager.save_epoch(make_state(3.0), 0.1)
        best = manager.restore_best(make_state(0.0))
        assert int(best["epoch"]) == 2
        # 'last' is still the most recent epoch regardless of the metric.
        assert int(manager.restore_last(make_state(0.0))["epoch"]) == 3

    def test_none_metric_saves_last_only(self, tmp_path):
        manager = CheckpointManager(str(tmp_path))
        assert not manager.save_epoch(make_state(1.0), None)
        assert manager.restore_best(make_state(0.0)) is None
        assert int(manager.restore_last(make_state(0.0))["epoch"]) == 1

    def test_restore_on_empty_directory_returns_none(self, tmp_path):
        manager = CheckpointManager(str(tmp_path))
        assert manager.restore_last(make_state(0.0)) is None
        assert manager.restore_best(make_state(0.0)) is None

    def test_invalid_mode_rejected(self, tmp_path):
        with pytest.raises(AssertionError):
            CheckpointManager(str(tmp_path), mode="sideways")
