"""Small-utility tests: trajectory recorder, hyperparameter checks, rsync.

(reference patterns: tests/utils/ for sample_trajectory and hp checks)
"""

import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.main_utils import (
    check_and_log_hp,
    is_orion_on,
    rsync_folder,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.sample_trajectory import (
    SampleTrajectory,
)


class TestSampleTrajectory:
    def test_record_and_pickle_roundtrip(self, tmp_path):
        recorder = SampleTrajectory()
        recorder.record("predictor_step", {"x": jnp.ones((2, 3)), "idx": 5})
        recorder.record("predictor_step", {"x": jnp.zeros((2, 3)), "idx": 4})
        recorder.record("corrector_step", {"eps": 1e-5})
        path = str(tmp_path / "trajectory.pickle")
        recorder.write_to_pickle(path)
        with open(path, "rb") as fh:
            data = pickle.load(fh)
        assert len(data["predictor_step"]) == 2
        # Device arrays land as host numpy in the artifact.
        assert isinstance(data["predictor_step"][0]["x"], np.ndarray)
        np.testing.assert_allclose(data["predictor_step"][0]["x"], 1.0)
        assert data["corrector_step"][0]["eps"] == 1e-5

    def test_reset_clears(self):
        recorder = SampleTrajectory()
        recorder.record("step", 1)
        recorder.reset()
        assert recorder.data == {}


class TestMainUtils:
    def test_orion_detection_follows_environment(self, monkeypatch):
        monkeypatch.delenv("ORION_TRIAL_ID", raising=False)
        assert not is_orion_on()
        monkeypatch.setenv("ORION_TRIAL_ID", "abc123")
        # True only when the orion package is importable (gated dependency,
        # like the reference's Orion integration).
        try:
            import orion.client  # noqa: F401
        except ImportError:
            assert not is_orion_on()
        else:
            assert is_orion_on()

    def test_check_and_log_hp_missing_key_raises(self):
        with pytest.raises(AssertionError, match="missing"):
            check_and_log_hp(["exp_name", "seed"], {"exp_name": "x"})
        check_and_log_hp(["exp_name"], {"exp_name": "x"})
        with pytest.raises(AssertionError, match="unexpected"):
            check_and_log_hp(
                ["exp_name"], {"exp_name": "x", "oops": 1}, allow_extra=False
            )

    @pytest.mark.skipif(
        __import__("shutil").which("rsync") is None,
        reason="rsync binary not available",
    )
    def test_rsync_folder_copies_tree(self, tmp_path):
        source = tmp_path / "src"
        (source / "sub").mkdir(parents=True)
        (source / "a.txt").write_text("alpha")
        (source / "sub" / "b.txt").write_text("beta")
        destination = tmp_path / "dst"
        rsync_folder(str(source), str(destination))
        copied_root = destination / source.name
        base = copied_root if copied_root.exists() else destination
        assert (base / "a.txt").read_text() == "alpha"
        assert (base / "sub" / "b.txt").read_text() == "beta"
