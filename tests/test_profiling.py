import logging
import time
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.profiling import (
    PhaseTimer,
)


def test_phase_timer_accumulates():
    timer = PhaseTimer()
    for _ in range(3):
        with timer.phase("work"):
            time.sleep(0.01)
    with timer.phase("other"):
        pass
    summary = timer.summary()
    assert summary["work"]["count"] == 3
    assert summary["work"]["total_s"] >= 0.03
    assert summary["other"]["count"] == 1
    timer.log_summary()
    timer.reset()
    assert not timer.summary()


@pytest.mark.slow
def test_trainer_records_phase_timings(tmp_path):
    import yaml

    from tests.test_train_diffusion import make_config
    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import main

    config = make_config(tmp_path, max_epoch=1)
    path = tmp_path / "config.yaml"
    with open(path, "w") as fh:
        yaml.safe_dump(config, fh)
    main(["--config", str(path), "--output", str(tmp_path / "out")])
    # fit() logs the phase summary; presence of timing lines in console.log
    content = (tmp_path / "out" / "console.log").read_text()
    assert "phase train_step" in content
    assert "phase validation" in content
