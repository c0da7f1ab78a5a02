"""End-to-end smoke test: train briefly, then sample via the sampling CLI.

(reference equivalent: tests/test_sample_diffusion.py)
"""

import os
import pickle

import numpy as np
import pytest
import yaml

from tests.test_train_diffusion import make_config


@pytest.mark.slow
def test_sample_diffusion_cli(tmp_path):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import (
        main as train_main,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.sample_diffusion import (
        main as sample_main,
    )

    train_config = make_config(tmp_path, max_epoch=1)
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as fh:
        yaml.safe_dump(train_config, fh)
    train_output = str(tmp_path / "train_output")
    train_main(["--config", str(config_path), "--output", train_output])

    sampling_config = {
        "elements": ["Si"],
        "noise": {"total_time_steps": 5, "sigma_min": 0.001, "sigma_max": 0.5},
        "sampling": {
            "algorithm": "predictor_corrector",
            "num_atom_types": 1,
            "number_of_atoms": 2,
            "number_of_samples": 4,
            "sample_batchsize": 2,
            "number_of_corrector_steps": 1,
            "use_fixed_lattice_parameters": True,
            "cell_dimensions": [5.43, 5.43, 5.43],
            "record_samples": True,
        },
        "oracle": {"name": "stillinger_weber", "sw_coeff_filename": "Si.sw"},
    }
    sampling_config_path = tmp_path / "sampling.yaml"
    with open(sampling_config_path, "w") as fh:
        yaml.safe_dump(sampling_config, fh)

    sample_output = str(tmp_path / "samples_output")
    sample_main(
        [
            "--config",
            str(sampling_config_path),
            "--checkpoint",
            train_output,
            "--output",
            sample_output,
        ]
    )

    with open(os.path.join(sample_output, "samples.pkl"), "rb") as fh:
        samples = pickle.load(fh)
    assert samples.X.shape == (4, 2, 3)
    assert ((samples.X >= 0) & (samples.X < 1)).all()
    assert (samples.A != 1).all()  # no MASK (Si id 0, MASK id 1)

    energies = np.load(os.path.join(sample_output, "energies.npz"))
    assert energies["energies"].shape == (4,)
    assert np.isfinite(energies["energies"]).all()

    assert os.path.exists(os.path.join(sample_output, "trajectories.pkl"))

    # Constrained (RePaint) sampling through the CLI: the constrained atom
    # must carry the exact requested coordinates and type in every sample.
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        SamplingConstraint,
        write_sampling_constraint,
    )

    constraint = SamplingConstraint(
        elements=["Si"],
        constrained_relative_coordinates=np.array([[0.3, 0.4, 0.5]], np.float32),
        constrained_atom_types=np.array([0], np.int32),
        constrained_indices=np.array([0], np.int32),
    )
    constraint_path = str(tmp_path / "constraint.pkl")
    write_sampling_constraint(constraint, constraint_path)

    constrained_output = str(tmp_path / "constrained_output")
    sample_main(
        [
            "--config",
            str(sampling_config_path),
            "--checkpoint",
            train_output,
            "--output",
            constrained_output,
            "--sampling-constraints",
            constraint_path,
        ]
    )
    with open(os.path.join(constrained_output, "samples.pkl"), "rb") as fh:
        constrained_samples = pickle.load(fh)
    np.testing.assert_allclose(
        constrained_samples.X[:, 0],
        np.tile([0.3, 0.4, 0.5], (4, 1)),
        atol=1e-6,
    )
    assert (constrained_samples.A[:, 0] == 0).all()
