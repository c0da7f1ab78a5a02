"""Smoke test of the training CLI on a tiny Gaussian problem.

(the reference's equivalent: tests/test_train_diffusion.py, an end-to-end
main() run on fake data with checkpoint and restart checks)
"""

import os

import numpy as np
import pytest
import yaml


def make_config(tmp_path, max_epoch=2):
    return {
        "exp_name": "smoke",
        "max_epoch": max_epoch,
        "log_every_n_steps": 1,
        "seed": 1234,
        "elements": ["Si"],
        "spatial_dimension": 3,
        "data": {
            "data_source": "gaussian",
            "batch_size": 16,
            "max_atom": 2,
            "number_of_atoms": 2,
            "random_seed": 42,
            "sigma_d": 0.01,
            "equilibrium_relative_coordinates": [[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]],
            "train_dataset_size": 64,
            "valid_dataset_size": 32,
            "use_fixed_lattice_parameters": True,
            "noise": {
                "total_time_steps": 10,
                "sigma_min": 0.001,
                "sigma_max": 0.5,
            },
        },
        "model": {
            "loss": {
                "coordinates": {"algorithm": "mse", "lambda_weight": 1.0},
                "atom_types": {"algorithm": "d3pm", "lambda_weight": 1.0},
                "lattice_parameters": {"algorithm": "mse", "lambda_weight": 0.0},
            },
            "score_network": {
                "architecture": "mlp",
                "number_of_atoms": 2,
                "n_hidden_dimensions": 2,
                "hidden_dimensions_size": 16,
                "noise_embedding_dimensions_size": 8,
                "relative_coordinates_embedding_dimensions_size": 8,
                "time_embedding_dimensions_size": 8,
                "atom_type_embedding_dimensions_size": 8,
                "lattice_parameters_embedding_dimensions_size": 8,
            },
        },
        "optimizer": {"name": "adamw", "learning_rate": 0.001},
        "scheduler": {"name": "CosineAnnealingLR", "t_max": 10},
        "early_stopping": {
            "metric": "validation_epoch_loss",
            "mode": "min",
            "patience": 10,
        },
        "model_checkpoint": {"monitor": "validation_epoch_loss", "mode": "min"},
        "logging": ["csv"],
    }


@pytest.fixture
def config_path(tmp_path):
    path = tmp_path / "config.yaml"
    with open(path, "w") as fh:
        yaml.safe_dump(make_config(tmp_path), fh)
    return str(path)


def test_train_diffusion_smoke_and_resume(tmp_path, config_path):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import main

    output = str(tmp_path / "output")
    main(["--config", config_path, "--output", output])

    # checkpoints, config backup and metrics must exist
    assert os.path.isdir(os.path.join(output, "last_model"))
    assert os.path.isdir(os.path.join(output, "best_model"))
    assert os.path.exists(os.path.join(output, "config_backup.yaml"))
    metrics_file = os.path.join(output, "metrics.csv")
    assert os.path.exists(metrics_file)

    with open(metrics_file) as fh:
        content = fh.read()
    assert "validation_epoch_loss" in content

    # Resume: raising max_epoch in the config must be rejected (config drift),
    # rerunning with the same config must start from the checkpointed epoch.
    main(["--config", config_path, "--output", output])  # no-op resume, no crash

    bad_config = make_config(tmp_path, max_epoch=5)
    bad_path = tmp_path / "config2.yaml"
    with open(bad_path, "w") as fh:
        yaml.safe_dump(bad_config, fh)
    with pytest.raises(ValueError):
        main(["--config", str(bad_path), "--output", output])


@pytest.mark.slow
def test_train_diffusion_with_ema(tmp_path):
    """EMA training: ema_params tracked, checkpointed, and preferred on restore."""
    import numpy as np

    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import main
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    config = make_config(tmp_path)
    config["optimizer"]["ema_decay"] = 0.9
    path = tmp_path / "config_ema.yaml"
    with open(path, "w") as fh:
        yaml.safe_dump(config, fh)
    output = str(tmp_path / "output_ema")
    main(["--config", str(path), "--output", output])

    # The orbax checkpoint must carry ema_params distinct from params.
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as checkpointer:
        metadata = checkpointer.metadata(
            os.path.join(output, "last_model")
        ).item_metadata
        restore_args = __import__("jax").tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), metadata.tree
        )
        restored = checkpointer.restore(
            os.path.join(output, "last_model"),
            args=ocp.args.PyTreeRestore(restore_args=restore_args),
        )
    assert "ema_params" in restored
    raw_leaves = __import__("jax").tree_util.tree_leaves(restored["params"])
    ema_leaves = __import__("jax").tree_util.tree_leaves(restored["ema_params"])
    assert any(
        not np.allclose(r, e) for r, e in zip(raw_leaves, ema_leaves)
    ), "EMA parameters never diverged from the raw parameters"

    # restore must prefer the EMA weights and produce a working network.
    axl_network = load_axl_network_from_checkpoint(output, prefer="last")
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL,
        CARTESIAN_FORCES,
        NOISE,
        NOISY_AXL_COMPOSITION,
        TIME,
    )
    import jax.numpy as jnp

    batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((1, 2), jnp.int32),
            X=jnp.full((1, 2, 3), 0.3),
            L=jnp.ones((1, 6)),
        ),
        TIME: jnp.full((1, 1), 0.5),
        NOISE: jnp.full((1, 1), 0.1),
        CARTESIAN_FORCES: jnp.zeros((1, 2, 3)),
    }
    out = axl_network(batch)
    assert np.isfinite(np.asarray(out.X)).all()

    # resume with EMA enabled must not crash.
    main(["--config", str(path), "--output", output])


def test_warn_on_unknown_top_level_keys(caplog):
    """Unknown config keys warn; the reference trainer knobs count as known.

    (reference behavior: Lightning accepts/ignores extra hydra keys silently;
    this CLI instead surfaces them as a migration aid — PARITY.md 'config-key
    warnings'.)
    """
    import logging

    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import (
        warn_on_unknown_top_level_keys,
    )

    # Reference trainer-level knobs supported since round 3 must NOT warn.
    known = {
        "exp_name": "e",
        "run_name": "r",
        "accumulate_grad_batches": 4,
        "gradient_clipping": 0.1,
        "max_epoch": 2,
    }
    with caplog.at_level(logging.WARNING):
        warn_on_unknown_top_level_keys(known)
    assert not caplog.records

    with caplog.at_level(logging.WARNING):
        warn_on_unknown_top_level_keys({**known, "max_epochs": 3, "trainer": {}})
    messages = [r.getMessage() for r in caplog.records]
    assert any("max_epochs" in m and "trainer" in m for m in messages)
