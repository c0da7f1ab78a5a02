import csv

import jax.numpy as jnp
import numpy as np

from diffusion_for_multi_scale_molecular_dynamics_tpu.training.loggers import (
    CSVLogger,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.neighbors import (
    get_min_image_pair_distances,
    get_orthogonal_min_image_displacements,
)


def test_csv_logger_grows_header_and_survives_reload(tmp_path):
    logger = CSVLogger(str(tmp_path))
    logger.log_metrics({"train_step_loss": 1.0}, step=1)
    logger.log_metrics({"validation_epoch_loss": 0.5, "epoch": 0}, step=0)

    with open(tmp_path / "metrics.csv") as fh:
        rows = list(csv.DictReader(fh))
    assert rows[0]["train_step_loss"] == "1.0"
    assert rows[1]["validation_epoch_loss"] == "0.5"
    assert rows[0]["validation_epoch_loss"] == ""  # aligned union header

    # A new logger instance (resume) appends without corrupting history.
    resumed = CSVLogger(str(tmp_path))
    resumed.log_metrics({"validation_epoch_loss": 0.4, "epoch": 1}, step=1)
    with open(tmp_path / "metrics.csv") as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 3
    assert rows[0]["train_step_loss"] == "1.0"
    assert rows[2]["validation_epoch_loss"] == "0.4"


def test_orthogonal_min_image_matches_27_image_expansion():
    rng = np.random.RandomState(5)
    x = rng.uniform(size=(2, 6, 3)).astype(np.float32)
    cell = np.diag([5.0, 6.0, 7.0]).astype(np.float32)
    cells = np.tile(cell, (2, 1, 1))

    disp = get_orthogonal_min_image_displacements(
        jnp.asarray(x), jnp.asarray(cells)
    )
    fast_distances = np.linalg.norm(np.asarray(disp), axis=-1)

    reference = np.asarray(
        get_min_image_pair_distances(jnp.asarray(x @ cell), jnp.asarray(cells))
    )
    # Off-diagonal distances agree with the full 3^d-image expansion.
    off_diagonal = ~np.eye(6, dtype=bool)
    np.testing.assert_allclose(
        fast_distances[:, off_diagonal],
        reference[:, off_diagonal],
        atol=1e-5,
    )
    # Antisymmetry: disp[i, j] == -disp[j, i].
    np.testing.assert_allclose(
        np.asarray(disp),
        -np.transpose(np.asarray(disp), (0, 2, 1, 3)),
        atol=1e-6,
    )
