"""Regularizer tests: FP residual against an exact score field, consistency
and regression losses traced through the train step.

(the reference's analogue: tests/regularizers/* with a differentiable toy
score network)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    AXL,
    CARTESIAN_FORCES,
    NOISE,
    NOISY_AXL_COMPOSITION,
    TIME,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
    AnalyticalScoreNetworkConfig,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.regularizers.fokker_planck_regularizer import (
    FokkerPlanckRegularizer,
    FokkerPlanckRegularizerParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.regularizers.consistency_regularizer import (
    ConsistencyRegularizer,
    ConsistencyRegularizerParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.regularizers.regularizer_factory import (
    create_regularizer,
    create_regularizer_parameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
    PredictorCorrectorSamplingParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
)

BATCH, NATOMS, D = 3, 2, 3
SIGMA_MIN, SIGMA_MAX = 0.01, 0.5


def make_augmented_batch(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (BATCH, NATOMS, D))
    times = jax.random.uniform(k2, (BATCH, 1), minval=0.2, maxval=0.9)
    sigmas = SIGMA_MIN * (SIGMA_MAX / SIGMA_MIN) ** times
    lattice = jnp.concatenate([jnp.ones((BATCH, D)), jnp.zeros((BATCH, D))], -1)
    return {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((BATCH, NATOMS), jnp.int32), X=x, L=lattice
        ),
        TIME: times,
        NOISE: sigmas,
        CARTESIAN_FORCES: jnp.zeros_like(x),
    }


def gaussian_score_fn(batch):
    """Exact sigma-normalized score of an unwrapped Gaussian around x0 = 0.5.

    For data N(x0, sigma_d^2) noised with sigma(t), the (unwrapped) score is
    S = -(x - x0) / (sigma_d^2 + sigma^2); the network convention returns
    sigma * S. This field satisfies the FP equation exactly (far from the
    torus seam).
    """
    sigma_d = 0.1
    composition = batch[NOISY_AXL_COMPOSITION]
    sigma = batch[NOISE][:, :, None]
    score = -(composition.X - 0.5) / (sigma_d**2 + sigma**2)
    return AXL(
        A=jnp.zeros(composition.A.shape + (2,)),
        X=sigma * score,
        L=jnp.zeros_like(composition.L),
    )


@pytest.mark.parametrize("use_hte", [False, True])
def test_fokker_planck_residual_is_zero_for_exact_score(rng_key, use_hte):
    params = FokkerPlanckRegularizerParameters(
        batch_size=BATCH,
        sigma_min=SIGMA_MIN,
        sigma_max=SIGMA_MAX,
        use_hte_approximation=use_hte,
        number_of_hte_terms=4 if use_hte else 0,
    )
    regularizer = FokkerPlanckRegularizer(params)
    batch = make_augmented_batch(rng_key)
    residuals = regularizer.compute_score_fokker_planck_residuals(
        gaussian_score_fn, batch, jax.random.PRNGKey(1)
    )
    # The exact Gaussian score satisfies the FP equation; for the HTE variant
    # the estimator is exact here because the Hessian of a linear-in-x score
    # field is zero (any Rademacher projection vanishes).
    scale = np.abs(np.asarray(residuals)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(residuals), 0.0, atol=5e-3)


def test_fokker_planck_nonzero_for_wrong_score(rng_key):
    def wrong_score_fn(batch):
        out = gaussian_score_fn(batch)
        return out._replace(X=out.X + 0.3 * jnp.sin(out.X))

    params = FokkerPlanckRegularizerParameters(
        batch_size=BATCH, sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX
    )
    regularizer = FokkerPlanckRegularizer(params)
    loss = regularizer.compute_regularizer_loss(
        wrong_score_fn, make_augmented_batch(rng_key), jax.random.PRNGKey(1)
    )
    assert float(loss) > 1e-4


def test_consistency_regularizer_traces_and_is_finite(rng_key):
    noise_parameters = NoiseParameters(
        total_time_steps=8, sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX
    )
    sampling_parameters = PredictorCorrectorSamplingParameters(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        number_of_samples=BATCH,
        number_of_corrector_steps=0,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[1.0, 1.0, 1.0],
    )
    params = ConsistencyRegularizerParameters(
        maximum_number_of_steps=3,
        noise_parameters=noise_parameters,
        sampling_parameters=sampling_parameters,
    )
    regularizer = ConsistencyRegularizer(params)

    def score_fn(batch):
        out = gaussian_score_fn(batch)
        logits = jnp.zeros(batch[NOISY_AXL_COMPOSITION].A.shape + (2,))
        return out._replace(A=logits.at[..., -1].set(-jnp.inf))

    loss_fn = jax.jit(
        lambda batch, key: regularizer.compute_regularizer_loss(
            score_fn, batch, key
        )
    )
    loss = loss_fn(make_augmented_batch(rng_key), jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_regression_regularizer_factory_and_loss(rng_key):
    config = dict(
        type="regression",
        regularizer_lambda_weight=2.0,
        score_network=dict(
            architecture="analytical",
            number_of_atoms=NATOMS,
            kmax=2,
            equilibrium_relative_coordinates=[[0.25] * D, [0.75] * D],
            sigma_d=0.1,
        ),
    )
    global_params = dict(elements=["Si"], max_atom=NATOMS, spatial_dimension=D)
    parameters = create_regularizer_parameters(config, global_params)
    regularizer = create_regularizer(parameters)

    batch = make_augmented_batch(rng_key)
    loss = regularizer.compute_weighted_regularizer_loss(
        gaussian_score_fn, batch, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(loss)) and float(loss) > 0.0


@pytest.mark.slow
def test_training_with_fokker_planck_regularizer(tmp_path):
    """End-to-end: the train CLI runs with a regularizer configured."""
    import yaml

    from tests.test_train_diffusion import make_config
    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import main

    config = make_config(tmp_path, max_epoch=1)
    config["model"]["regularizer"] = dict(
        type="fokker_planck",
        regularizer_lambda_weight=0.01,
        batch_size=4,
        sigma_min=0.001,
        sigma_max=0.5,
    )
    path = tmp_path / "config.yaml"
    with open(path, "w") as fh:
        yaml.safe_dump(config, fh)
    output = str(tmp_path / "out")
    main(["--config", str(path), "--output", output])
    import csv

    with open(f"{output}/metrics.csv") as fh:
        rows = list(csv.DictReader(fh))
    reg_losses = [
        float(r["train_epoch_regularizer_loss"])
        for r in rows
        if r.get("train_epoch_regularizer_loss")
    ]
    assert reg_losses and all(np.isfinite(reg_losses))
    assert any(v != 0.0 for v in reg_losses)
