"""Sharding tests on the virtual 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    ATOM_MASK,
    ATOM_TYPES,
    AXL,
    CARTESIAN_FORCES,
    LATTICE_PARAMETERS,
    NOISY_AXL_COMPOSITION,
    RELATIVE_COORDINATES,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.parallel.mesh import (
    make_data_mesh,
    shard_batch,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.parallel.sharded_sampling import (
    shard_generator_over_mesh,
)


@pytest.fixture(scope="module")
def mesh():
    mesh = make_data_mesh()
    assert mesh is not None, "tests expect the 8-device virtual CPU mesh"
    return mesh


def test_shard_batch_places_leading_axis(mesh):
    batch = {
        RELATIVE_COORDINATES: np.random.rand(16, 4, 3).astype(np.float32),
        ATOM_TYPES: np.zeros((16, 4), np.int32),
    }
    sharded = shard_batch(batch, mesh)
    sharding = sharded[RELATIVE_COORDINATES].sharding
    assert sharding.is_fully_replicated is False
    # Each device holds 16/8 = 2 samples.
    shard_shape = sharding.shard_shape(sharded[RELATIVE_COORDINATES].shape)
    assert shard_shape[0] == 2

    with pytest.raises(AssertionError):
        shard_batch({ATOM_TYPES: np.zeros((5, 4), np.int32)}, mesh)


def test_sharded_sampling_matches_single_device(mesh):
    """The sharded PC trajectory must produce the same samples bit-for-bit."""
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )

    def mock_network(batch):
        composition = batch[NOISY_AXL_COMPOSITION]
        b, n = composition.A.shape
        logits = jnp.zeros((b, n, 2)).at[..., 0].set(5.0).at[..., -1].set(-jnp.inf)
        return AXL(
            A=logits,
            X=0.1 * jnp.sin(2 * jnp.pi * composition.X),
            L=jnp.zeros_like(composition.L),
        )

    def build():
        return LangevinGenerator(
            NoiseParameters(total_time_steps=6, sigma_min=0.01, sigma_max=0.4),
            PredictorCorrectorSamplingParameters(
                num_atom_types=1,
                number_of_atoms=4,
                number_of_samples=16,
                number_of_corrector_steps=1,
                use_fixed_lattice_parameters=True,
                cell_dimensions=[5.0, 5.0, 5.0],
            ),
            mock_network,
        )

    key = jax.random.PRNGKey(0)
    plain = build().sample(key, 16)

    sharded_generator = build()
    shard_generator_over_mesh(sharded_generator, mesh)
    sharded = sharded_generator.sample(key, 16)

    assert not sharded.X.sharding.is_fully_replicated
    np.testing.assert_allclose(
        np.asarray(sharded.X), np.asarray(plain.X), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(sharded.A), np.asarray(plain.A))


def test_data_parallel_train_step_runs(mesh):
    """The sharded train step executes and produces finite grads/loss."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
