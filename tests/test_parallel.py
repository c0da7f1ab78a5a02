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


@pytest.mark.slow
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


@pytest.mark.slow
def test_data_parallel_train_step_runs(mesh):
    """The sharded train step executes and produces finite grads/loss."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_data_parallel_train_step_matches_single_device(mesh):
    """One train step on the 8-device data mesh produces the same loss and
    updated parameters as the unsharded step on the identical batch/key —
    sharding is an execution detail, not a numerics change.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    from diffusion_for_multi_scale_molecular_dynamics_tpu.loss import (
        create_loss_parameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
        EGNNScoreNetwork,
        EGNNScoreNetworkConfig,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        NOISE,
        TIME,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.diffusion_model import (
        AXLDiffusionConfig,
        make_generic_step,
        make_train_step,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.optimizer import (
        OptimizerParameters,
        load_optimizer,
    )

    n_devices = len(mesh.devices.ravel())
    batch_size, natoms = 2 * n_devices, 4
    network_config = EGNNScoreNetworkConfig(
        num_atom_types=1,
        n_layers=2,
        message_hidden_dimensions_size=8,
        node_hidden_dimensions_size=8,
        coordinate_hidden_dimensions_size=8,
    )
    network = EGNNScoreNetwork(network_config)
    diffusion_config = AXLDiffusionConfig(
        score_network_config=network_config,
        loss_parameters=create_loss_parameters({}),
        noise_parameters=NoiseParameters(total_time_steps=10),
        use_fixed_lattice_parameters=False,
    )
    generic_step = make_generic_step(network, diffusion_config)
    optimizer = load_optimizer(OptimizerParameters(learning_rate=1e-3))
    train_step = make_train_step(
        lambda p, b, k: generic_step(p, b, k, conditional=False), optimizer
    )

    rng = np.random.RandomState(7)
    x = rng.uniform(size=(batch_size, natoms, 3)).astype(np.float32)
    host_batch = {
        RELATIVE_COORDINATES: x,
        ATOM_TYPES: np.zeros((batch_size, natoms), np.int32),
        LATTICE_PARAMETERS: np.concatenate(
            [5.43 * np.ones((batch_size, 3)), np.zeros((batch_size, 3))], -1
        ).astype(np.float32),
        CARTESIAN_FORCES: np.zeros_like(x),
    }
    init_batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.asarray(host_batch[ATOM_TYPES]),
            X=jnp.asarray(x),
            L=jnp.asarray(host_batch[LATTICE_PARAMETERS]),
        ),
        TIME: jnp.ones((batch_size, 1)),
        NOISE: jnp.full((batch_size, 1), 0.5),
        CARTESIAN_FORCES: jnp.zeros_like(jnp.asarray(x)),
    }
    params = network.init(jax.random.PRNGKey(0), init_batch, False)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(1)

    jitted = jax.jit(train_step)
    ref_params, _, ref_aux = jitted(params, opt_state, host_batch, key)

    batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
    replicated = NamedSharding(mesh, PartitionSpec())
    sharded_batch = {
        k: jax.device_put(v, batch_sharding) for k, v in host_batch.items()
    }
    sharded_params = jax.device_put(params, replicated)
    sharded_opt = jax.device_put(opt_state, replicated)
    sharded_key = jax.device_put(key, replicated)
    out_params, _, out_aux = jitted(
        sharded_params, sharded_opt, sharded_batch, sharded_key
    )

    np.testing.assert_allclose(
        float(out_aux["loss"]), float(ref_aux["loss"]), rtol=1e-5
    )
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    flat_out = jax.tree_util.tree_leaves(out_params)
    for a, b in zip(flat_ref, flat_out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
