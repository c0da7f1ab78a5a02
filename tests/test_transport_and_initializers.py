"""Tests for OT alignment (transport/) and trajectory initializers.

Translation of the reference's transport tests (tests/transport/
test_{optimal_translation,transporter}.py): the circular center of mass is
shift-equivariant on the torus, and the transporter recovers a scrambled
(translated / permuted / point-group-rotated) copy of a configuration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.trajectory_initializer import (
    FullRandomTrajectoryInitializer,
    StartFromGivenConfigurationTrajectoryInitializer,
    TrajectoryInitializerParameters,
    write_starting_configuration,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.symmetry import (
    get_cubic_point_group_symmetries,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.transport.transporter import (
    Transporter,
    get_geodesic_displacements,
)


class TestGeodesicDisplacements:
    def test_wraps_to_half_open_interval(self):
        x1 = jnp.asarray([[0.05, 0.95, 0.5]])
        x2 = jnp.asarray([[0.95, 0.05, 0.5]])
        d = np.asarray(get_geodesic_displacements(x1, x2))
        np.testing.assert_allclose(d, [[-0.1, 0.1, 0.0]], atol=1e-6)
        assert np.all(np.abs(d) <= 0.5)


class TestTransporter:
    @pytest.fixture
    def x(self):
        rng = np.random.default_rng(5)
        return jnp.asarray(rng.uniform(0, 1, (3, 8, 3)), dtype=jnp.float32)

    def test_circular_com_shift_equivariance(self, x):
        transporter = Transporter(jnp.eye(3)[None])
        com = np.asarray(transporter.get_atan2_translation(x))
        shift = np.asarray([0.2, -0.35, 0.43])
        shifted = jnp.asarray(np.mod(np.asarray(x) + shift, 1.0))
        com_shifted = np.asarray(transporter.get_atan2_translation(shifted))
        delta = com_shifted - com - shift
        delta -= np.round(delta)
        np.testing.assert_allclose(delta, 0.0, atol=1e-5)

    def test_recovers_translated_permutation(self, x):
        """mu = permute(translate(x)) must align back onto x exactly
        (reference tests/transport/test_transporter.py)."""
        transporter = Transporter(jnp.eye(3)[None])
        rng = np.random.default_rng(6)
        perm = rng.permutation(x.shape[1])
        mu = np.mod(np.asarray(x)[:, perm] + [0.31, -0.12, 0.27], 1.0)
        aligned = transporter.get_optimal_transport(
            x, jnp.asarray(mu, dtype=jnp.float32)
        )
        # The transporter returns the translation-invariant image (the
        # reference's get_optimal_transport does too, transporter.py:143-169):
        # the residual is a constant translation, zero after centering.
        residual = np.array(get_geodesic_displacements(aligned, x))
        residual -= residual.mean(axis=1, keepdims=True)
        np.testing.assert_allclose(residual, 0.0, atol=1e-4)

    def test_recovers_point_group_image(self, x):
        """With the cubic point group available, a rotated copy aligns back."""
        ops = jnp.asarray(get_cubic_point_group_symmetries(), dtype=jnp.float32)
        transporter = Transporter(ops)
        rotation = np.asarray(ops[17])
        # Rotations act about the cell center on fractional coordinates.
        mu = np.mod((np.asarray(x) - 0.5) @ rotation.T + 0.5, 1.0)
        aligned = transporter.get_optimal_transport(
            x, jnp.asarray(mu, dtype=jnp.float32)
        )
        residual = np.array(get_geodesic_displacements(aligned, x))
        # The transporter aligns translation-invariant shapes; the residual
        # must vanish after removing the relative toroidal center of mass.
        residual -= residual.mean(axis=1, keepdims=True)
        residual -= np.round(residual)
        np.testing.assert_allclose(residual, 0.0, atol=1e-3)

    def test_alignment_never_increases_cost(self, x):
        transporter = Transporter(jnp.eye(3)[None])
        rng = np.random.default_rng(7)
        mu = jnp.asarray(rng.uniform(0, 1, x.shape), dtype=jnp.float32)
        aligned = transporter.get_optimal_transport(x, mu)

        def centered_cost(a, b):
            d = np.array(get_geodesic_displacements(a, b))
            d -= d.mean(axis=1, keepdims=True)
            return float(np.sum(d**2))

        assert centered_cost(aligned, x) <= centered_cost(mu, x) + 1e-5


class TestTrajectoryInitializers:
    @pytest.fixture
    def params(self, tmp_path):
        return TrajectoryInitializerParameters(
            num_atom_types=2,
            number_of_atoms=5,
            use_fixed_lattice_parameters=True,
            fixed_lattice_parameters=np.asarray([8.0, 8.0, 8.0, 0, 0, 0]),
        )

    def test_full_random(self, params):
        init = FullRandomTrajectoryInitializer(params)
        composition = init.initialize(jax.random.PRNGKey(0), 4)
        assert composition.A.shape == (4, 5)
        # A = all MASK (index num_atom_types), X ~ U(0,1), L fixed.
        assert np.all(np.asarray(composition.A) == 2)
        x = np.asarray(composition.X)
        assert x.shape == (4, 5, 3) and (x >= 0).all() and (x < 1).all()
        np.testing.assert_allclose(
            np.asarray(composition.L), np.tile([8.0, 8.0, 8.0, 0, 0, 0], (4, 1))
        )
        assert init.create_start_time_step_index(100) == 100
        assert init.create_end_time_step_index() == 0

    def test_full_random_gaussian_lattice(self, params):
        from dataclasses import replace

        init = FullRandomTrajectoryInitializer(
            replace(params, use_fixed_lattice_parameters=False,
                    fixed_lattice_parameters=None)
        )
        composition = init.initialize(jax.random.PRNGKey(1), 64)
        lattice = np.asarray(composition.L)
        assert abs(lattice.mean()) < 0.3 and 0.7 < lattice.std() < 1.3

    def test_full_random_lattice_prior(self, params):
        """Diffusing-lattice prior N(mean, std) — the VE terminal marginal
        (beyond-reference; the upstream N(0,1) start is out of distribution
        for the sigma/n^(1/3)-scale forward process)."""
        from dataclasses import replace

        mean = np.asarray([5.43, 5.43, 5.43, 0.0, 0.0, 0.0])
        init = FullRandomTrajectoryInitializer(
            replace(
                params,
                use_fixed_lattice_parameters=False,
                fixed_lattice_parameters=None,
                lattice_parameters_prior_mean=mean,
                lattice_parameters_prior_std=0.1,
            )
        )
        composition = init.initialize(jax.random.PRNGKey(2), 256)
        lattice = np.asarray(composition.L)
        np.testing.assert_allclose(lattice.mean(axis=0), mean, atol=0.03)
        assert 0.07 < lattice.std(axis=0).mean() < 0.13

    def test_start_from_configuration_roundtrip(self, params, tmp_path):
        """write_starting_configuration -> initializer resumes at the index
        with the exact composition (reference trajectory_initializer.py:134)."""
        from dataclasses import replace

        rng = np.random.default_rng(8)
        composition = AXL(
            A=rng.integers(0, 3, (4, 5)),
            X=rng.uniform(0, 1, (4, 5, 3)).astype(np.float32),
            L=np.tile([8.0, 8.0, 8.0, 0, 0, 0], (4, 1)).astype(np.float32),
        )
        path = str(tmp_path / "start.pickle")
        write_starting_configuration(path, composition, 37)

        init = StartFromGivenConfigurationTrajectoryInitializer(
            replace(params, path_to_starting_configuration_data_pickle=path)
        )
        assert init.create_start_time_step_index(1000) == 37
        restored = init.initialize(jax.random.PRNGKey(0), 4)
        np.testing.assert_array_equal(np.asarray(restored.A), composition.A)
        np.testing.assert_allclose(
            np.asarray(restored.X), composition.X, atol=1e-7
        )
        with pytest.raises(AssertionError, match="starting configuration"):
            init.initialize(jax.random.PRNGKey(0), 8)
