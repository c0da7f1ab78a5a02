"""The diffusing-cell image-coverage guard must fail loudly, not silently.

PARITY "Known gaps" (closed round 4): a fixed image_shells pair grid
covers displacements up to (s + 1/2) x box; a diffusing cell below
radial_cutoff / (s + 1/2) would silently drop in-cutoff images. The guard
(ops/geometry.py::image_coverage_nan_guard) NaN-poisons exactly the
violating samples.
"""

import jax.numpy as jnp
import numpy as np

from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.geometry import (
    image_coverage_nan_guard,
)


def test_covered_samples_pass_through():
    values = jnp.ones((2, 4, 4))
    lengths = jnp.asarray([[5.43] * 3, [6.0] * 3])
    out = image_coverage_nan_guard(values, lengths, radial_cutoff=4.5,
                                   image_shells=1)
    np.testing.assert_array_equal(np.asarray(out), np.ones((2, 4, 4)))


def test_uncovered_sample_is_nan_poisoned_per_sample():
    values = jnp.ones((3, 4, 4))
    # coverage = 1.5 * min(box): 2.9 A box -> 4.35 < 4.5 cutoff (violation),
    # 3.1 A box -> 4.65 >= 4.5 (fine). The anisotropic cell uses its min.
    lengths = jnp.asarray([[2.9] * 3, [3.1] * 3, [8.0, 8.0, 2.9]])
    out = np.asarray(
        image_coverage_nan_guard(values, lengths, radial_cutoff=4.5,
                                 image_shells=1)
    )
    assert np.isnan(out[0]).all()
    assert np.isfinite(out[1]).all()
    assert np.isnan(out[2]).all()


def test_min_image_path_uses_half_box():
    values = jnp.ones((2, 3, 3))
    lengths = jnp.asarray([[8.0] * 3, [16.0] * 3])
    out = np.asarray(
        image_coverage_nan_guard(values, lengths, radial_cutoff=7.5,
                                 image_shells=0)
    )
    assert np.isnan(out[0]).all()  # 0.5 * 8 = 4 < 7.5
    assert np.isfinite(out[1]).all()  # 0.5 * 16 = 8 >= 7.5


def test_equivariant_network_poisons_small_cell_scores():
    import jax

    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.equivariant_score_network import (
        EquivariantScoreNetwork,
        EquivariantScoreNetworkConfig,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL,
        CARTESIAN_FORCES,
        NOISE,
        NOISY_AXL_COMPOSITION,
        TIME,
    )

    config = EquivariantScoreNetworkConfig(
        num_atom_types=1,
        num_features=8,
        number_of_interactions=1,
        radial_cutoff=4.5,
    )
    network = EquivariantScoreNetwork(config)
    batch_size, n = 2, 4
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch_size, n, 3))

    def make_batch(box):
        lattice = jnp.concatenate(
            [jnp.full((batch_size, 3), box), jnp.zeros((batch_size, 3))], -1
        )
        return {
            NOISY_AXL_COMPOSITION: AXL(
                A=jnp.zeros((batch_size, n), jnp.int32), X=x, L=lattice
            ),
            TIME: jnp.full((batch_size, 1), 0.5),
            NOISE: jnp.full((batch_size, 1), 0.1),
            CARTESIAN_FORCES: jnp.zeros_like(x),
        }

    params = network.init(jax.random.PRNGKey(1), make_batch(5.43), False)
    healthy = network.apply(params, make_batch(5.43), False)
    assert np.isfinite(np.asarray(healthy.X)).all()

    # 2.5 A cell: coverage 1.5 * 2.5 = 3.75 < 4.5 -> loud NaN, not silent
    # physics with dropped images.
    poisoned = network.apply(params, make_batch(2.5), False)
    assert np.isnan(np.asarray(poisoned.X)).all()
