"""Symmetry property tests for score networks.

The score field on the torus must be:
  * invariant under rigid translations (covered in test_score_networks too),
  * equivariant under atom permutations,
  * equivariant under cubic point-group operations about an invariant center
    (x -> wrap(R (x - c) + c) with c = (1/2, ..., 1/2) maps the torus onto
    itself; scores rotate with R).

(the reference's most valuable test pattern:
 tests/models/score_network/test_score_network_equivariance.py:388-470)
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
    AnalyticalScoreNetwork,
    AnalyticalScoreNetworkConfig,
    EGNNScoreNetwork,
    EGNNScoreNetworkConfig,
    EquivariantAnalyticalScoreNetwork,
    EquivariantAnalyticalScoreNetworkConfig,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.lattice_shells import (
    get_cubic_point_group_symmetries,
)

BATCH, NATOMS, D, NUM_TYPES = 2, 4, 3, 1
CENTER = 0.5


def make_batch(key, cubic_cell=True):
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (BATCH, NATOMS, D))
    a = jax.random.randint(k2, (BATCH, NATOMS), 0, NUM_TYPES + 1)
    lattice = jnp.concatenate(
        [5.43 * jnp.ones((BATCH, D)), jnp.zeros((BATCH, D))], axis=-1
    )
    return {
        NOISY_AXL_COMPOSITION: AXL(A=a, X=x, L=lattice),
        TIME: jnp.full((BATCH, 1), 0.4),
        NOISE: jnp.full((BATCH, 1), 0.3),
        CARTESIAN_FORCES: jnp.zeros_like(x),
    }


def rotate_torus(x, rotation):
    """x -> wrap(R (x - c) + c): a torus automorphism for cubic R."""
    centered = np.asarray(x) - CENTER
    rotated = centered @ np.asarray(rotation).T + CENTER
    return jnp.asarray(np.mod(rotated, 1.0))


@pytest.fixture(scope="module")
def egnn():
    cfg = EGNNScoreNetworkConfig(num_atom_types=NUM_TYPES, n_layers=2)
    net = EGNNScoreNetwork(cfg)
    key = jax.random.PRNGKey(0)
    params = net.init(key, make_batch(key), False)
    return lambda batch: net.apply(params, batch, False)


def test_egnn_rotation_equivariance(egnn, rng_key):
    batch = make_batch(rng_key)
    out = egnn(batch)

    symmetries = get_cubic_point_group_symmetries(D).astype(np.float64)
    # a handful of non-trivial operations
    for rotation in symmetries[[5, 17, 33]]:
        rotated_batch = dict(batch)
        comp = batch[NOISY_AXL_COMPOSITION]
        rotated_batch[NOISY_AXL_COMPOSITION] = comp._replace(
            X=rotate_torus(comp.X, rotation)
        )
        out_rot = egnn(rotated_batch)
        expected_scores = np.asarray(out.X) @ rotation.T
        np.testing.assert_allclose(
            np.asarray(out_rot.X), expected_scores, atol=2e-5
        )
        # atom-type logits are scalars: invariant
        np.testing.assert_allclose(
            np.asarray(out_rot.A)[..., :-1],
            np.asarray(out.A)[..., :-1],
            atol=2e-5,
        )


def test_analytical_networks_permutation_equivariance(rng_key):
    equilibrium = [[0.2, 0.3, 0.4], [0.6, 0.1, 0.8], [0.4, 0.9, 0.2], [0.7, 0.6, 0.5]]
    perm = np.array([2, 0, 3, 1])

    base_kwargs = dict(
        num_atom_types=NUM_TYPES,
        number_of_atoms=NATOMS,
        kmax=3,
        equilibrium_relative_coordinates=equilibrium,
        sigma_d=0.05,
    )
    networks = [
        AnalyticalScoreNetwork(
            AnalyticalScoreNetworkConfig(
                **base_kwargs, use_permutation_invariance=True
            )
        ),
        EquivariantAnalyticalScoreNetwork(
            EquivariantAnalyticalScoreNetworkConfig(**base_kwargs)
        ),
    ]
    batch = make_batch(rng_key)
    comp = batch[NOISY_AXL_COMPOSITION]
    permuted_batch = dict(batch)
    permuted_batch[NOISY_AXL_COMPOSITION] = comp._replace(
        A=comp.A[:, perm], X=comp.X[:, perm]
    )

    for net in networks:
        out = net.apply({}, batch, False)
        out_perm = net.apply({}, permuted_batch, False)
        np.testing.assert_allclose(
            np.asarray(out_perm.X),
            np.asarray(out.X)[:, perm],
            atol=1e-4,
            err_msg=type(net).__name__,
        )
