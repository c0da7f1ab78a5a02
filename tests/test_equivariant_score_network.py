"""Tests of the scalar+vector equivariant network (diffusion_mace/mace slots)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    NOISY_AXL_COMPOSITION,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
    EquivariantScoreNetwork,
    EquivariantScoreNetworkConfig,
    create_score_network,
    create_score_network_config,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.lattice_shells import (
    get_cubic_point_group_symmetries,
)
from tests.test_equivariance import make_batch, rotate_torus

NUM_TYPES = 1


@pytest.fixture(scope="module")
def network_and_params():
    cfg = EquivariantScoreNetworkConfig(
        num_atom_types=NUM_TYPES,
        num_features=16,
        number_of_interactions=2,
        radial_cutoff=3.0,
    )
    net = EquivariantScoreNetwork(cfg)
    key = jax.random.PRNGKey(0)
    params = net.init(key, make_batch(key), False)
    return net, params


def test_forward_shapes_and_mask_logit(network_and_params, rng_key):
    net, params = network_and_params
    batch = make_batch(rng_key)
    out = jax.jit(net.apply, static_argnums=2)(params, batch, False)
    b, n, d = batch[NOISY_AXL_COMPOSITION].X.shape
    assert out.X.shape == (b, n, d)
    assert out.A.shape == (b, n, NUM_TYPES + 1)
    assert np.all(np.asarray(out.A[..., -1]) == -np.inf)
    assert np.isfinite(np.asarray(out.X)).all()
    assert np.abs(np.asarray(out.X)).max() > 0
    assert (np.asarray(out.L) == 0).all()


def test_translation_invariance(network_and_params, rng_key):
    net, params = network_and_params
    batch = make_batch(rng_key)
    out = net.apply(params, batch, False)
    comp = batch[NOISY_AXL_COMPOSITION]
    translated = dict(batch)
    translated[NOISY_AXL_COMPOSITION] = comp._replace(
        X=jnp.remainder(comp.X + jnp.array([0.31, 0.07, 0.55]), 1.0)
    )
    out_t = net.apply(params, translated, False)
    np.testing.assert_allclose(np.asarray(out_t.X), np.asarray(out.X), atol=2e-5)


def test_rotation_equivariance(network_and_params, rng_key):
    net, params = network_and_params
    batch = make_batch(rng_key)
    out = net.apply(params, batch, False)
    comp = batch[NOISY_AXL_COMPOSITION]
    for rotation in get_cubic_point_group_symmetries(3).astype(np.float64)[[7, 21]]:
        rotated = dict(batch)
        rotated[NOISY_AXL_COMPOSITION] = comp._replace(
            X=rotate_torus(comp.X, rotation)
        )
        out_r = net.apply(params, rotated, False)
        np.testing.assert_allclose(
            np.asarray(out_r.X), np.asarray(out.X) @ rotation.T, atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_r.A)[..., :-1], np.asarray(out.A)[..., :-1], atol=5e-5
        )


def test_permutation_equivariance(network_and_params, rng_key):
    net, params = network_and_params
    batch = make_batch(rng_key)
    out = net.apply(params, batch, False)
    perm = np.array([2, 3, 1, 0])
    comp = batch[NOISY_AXL_COMPOSITION]
    permuted = dict(batch)
    permuted[NOISY_AXL_COMPOSITION] = comp._replace(
        A=comp.A[:, perm], X=comp.X[:, perm]
    )
    out_p = net.apply(params, permuted, False)
    np.testing.assert_allclose(
        np.asarray(out_p.X), np.asarray(out.X)[:, perm], atol=2e-5
    )


def test_mlp_head_and_factory(rng_key):
    global_cfg = dict(elements=["Si"], max_atom=4, spatial_dimension=3)
    for architecture in ("diffusion_mace", "mace"):
        net = create_score_network(
            create_score_network_config(
                dict(
                    architecture=architecture,
                    num_features=8,
                    number_of_interactions=1,
                    radial_cutoff=3.0,
                    prediction_head="mlp",
                ),
                global_cfg,
            )
        )
        batch = make_batch(rng_key)
        params = net.init(rng_key, batch, False)
        out = net.apply(params, batch, False)
        assert np.isfinite(np.asarray(out.X)).all()


def test_pretrained_loading_raises():
    with pytest.raises(NotImplementedError):
        EquivariantScoreNetworkConfig(
            num_atom_types=1, use_pretrained="small"
        )
