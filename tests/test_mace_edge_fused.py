"""Fused MACE edge block: dense reference parity, kernel parity, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.models.mace_edge_fused import (
    build_edge_block_meta,
    dense_edge_block,
    features_to_a_major,
    fused_edge_block,
    output_to_irreps_flat,
    pallas_edge_block,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.models.mace_modules import (
    RadialMLP,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.irreps_layers import (
    weighted_tensor_product,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.so3 import (
    Irreps,
    spherical_harmonics,
)

IRREPS_IN = "8x0e+8x1o"
IRREPS_TARGET = "8x0e+8x1o+8x2e+8x3o"
LMAX = 3
NUM_BESSEL = 8
B, N, K = 2, 4, 3
J = N * K


@pytest.fixture(scope="module")
def inputs():
    meta = build_edge_block_meta(IRREPS_IN, LMAX, IRREPS_TARGET)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 5)
    feats = jax.random.normal(keys[0], (B, N, Irreps(IRREPS_IN).dim))
    # Expanded sources: atom j repeated K times along the pair axis.
    feats_expanded = jnp.repeat(feats, K, axis=1)  # [B, J, F]
    unit = jax.random.normal(keys[1], (B, N, J, 3))
    unit = unit / jnp.linalg.norm(unit, axis=-1, keepdims=True)
    harmonics = spherical_harmonics(LMAX, unit)
    rb = jax.random.normal(keys[2], (B, N, J, NUM_BESSEL))
    mask = jax.random.bernoulli(keys[3], 0.8, (B, N, J))
    rb = rb * mask[..., None]  # masking contract: zero basis rows

    mlp = RadialMLP((16, 16), meta.n_paths * meta.channels)
    params = mlp.init(keys[4], rb)["params"]
    return meta, dict(params), rb, feats_expanded, harmonics, mask, mlp


def test_dense_block_matches_weighted_tensor_product(inputs):
    meta, params, rb, feats_expanded, harmonics, mask, mlp = inputs
    out4 = dense_edge_block(
        params, rb, features_to_a_major(feats_expanded, meta), harmonics, meta
    )
    flat = output_to_irreps_flat(out4, meta)

    w_all = mlp.apply({"params": params}, rb) * mask[..., None]
    source_feats = jnp.broadcast_to(
        feats_expanded[:, None], (B, N, J, feats_expanded.shape[-1])
    )
    messages = weighted_tensor_product(
        source_feats, harmonics, w_all, Irreps(IRREPS_IN), LMAX,
        Irreps(IRREPS_TARGET),
    )
    reference = jnp.sum(messages, axis=2)
    np.testing.assert_allclose(
        np.asarray(flat), np.asarray(reference), rtol=2e-5, atol=2e-5
    )


def test_pallas_kernel_matches_dense(inputs):
    meta, params, rb, feats_expanded, harmonics, _, _ = inputs
    f_a = features_to_a_major(feats_expanded, meta)
    dense = dense_edge_block(params, rb, f_a, harmonics, meta)
    kernel = pallas_edge_block(params, rb, f_a, harmonics, meta)
    np.testing.assert_allclose(
        np.asarray(kernel), np.asarray(dense), rtol=2e-5, atol=2e-5
    )


def test_custom_vjp_matches_dense_grad(inputs):
    meta, params, rb, feats_expanded, harmonics, _, _ = inputs
    f_a = features_to_a_major(feats_expanded, meta)

    def loss_fused(p, f):
        return jnp.sum(fused_edge_block(p, rb, f, harmonics, meta) ** 2)

    def loss_dense(p, f):
        return jnp.sum(dense_edge_block(p, rb, f, harmonics, meta) ** 2)

    gp_fused, gf_fused = jax.grad(loss_fused, argnums=(0, 1))(params, f_a)
    gp_dense, gf_dense = jax.grad(loss_dense, argnums=(0, 1))(params, f_a)
    for name in gp_dense:
        np.testing.assert_allclose(
            np.asarray(gp_fused[name]), np.asarray(gp_dense[name]),
            rtol=1e-4, atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(gf_fused), np.asarray(gf_dense), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_full_mace_network_fused_matches_dense():
    """Same params, same outputs: the fused flag changes no layout."""
    import dataclasses

    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.mace_score_network import (
        MaceScoreNetwork,
        MaceScoreNetworkConfig,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL,
        CARTESIAN_FORCES,
        NOISE,
        NOISY_AXL_COMPOSITION,
        TIME,
    )

    config = MaceScoreNetworkConfig(
        num_atom_types=1,
        hidden_irreps="8x0e + 8x1o",
        num_interactions=2,
        max_ell=3,
        correlation=2,
        r_max=4.5,
        condition_on_sigma=True,
    )
    dense_network = MaceScoreNetwork(config)
    fused_network = MaceScoreNetwork(
        dataclasses.replace(config, use_fused_edge_kernel=True)
    )

    batch_size, n = 2, 4
    x = jax.random.uniform(jax.random.PRNGKey(3), (batch_size, n, 3))
    batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((batch_size, n), jnp.int32),
            X=x,
            L=jnp.concatenate(
                [5.43 * jnp.ones((batch_size, 3)), jnp.zeros((batch_size, 3))],
                -1,
            ),
        ),
        TIME: jnp.full((batch_size, 1), 0.5),
        NOISE: jnp.full((batch_size, 1), 0.1),
        CARTESIAN_FORCES: jnp.zeros_like(x),
    }
    params = dense_network.init(jax.random.PRNGKey(4), batch, False)
    fused_params = fused_network.init(jax.random.PRNGKey(4), batch, False)
    chex_tree_equal = jax.tree_util.tree_structure
    assert chex_tree_equal(params) == chex_tree_equal(fused_params)

    dense_out = dense_network.apply(params, batch, False)
    fused_out = fused_network.apply(params, batch, False)
    np.testing.assert_allclose(
        np.asarray(fused_out.X), np.asarray(dense_out.X), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused_out.A), np.asarray(dense_out.A), rtol=2e-4, atol=2e-5
    )
