"""Fused (Pallas) EGNN message block vs the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.models.egnn_fused import (
    dense_message_block,
    fused_message_block,
    init_message_block_params,
    pallas_message_block,
)

BATCH, N, F, H = 2, 8, 16, 32
N_MSG, N_COORD = 2, 2


@pytest.fixture(scope="module")
def inputs():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = init_message_block_params(k1, F, H, N_MSG, N_COORD, H)
    h = jax.random.normal(k2, (BATCH, N, F))
    z = jax.random.normal(k3, (BATCH, N, 4))
    diff = z[:, :, None, :] - z[:, None, :, :]
    radial = jnp.sum(diff**2, axis=-1)
    weights = (jax.random.uniform(k4, (BATCH, N, N)) > 0.3).astype(jnp.float32)
    weights = weights * (1.0 - jnp.eye(N))
    return params, h, radial, weights


def test_pallas_matches_dense(inputs):
    params, h, radial, weights = inputs
    m_dense, phi_dense = dense_message_block(
        params, h, radial, weights,
        n_message_layers=N_MSG, n_coordinate_layers=N_COORD, tanh=False,
    )
    m_pallas, phi_pallas = pallas_message_block(
        params, h, radial, weights,
        n_message_layers=N_MSG, n_coordinate_layers=N_COORD, tanh=False,
    )
    np.testing.assert_allclose(
        np.asarray(m_pallas), np.asarray(m_dense), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(phi_pallas), np.asarray(phi_dense), atol=1e-4, rtol=1e-3
    )


def test_custom_vjp_gradients_flow(inputs):
    params, h, radial, weights = inputs

    def loss(params, h):
        m_agg, phi = fused_message_block(
            params, h, radial, weights, N_MSG, N_COORD, False
        )
        return jnp.sum(m_agg**2) + jnp.sum(phi**2)

    grads_params, grads_h = jax.grad(loss, argnums=(0, 1))(params, h)
    for leaf in jax.tree_util.tree_leaves(grads_params):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(grads_h)).max() > 0

    # The custom backward must equal the dense path's gradients.
    def dense_loss(params, h):
        m_agg, phi = dense_message_block(
            params, h, radial, weights,
            n_message_layers=N_MSG, n_coordinate_layers=N_COORD, tanh=False,
        )
        return jnp.sum(m_agg**2) + jnp.sum(phi**2)

    ref_params, ref_h = jax.grad(dense_loss, argnums=(0, 1))(params, h)
    # The Pallas backward is its own bf16 computation: compare normalized by
    # the gradient scale (bf16 accumulation noise is ~0.3% of scale here).
    scale = float(np.abs(np.asarray(ref_h)).max())
    np.testing.assert_allclose(
        np.asarray(grads_h) / scale, np.asarray(ref_h) / scale, atol=1e-2
    )


@pytest.mark.slow
def test_fused_egnn_network_properties(rng_key):
    """The fused-path EGNN keeps the torus symmetries."""
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
        EGNNScoreNetwork,
        EGNNScoreNetworkConfig,
    )
    from tests.test_equivariance import make_batch, rotate_torus
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        NOISY_AXL_COMPOSITION,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.lattice_shells import (
        get_cubic_point_group_symmetries,
    )

    cfg = EGNNScoreNetworkConfig(
        num_atom_types=1, n_layers=2, use_fused_message_block=True
    )
    net = EGNNScoreNetwork(cfg)
    batch = make_batch(rng_key)
    params = net.init(rng_key, batch, False)
    out = net.apply(params, batch, False)
    assert np.isfinite(np.asarray(out.X)).all()

    # translation invariance
    comp = batch[NOISY_AXL_COMPOSITION]
    translated = dict(batch)
    translated[NOISY_AXL_COMPOSITION] = comp._replace(
        X=jnp.remainder(comp.X + jnp.array([0.2, 0.5, 0.7]), 1.0)
    )
    out_t = net.apply(params, translated, False)
    np.testing.assert_allclose(
        np.asarray(out_t.X), np.asarray(out.X), atol=1e-4
    )

    # rotation equivariance
    rotation = get_cubic_point_group_symmetries(3).astype(np.float64)[17]
    rotated = dict(batch)
    rotated[NOISY_AXL_COMPOSITION] = comp._replace(
        X=rotate_torus(comp.X, rotation)
    )
    out_r = net.apply(params, rotated, False)
    np.testing.assert_allclose(
        np.asarray(out_r.X), np.asarray(out.X) @ rotation.T, atol=1e-4
    )


@pytest.mark.parametrize("tanh", [False, True])
@pytest.mark.parametrize("block_rows", [4, 8])
def test_pallas_backward_matches_dense_vjp(inputs, tanh, block_rows):
    """The fused Pallas backward reproduces every gradient of the dense VJP
    (params, h, radial, edge weights) to bf16-accumulation tolerance."""
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.egnn_fused import (
        pallas_message_block_bwd,
    )

    params, h, radial, weights = inputs
    key = jax.random.PRNGKey(7)
    g_magg = jax.random.normal(key, (BATCH, N, H))
    g_phi = jax.random.normal(jax.random.split(key)[0], (BATCH, N, N))

    _, vjp = jax.vjp(
        lambda p, hh, rr, ww: dense_message_block(
            p, hh, rr, ww,
            n_message_layers=N_MSG, n_coordinate_layers=N_COORD, tanh=tanh,
        ),
        params, h, radial, weights,
    )
    reference = vjp((g_magg, g_phi))
    computed = pallas_message_block_bwd(
        params, h, radial, weights, g_magg, g_phi,
        n_message_layers=N_MSG, n_coordinate_layers=N_COORD, tanh=tanh,
        block_rows=block_rows,
    )
    for computed_leaf, reference_leaf in zip(
        jax.tree_util.tree_leaves(computed), jax.tree_util.tree_leaves(reference)
    ):
        scale = max(1e-6, float(np.abs(np.asarray(reference_leaf)).max()))
        np.testing.assert_allclose(
            np.asarray(computed_leaf) / scale,
            np.asarray(reference_leaf) / scale,
            atol=2e-2,
        )


@pytest.mark.slow
def test_training_through_fused_block_uses_pallas_backward(inputs):
    """An optimization step through the fused op decreases the loss with the
    Pallas backward enabled (the production training path)."""
    import optax

    from diffusion_for_multi_scale_molecular_dynamics_tpu.models import egnn_fused

    assert egnn_fused.use_pallas_backward
    params, h, radial, weights = inputs

    def loss(p):
        m_agg, phi = fused_message_block(p, h, radial, weights, N_MSG, N_COORD, False)
        return jnp.mean(m_agg**2) + jnp.mean(phi**2)

    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    p = params
    values = []
    for _ in range(5):
        value, grads = jax.value_and_grad(loss)(p)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        values.append(float(value))
    assert values[-1] < values[0]


def test_forward_row_blocking_matches_dense(inputs):
    """Multi-row-block forward grid (the N=216 VMEM path) == dense path."""
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.egnn_fused import (
        _forward_block_rows,
    )

    assert _forward_block_rows(64) == 64  # production Si 2x2x2: one block
    # Si 3x3x3: partial blocks must be multiple-of-8 divisors (Mosaic tiling);
    # 18 rows fit the budget but fail TPU lowering, so 8 is the answer.
    assert _forward_block_rows(216) == 8
    # Whole-sample blocks are exempt from the multiple-of-8 rule.
    assert _forward_block_rows(7) == 7 and _forward_block_rows(13) == 13
    # No multiple-of-8 divisor and too big for one block -> explicit error.
    with pytest.raises(ValueError, match="multiple-of-8"):
        _forward_block_rows(100, pair_budget=128)

    params, h, radial, weights = inputs
    # Double the atom axis to n=16 so a multiple-of-8 partial block exists.
    h2 = jnp.concatenate([h, h], axis=1)
    radial2 = jnp.tile(radial, (1, 2, 2))
    weights2 = jnp.tile(weights, (1, 2, 2)) * (1.0 - jnp.eye(2 * N))
    m_dense, phi_dense = dense_message_block(
        params, h2, radial2, weights2,
        n_message_layers=N_MSG, n_coordinate_layers=N_COORD, tanh=True,
    )
    # pair_budget=8*(2N) forces block_rows=8 -> 2 grid steps per sample.
    assert _forward_block_rows(2 * N, pair_budget=8 * 2 * N) == 8
    m_blocked, phi_blocked = pallas_message_block(
        params, h2, radial2, weights2,
        n_message_layers=N_MSG, n_coordinate_layers=N_COORD, tanh=True,
        pair_budget=8 * 2 * N,
    )
    np.testing.assert_allclose(
        np.asarray(m_blocked), np.asarray(m_dense), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(phi_blocked), np.asarray(phi_dense), atol=1e-4, rtol=1e-3
    )
