"""Unfused <-> fused EGNN checkpoint migration (utils/egnn_param_migration).

The migration must be (a) structure-exact — the migrated tree matches the
target path's own `init` structure, or orbax resume rejects it — (b) a
bijection on arrays, and (c) output-preserving: the fused network with
migrated parameters reproduces the unfused network's scores to bf16
tolerance (the fused path intentionally runs its matmuls in bfloat16).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.models.egnn_score_network import (
    EGNNScoreNetwork,
    EGNNScoreNetworkConfig,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    AXL,
    CARTESIAN_FORCES,
    NOISE,
    NOISY_AXL_COMPOSITION,
    TIME,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.egnn_param_migration import (
    egcl_layer_counts,
    migrate_state,
)

NATOMS = 6


@pytest.fixture(scope="module")
def configs():
    base = dict(
        num_atom_types=1,
        n_layers=2,
        message_n_hidden_dimensions=1,
        message_hidden_dimensions_size=16,
        coordinate_n_hidden_dimensions=2,
        coordinate_hidden_dimensions_size=16,
        node_n_hidden_dimensions=1,
        node_hidden_dimensions_size=16,
        edges="fully_connected",
    )
    unfused = EGNNScoreNetworkConfig(**base)
    fused = EGNNScoreNetworkConfig(**base, use_fused_message_block=True)
    return unfused, fused


@pytest.fixture(scope="module")
def batch():
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (2, NATOMS, 3))
    return {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((2, NATOMS), jnp.int32),
            X=x,
            L=jnp.concatenate(
                [jnp.full((2, 3), 5.43), jnp.zeros((2, 3))], axis=-1
            ),
        ),
        TIME: jnp.full((2, 1), 0.4),
        NOISE: jnp.full((2, 1), 0.1),
        CARTESIAN_FORCES: jnp.zeros_like(x),
    }


@pytest.fixture(scope="module")
def unfused_params(configs, batch):
    unfused, _ = configs
    return EGNNScoreNetwork(unfused).init(jax.random.PRNGKey(0), batch, False)


def test_migrated_structure_matches_fused_init(configs, batch, unfused_params):
    unfused, fused = configs
    fused_init = EGNNScoreNetwork(fused).init(jax.random.PRNGKey(1), batch, False)
    migrated = migrate_state(unfused_params, unfused, to_fused=True)
    assert jax.tree_util.tree_structure(migrated) == jax.tree_util.tree_structure(
        fused_init
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(migrated), jax.tree_util.tree_leaves(fused_init)
    ):
        assert a.shape == b.shape


def test_round_trip_is_exact(configs, unfused_params):
    unfused, _ = configs
    fused_tree = migrate_state(unfused_params, unfused, to_fused=True)
    back = migrate_state(fused_tree, unfused, to_fused=False)
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(
        unfused_params
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(unfused_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_network_reproduces_unfused_outputs(configs, batch, unfused_params):
    unfused, fused = configs
    out_unfused = EGNNScoreNetwork(unfused).apply(unfused_params, batch, False)
    migrated = migrate_state(unfused_params, unfused, to_fused=True)
    out_fused = EGNNScoreNetwork(fused).apply(migrated, batch, False)
    # The fused path runs message/coordinate matmuls in bfloat16 regardless
    # of compute_dtype; scores agree to bf16-accumulation tolerance.
    np.testing.assert_allclose(
        np.asarray(out_fused.X), np.asarray(out_unfused.X), rtol=0.05, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.A), np.asarray(out_unfused.A), rtol=0.05, atol=5e-3
    )


def test_full_state_migration_covers_opt_state_and_ema(
    configs, batch, unfused_params
):
    """Adam moments and EMA trees (same structure as params) all migrate."""
    import optax

    unfused, fused = configs
    optimizer = optax.adamw(1e-3)
    state = {
        "params": unfused_params,
        "opt_state": optimizer.init(unfused_params),
        "ema_params": jax.tree_util.tree_map(lambda p: p * 0.5, unfused_params),
        "epoch": 12,
        "global_step": 240,
    }
    migrated = migrate_state(state, unfused, to_fused=True)

    fused_init = EGNNScoreNetwork(fused).init(jax.random.PRNGKey(1), batch, False)
    fused_structure = jax.tree_util.tree_structure(fused_init)
    assert (
        jax.tree_util.tree_structure(migrated["params"]) == fused_structure
    )
    assert (
        jax.tree_util.tree_structure(migrated["ema_params"]) == fused_structure
    )
    assert migrated["epoch"] == 12 and migrated["global_step"] == 240
    # Adam mu/nu mirror the migrated parameter structure (same optax
    # container types, EGCL subtrees rewritten).
    mu_structs = [
        jax.tree_util.tree_structure(s.mu)
        for s in jax.tree_util.tree_leaves(
            migrated["opt_state"], is_leaf=lambda s: hasattr(s, "mu")
        )
        if hasattr(s, "mu")
    ]
    assert fused_structure in mu_structs


def test_migrate_rejects_mismatched_config(configs, unfused_params):
    unfused, _ = configs
    wrong = dataclasses.replace(unfused, message_n_hidden_dimensions=3)
    with pytest.raises(ValueError, match="no EGCL subtrees"):
        migrate_state(unfused_params, wrong, to_fused=True)


def test_layer_counts(configs):
    unfused, _ = configs
    counts = egcl_layer_counts(unfused)
    assert counts == {"message": 2, "coordinate": 3, "node": 3}
