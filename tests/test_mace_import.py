"""Round-trip tests for the mace-torch checkpoint importer.

Without mace-torch in the environment, the schema is pinned from the other
direction: export the flax trunk to the torch key schema, re-import it, and
require (a) bit-identical parameters, (b) identical network outputs, and
(c) exhaustive key consumption with readout heads ignored — so any layout
drift in either direction breaks these tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.models.mace_import import (
    export_mace_state_dict,
    import_mace_state_dict,
    insert_pretrained_trunk,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.models.mace_score_network import (
    MaceScoreNetwork,
    MaceScoreNetworkConfig,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    ATOM_MASK,
    AXL,
    NOISE,
    NOISY_AXL_COMPOSITION,
    TIME,
)


@pytest.fixture(params=["128x0e", "8x0e + 8x1o"])
def config(request):
    # "128x0e" x 2 interactions is exactly the released small model's layout
    # (mace_utils.py:113-116), shrunk channels aside.
    hidden = "8x0e" if request.param == "128x0e" else request.param
    return MaceScoreNetworkConfig(
        num_atom_types=2,
        hidden_irreps=hidden,
        max_ell=3,
        correlation=3,
        r_max=3.0,
        num_interactions=2,
    )


@pytest.fixture
def batch():
    rng = np.random.default_rng(11)
    B, N = 2, 5
    return {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.asarray(rng.integers(0, 3, (B, N))),
            X=jnp.asarray(rng.uniform(0, 1, (B, N, 3)), dtype=jnp.float32),
            L=jnp.asarray(
                np.tile([7.0, 7.0, 7.0, 0.0, 0.0, 0.0], (B, 1)),
                dtype=jnp.float32,
            ),
        ),
        TIME: jnp.full((B, 1), 0.4, dtype=jnp.float32),
        NOISE: jnp.full((B, 1), 0.2, dtype=jnp.float32),
        ATOM_MASK: jnp.ones((B, N), dtype=bool),
    }


def test_export_import_roundtrip(config, batch):
    network = MaceScoreNetwork(config)
    params = network.init(jax.random.PRNGKey(0), batch)
    trunk = params["params"]["mace"]

    state_dict = export_mace_state_dict(trunk, config)
    # Decorate with the head tensors a real mace-torch state dict carries.
    state_dict["readouts.0.linear.weight"] = np.zeros(4)
    state_dict["atomic_energies_fn.atomic_energies"] = np.zeros(89)
    state_dict["scale_shift.scale"] = np.ones(1)

    imported, report = import_mace_state_dict(state_dict, config, strict=True)
    assert report.ignored == [
        "readouts.0.linear.weight",
        "atomic_energies_fn.atomic_energies",
        "scale_shift.scale",
    ] or set(report.ignored) == {
        "readouts.0.linear.weight",
        "atomic_energies_fn.atomic_energies",
        "scale_shift.scale",
    }
    assert not report.mismatched and not report.missing

    flat_fresh = jax.tree_util.tree_leaves_with_path(trunk)
    flat_imported = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(imported)
    )
    assert len(flat_fresh) == len(flat_imported)
    for key_path, fresh_leaf in flat_fresh:
        key = jax.tree_util.keystr(key_path)
        np.testing.assert_array_equal(
            np.asarray(fresh_leaf),
            np.asarray(flat_imported[key]).reshape(fresh_leaf.shape),
            err_msg=key,
        )

    grafted = insert_pretrained_trunk(params, imported)
    out_fresh = network.apply(params, batch)
    out_grafted = network.apply(grafted, batch)
    np.testing.assert_allclose(
        np.asarray(out_fresh.X), np.asarray(out_grafted.X), atol=0
    )


def test_missing_tensor_raises(config, batch):
    network = MaceScoreNetwork(config)
    params = network.init(jax.random.PRNGKey(0), batch)
    state_dict = export_mace_state_dict(params["params"]["mace"], config)
    state_dict.pop("interactions.0.linear.weight")
    with pytest.raises(KeyError, match="interactions.0.linear.weight"):
        import_mace_state_dict(state_dict, config, strict=True)
    _, report = import_mace_state_dict(state_dict, config, strict=False)
    assert "interactions.0.linear.weight" in report.missing


def test_basis_mismatch_is_reported_not_mismapped(config, batch):
    """A symmetrized-U-basis checkpoint with a different path count must be
    surfaced, never silently reshaped."""
    network = MaceScoreNetwork(config)
    params = network.init(jax.random.PRNGKey(0), batch)
    state_dict = export_mace_state_dict(params["params"]["mace"], config)
    name = "products.0.symmetric_contractions.contractions.0.weights_max"
    good = state_dict[name]
    state_dict[name] = np.zeros((good.shape[0], good.shape[1] + 2, good.shape[2]))
    with pytest.raises(ValueError, match="basis"):
        import_mace_state_dict(state_dict, config, strict=True)
    _, report = import_mace_state_dict(state_dict, config, strict=False)
    assert any(name in entry for entry in report.mismatched)


def test_unrecognized_tensor_raises(config, batch):
    network = MaceScoreNetwork(config)
    params = network.init(jax.random.PRNGKey(0), batch)
    state_dict = export_mace_state_dict(params["params"]["mace"], config)
    state_dict["surprise.weight"] = np.zeros(3)
    with pytest.raises(ValueError, match="surprise"):
        import_mace_state_dict(state_dict, config, strict=True)


def test_element_z_number_mapping(batch):
    """Si must hit the z=14 channel of an 89-wide pretrained table."""
    from dataclasses import replace

    base = MaceScoreNetworkConfig(
        num_atom_types=1,
        hidden_irreps="4x0e",
        max_ell=2,
        correlation=2,
        r_max=3.0,
        num_elements=89,
        prediction_head="mlp",
    )
    comp = batch[NOISY_AXL_COMPOSITION]
    si_batch = dict(batch)
    si_batch[NOISY_AXL_COMPOSITION] = comp._replace(
        A=jnp.zeros_like(comp.A)
    )

    mapped = MaceScoreNetwork(replace(base, element_z_numbers=(14,)))
    params = mapped.init(jax.random.PRNGKey(0), si_batch)
    out_mapped = mapped.apply(params, si_batch)

    # Same params through the identity mapping: type 0 hits channel 0 and
    # sees different embedding rows -> different output.
    identity = MaceScoreNetwork(base)
    out_identity = identity.apply(params, si_batch)
    assert not np.allclose(np.asarray(out_mapped.X), np.asarray(out_identity.X))

    # Channel-14 equivalence: feeding A=14 through the identity mapping
    # reproduces the z-mapped output exactly.
    ch14 = dict(si_batch)
    ch14[NOISY_AXL_COMPOSITION] = si_batch[NOISY_AXL_COMPOSITION]._replace(
        A=jnp.full_like(comp.A, 14)
    )
    out_ch14 = identity.apply(params, ch14)
    np.testing.assert_allclose(
        np.asarray(out_mapped.X), np.asarray(out_ch14.X), atol=0
    )


def test_frozen_trunk_blocks_gradients(batch):
    """freeze_trunk reproduces the reference's frozen feature extractor."""
    config = MaceScoreNetworkConfig(
        num_atom_types=2,
        hidden_irreps="4x0e",
        max_ell=2,
        correlation=2,
        r_max=3.0,
        freeze_trunk=True,
        # All-scalar trunks cannot feed an equivariant vector readout (the
        # reference's o3.Linear to 1x1o from 0e is identically zero too).
        prediction_head="mlp",
    )
    network = MaceScoreNetwork(config)
    params = network.init(jax.random.PRNGKey(0), batch)

    def loss(p):
        out = network.apply(p, batch)
        return jnp.sum(out.X**2)

    grads = jax.grad(loss)(params)
    trunk_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree_util.tree_leaves(grads["params"]["mace"])
    )
    head_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree_util.tree_leaves(grads["params"]["coordinates_head"])
    )
    assert trunk_norm == 0.0
    assert head_norm > 0.0
