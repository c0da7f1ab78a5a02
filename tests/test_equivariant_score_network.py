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


@pytest.fixture(scope="module", params=[1, 2], ids=["l1", "l2"])
def network_and_params(request):
    cfg = EquivariantScoreNetworkConfig(
        num_atom_types=NUM_TYPES,
        num_features=16,
        number_of_interactions=2,
        radial_cutoff=3.0,
        max_ell=request.param,
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
    # atol: with the true-cell image-expanded pair grid, pairs reach frac
    # distance ~0.55 where the min-image round() seam amplifies fp32 wrap
    # noise; observed max drift ~3.5e-5 (structural breaks are >1e-2).
    np.testing.assert_allclose(np.asarray(out_t.X), np.asarray(out.X), atol=2e-4)


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


@pytest.mark.slow
def test_mlp_head_and_factory(rng_key):
    # "mace" now resolves to the faithful MACE network (its own config
    # surface, tests/test_mace_score_network.py); the scalar/vector/tensor
    # net owns the "diffusion_mace" slot.
    global_cfg = dict(elements=["Si"], max_atom=4, spatial_dimension=3)
    net = create_score_network(
        create_score_network_config(
            dict(
                architecture="diffusion_mace",
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

    mace_net = create_score_network(
        create_score_network_config(
            dict(
                architecture="mace",
                hidden_irreps="4x0e + 4x1o",
                max_ell=2,
                correlation=2,
                r_max=3.0,
                prediction_head="mlp",
            ),
            global_cfg,
        )
    )
    params = mace_net.init(rng_key, batch, False)
    out = mace_net.apply(params, batch, False)
    assert np.isfinite(np.asarray(out.X)).all()


def test_pretrained_loading_raises():
    with pytest.raises(NotImplementedError):
        EquivariantScoreNetworkConfig(
            num_atom_types=1, use_pretrained="small"
        )


@pytest.mark.slow
def test_l2_tensor_path_is_live(rng_key):
    """max_ell=2 creates rank-2 feature parameters and gradients flow
    through them (the l=2 channels influence the score output)."""
    cfg = EquivariantScoreNetworkConfig(
        num_atom_types=NUM_TYPES,
        num_features=16,
        number_of_interactions=2,
        radial_cutoff=3.0,
        max_ell=2,
    )
    net = EquivariantScoreNetwork(cfg)
    batch = make_batch(rng_key)
    params = net.init(rng_key, batch, False)

    flat = jax.tree_util.tree_leaves_with_path(params)
    tensor_param_names = [
        jax.tree_util.keystr(path)
        for path, _ in flat
        if "_P" in jax.tree_util.keystr(path)
        or "_Q" in jax.tree_util.keystr(path)
    ]
    assert tensor_param_names, "no rank-2 feature parameters were created"

    def loss(p):
        out = net.apply(p, batch, False)
        return jnp.mean(out.X**2)

    grads = jax.grad(loss)(params)
    grad_flat = dict(
        (jax.tree_util.keystr(path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads)
    )
    p_grads = [
        np.abs(np.asarray(grad_flat[name])).max() for name in tensor_param_names
    ]
    assert max(p_grads) > 0, "tensor-path parameters receive zero gradient"


@pytest.mark.slow
def test_l2_trains_on_si_1x1x1():
    """The max_ell=2 network fits Si 1x1x1 MD data (loss decreases)."""
    import os

    import optax

    from diffusion_for_multi_scale_molecular_dynamics_tpu.loss import (
        create_loss_parameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        ATOM_TYPES,
        CARTESIAN_FORCES,
        LATTICE_PARAMETERS,
        RELATIVE_COORDINATES,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.diffusion_model import (
        AXLDiffusionConfig,
        make_generic_step,
        make_train_step,
    )

    import pandas as pd

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    frame = pd.read_parquet(
        os.path.join(repo, "data", "si_diffusion_1x1x1", "train_run_1.parquet")
    ).head(64)
    natoms = int(frame["natom"].iloc[0])
    x = np.stack(
        [row.reshape(natoms, 3) for row in frame["relative_coordinates"]]
    ).astype(np.float32)
    lattice = np.stack(list(frame["lattice_parameters"])).astype(np.float32)
    batch = {
        RELATIVE_COORDINATES: jnp.asarray(x),
        ATOM_TYPES: jnp.zeros((len(frame), natoms), jnp.int32),
        LATTICE_PARAMETERS: jnp.asarray(lattice),
        CARTESIAN_FORCES: jnp.zeros_like(jnp.asarray(x)),
    }

    cfg = EquivariantScoreNetworkConfig(
        num_atom_types=1,
        num_features=16,
        number_of_interactions=2,
        radial_cutoff=2.7,
        max_ell=2,
    )
    net = EquivariantScoreNetwork(cfg)
    diffusion_config = AXLDiffusionConfig(
        score_network_config=cfg,
        loss_parameters=create_loss_parameters({}),
        noise_parameters=NoiseParameters(
            total_time_steps=20, sigma_min=0.005, sigma_max=0.3
        ),
        use_fixed_lattice_parameters=True,
    )
    generic_step = make_generic_step(net, diffusion_config)
    optimizer = optax.adamw(5e-3)
    train_step = jax.jit(
        make_train_step(
            lambda p, b, k: generic_step(p, b, k, conditional=False), optimizer
        )
    )

    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL,
        NOISE,
        NOISY_AXL_COMPOSITION,
        TIME,
    )

    init_batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=batch[ATOM_TYPES], X=batch[RELATIVE_COORDINATES],
            L=batch[LATTICE_PARAMETERS],
        ),
        TIME: jnp.full((len(frame), 1), 0.5),
        NOISE: jnp.full((len(frame), 1), 0.1),
        CARTESIAN_FORCES: batch[CARTESIAN_FORCES],
    }
    params = net.init(jax.random.PRNGKey(0), init_batch, False)
    opt_state = optimizer.init(params)

    key = jax.random.PRNGKey(1)
    losses = []
    for step in range(25):
        key, step_key = jax.random.split(key)
        params, opt_state, aux = train_step(params, opt_state, batch, step_key)
        losses.append(float(aux["loss"]))
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < 0.8 * early, f"no learning: first5={early:.4f} last5={late:.4f}"


def test_supercell_consistency():
    """Per-atom Cartesian scores are invariant under cell duplication.

    Duplicating the cell along x preserves every atom's local environment,
    so the per-atom Cartesian scores (out.X is the fractional covector,
    cell @ s_cart, so divide by the axis lengths) must match between the
    8-atom cell and the 16-atom supercell. The reference's box clip to
    2.2 x r_max (diffusion_mace_score_network.py:144) fails this whenever
    the cell is smaller than that; the image-expanded pair grid passes.
    """
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL,
        CARTESIAN_FORCES,
        NOISE,
        TIME,
    )

    cfg = EquivariantScoreNetworkConfig(
        num_atom_types=NUM_TYPES,
        num_features=16,
        number_of_interactions=2,
        radial_cutoff=4.5,  # > cell/2: min-image alone is wrong here
        max_ell=2,
    )
    net = EquivariantScoreNetwork(cfg)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    n = 8
    x = jax.random.uniform(k1, (1, n, 3))
    a = jax.random.randint(k2, (1, n), 0, NUM_TYPES)

    def batch_of(x_, a_, lengths):
        lattice = jnp.asarray([list(lengths) + [0.0, 0.0, 0.0]])
        return {
            NOISY_AXL_COMPOSITION: AXL(A=a_, X=x_, L=lattice),
            TIME: jnp.full((1, 1), 0.4),
            NOISE: jnp.full((1, 1), 0.1),
            CARTESIAN_FORCES: jnp.zeros_like(x_),
        }

    small = batch_of(x, a, (5.43, 5.43, 5.43))
    x_half = x * jnp.array([0.5, 1.0, 1.0])
    x_super = jnp.concatenate(
        [x_half, x_half + jnp.array([0.5, 0.0, 0.0])], axis=1
    )
    a_super = jnp.concatenate([a, a], axis=1)
    sup = batch_of(x_super, a_super, (10.86, 5.43, 5.43))

    params = net.init(jax.random.PRNGKey(0), small, False)
    out_small = net.apply(params, small, False)
    out_super = net.apply(params, sup, False)

    cart_small = np.asarray(out_small.X) / np.array([5.43, 5.43, 5.43])
    cart_super = np.asarray(out_super.X) / np.array([10.86, 5.43, 5.43])
    assert np.abs(cart_small).max() > 1e-3, "trivially zero scores"
    for copy in (slice(0, n), slice(n, 2 * n)):
        np.testing.assert_allclose(
            cart_super[:, copy], cart_small, atol=5e-4, rtol=1e-3
        )
    logits_small = np.asarray(out_small.A)
    logits_super = np.asarray(out_super.A)
    np.testing.assert_allclose(
        logits_super[:, :n, :-1], logits_small[..., :-1], atol=5e-4, rtol=1e-3
    )
