"""Tests for the native MACE score network (models/mace_score_network.py).

Mirrors the reference's equivariance test pattern for its MACE-family nets
(tests/models/score_network/test_score_network_equivariance.py): cubic
point-group rotations, translations, and permutations must transform the
score covariantly. Also checks the higher-order machinery directly
(symmetric contraction equivariance at correlation 3, l up to 3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.models.mace_modules import (
    MaceFeatureExtractor,
    SymmetricContraction,
    interaction_irreps,
    mace_output_irreps,
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
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.symmetry import (
    get_cubic_point_group_symmetries,
)


@pytest.fixture
def config():
    return MaceScoreNetworkConfig(
        num_atom_types=2,
        hidden_irreps="4x0e + 4x1o",
        max_ell=3,
        correlation=3,
        r_max=3.0,
        num_interactions=2,
    )


@pytest.fixture
def batch():
    rng = np.random.default_rng(7)
    B, N = 2, 6
    return {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.asarray(rng.integers(0, 3, (B, N))),
            X=jnp.asarray(rng.uniform(0, 1, (B, N, 3)), dtype=jnp.float32),
            L=jnp.asarray(
                np.tile([7.0, 7.0, 7.0, 0.0, 0.0, 0.0], (B, 1)),
                dtype=jnp.float32,
            ),
        ),
        TIME: jnp.full((B, 1), 0.3, dtype=jnp.float32),
        NOISE: jnp.full((B, 1), 0.1, dtype=jnp.float32),
        ATOM_MASK: jnp.ones((B, N), dtype=bool),
    }


@pytest.fixture
def network_and_params(config, batch):
    network = MaceScoreNetwork(config)
    params = network.init(jax.random.PRNGKey(0), batch)
    return network, params


def replace_coordinates(batch, x):
    comp = batch[NOISY_AXL_COMPOSITION]
    new = dict(batch)
    new[NOISY_AXL_COMPOSITION] = comp._replace(X=x)
    return new


class TestMaceScoreNetworkOutput:
    def test_shapes_and_mask_logit(self, config, batch, network_and_params):
        network, params = network_and_params
        out = network.apply(params, batch)
        B, N, _ = batch[NOISY_AXL_COMPOSITION].X.shape
        assert out.A.shape == (B, N, config.num_classes)
        assert out.X.shape == (B, N, 3)
        assert out.L.shape == batch[NOISY_AXL_COMPOSITION].L.shape
        assert np.isfinite(np.asarray(out.X)).all()
        assert np.all(np.asarray(out.A[..., -1]) == -np.inf)
        assert not np.any(np.asarray(out.L))

    def test_output_feature_irreps_dims(self):
        # The reference's pretrained models expose 256/640/1280 features
        # (mace_utils.py:103-130).
        assert mace_output_irreps("128x0e", 2).dim == 256
        assert mace_output_irreps("128x0e + 128x1o", 2).dim == 640
        assert mace_output_irreps("128x0e + 128x1o + 128x2e", 2).dim == 1280

    def test_sigma_conditioning(self, config, batch):
        """condition_on_sigma makes the trunk noise-aware (the reference
        DiffusionMACE's sigma mixing, diffusion_mace.py:218) and keeps
        rotation equivariance."""
        from dataclasses import replace

        cfg = replace(config, condition_on_sigma=True)
        network = MaceScoreNetwork(cfg)
        params = network.init(jax.random.PRNGKey(2), batch)
        out = network.apply(params, batch)
        hotter = dict(batch)
        hotter[NOISE] = batch[NOISE] * 3.0
        out_hot = network.apply(params, hotter)
        assert not np.allclose(np.asarray(out.X), np.asarray(out_hot.X))

        rotations = np.asarray(get_cubic_point_group_symmetries())[9:11]
        x = np.asarray(batch[NOISY_AXL_COMPOSITION].X)
        for rotation in rotations:
            x_rot = np.mod((x - 0.5) @ rotation.T + 0.5, 1.0)
            rotated_out = network.apply(
                params,
                replace_coordinates(batch, jnp.asarray(x_rot, jnp.float32)),
            )
            np.testing.assert_allclose(
                np.asarray(rotated_out.X),
                np.asarray(out.X) @ rotation.T,
                rtol=5e-3, atol=3e-3,
            )

    def test_pretrained_with_sigma_conditioning_rejected(self, config):
        from dataclasses import replace

        with pytest.raises(AssertionError, match="sigma conditioning"):
            replace(
                config, condition_on_sigma=True, use_pretrained="/tmp/x.pt"
            )

    def test_mlp_head_variant_runs(self, config, batch):
        from dataclasses import replace

        cfg = replace(config, prediction_head="mlp")
        network = MaceScoreNetwork(cfg)
        params = network.init(jax.random.PRNGKey(1), batch)
        out = network.apply(params, batch)
        assert np.isfinite(np.asarray(out.X)).all()


class TestMaceEquivariance:
    def test_translation_invariance(self, batch, network_and_params):
        network, params = network_and_params
        out = network.apply(params, batch)
        shift = jnp.asarray([0.13, -0.27, 0.41], dtype=jnp.float32)
        x = batch[NOISY_AXL_COMPOSITION].X
        translated = network.apply(
            params, replace_coordinates(batch, jnp.mod(x + shift, 1.0))
        )
        np.testing.assert_allclose(
            np.asarray(translated.X), np.asarray(out.X), rtol=5e-3, atol=3e-3
        )
        np.testing.assert_allclose(
            np.asarray(translated.A[..., :-1]),
            np.asarray(out.A[..., :-1]),
            rtol=5e-3, atol=3e-3,
        )

    def test_cubic_rotation_equivariance(self, batch, network_and_params):
        """Point-group ops of the cubic cell act on fractional coordinates as
        x -> R x (mod 1) about the cell center; scores rotate with R."""
        network, params = network_and_params
        out = network.apply(params, batch)
        rotations = np.asarray(get_cubic_point_group_symmetries())[:8]
        x = np.asarray(batch[NOISY_AXL_COMPOSITION].X)
        for rotation in rotations:
            centered = x - 0.5
            x_rot = np.mod(centered @ rotation.T + 0.5, 1.0)
            rotated_out = network.apply(
                params,
                replace_coordinates(
                    batch, jnp.asarray(x_rot, dtype=jnp.float32)
                ),
            )
            np.testing.assert_allclose(
                np.asarray(rotated_out.X),
                np.asarray(out.X) @ rotation.T,
                rtol=5e-3, atol=3e-3,
                err_msg=str(rotation),
            )
            # No A-logit assertion under rotation: the atom-type head is an
            # MLP over the full (mixed-irrep) node features, which is not
            # rotation invariant when the hidden irreps carry l>0 — exactly
            # like the reference's MaceMLPScorePredictionHead on flat
            # features (score_prediction_head.py:61).

    def test_permutation_equivariance(self, batch, network_and_params):
        network, params = network_and_params
        out = network.apply(params, batch)
        perm = np.asarray([3, 1, 4, 0, 5, 2])
        comp = batch[NOISY_AXL_COMPOSITION]
        permuted = dict(batch)
        permuted[NOISY_AXL_COMPOSITION] = comp._replace(
            A=comp.A[:, perm], X=comp.X[:, perm]
        )
        pout = network.apply(params, permuted)
        np.testing.assert_allclose(
            np.asarray(pout.X), np.asarray(out.X)[:, perm], rtol=5e-3, atol=3e-3
        )

    @pytest.mark.slow
    def test_padding_mask_invariance(self, config, batch, network_and_params):
        """Adding padded atoms must not change real-atom outputs."""
        network, params = network_and_params
        out = network.apply(params, batch)
        comp = batch[NOISY_AXL_COMPOSITION]
        B, N = comp.A.shape
        extra = 3
        padded = dict(batch)
        padded[NOISY_AXL_COMPOSITION] = comp._replace(
            A=jnp.concatenate(
                [comp.A, jnp.full((B, extra), config.num_atom_types)], axis=1
            ),
            X=jnp.concatenate(
                [comp.X, jnp.full((B, extra, 3), 0.123, dtype=jnp.float32)],
                axis=1,
            ),
        )
        padded[ATOM_MASK] = jnp.concatenate(
            [batch[ATOM_MASK], jnp.zeros((B, extra), dtype=bool)], axis=1
        )
        pout = network.apply(params, padded)
        np.testing.assert_allclose(
            np.asarray(pout.X)[:, :N], np.asarray(out.X), rtol=5e-3, atol=3e-3
        )


class TestSymmetricContraction:
    def test_rotation_equivariance_correlation_3(self):
        """B-features transform covariantly when A-features do (l <= 3)."""
        from scipy.spatial.transform import Rotation

        from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.so3 import (
            spherical_harmonics,
            split_irreps,
        )

        channels = 3
        irreps_a = interaction_irreps(channels, 3)
        irreps_out = interaction_irreps(channels, 2)
        module = SymmetricContraction(
            irreps_a=str(irreps_a),
            irreps_out=str(irreps_out),
            correlation=3,
            num_elements=2,
        )
        rng = np.random.default_rng(3)

        # Build covariant A-features from harmonics of random vectors so we
        # know exactly how they transform.
        def a_features(vectors):
            y = np.asarray(spherical_harmonics(3, vectors))  # [n, 16]
            # [n, channels, 16] with channel-dependent scaling
            scale = np.asarray([1.0, -0.5, 2.0])[None, :, None]
            per_channel = y[:, None, :] * scale
            blocks = [
                per_channel[..., l * l:(l + 1) * (l + 1)] for l in range(4)
            ]
            flat = np.concatenate(
                [b.reshape(b.shape[0], -1) for b in blocks], axis=-1
            )
            return jnp.asarray(flat, dtype=jnp.float32)

        vectors = rng.normal(size=(5, 3))
        vectors /= np.linalg.norm(vectors, axis=-1, keepdims=True)
        attrs = jnp.asarray(
            np.eye(2)[rng.integers(0, 2, 5)], dtype=jnp.float32
        )
        params = module.init(jax.random.PRNGKey(0), a_features(vectors), attrs)
        out = module.apply(params, a_features(vectors), attrs)

        rotation = Rotation.from_rotvec([0.2, 0.5, -0.4]).as_matrix()
        out_rot = module.apply(
            params, a_features(vectors @ rotation.T), attrs
        )

        # Compare per-l blocks using Wigner-D fitted from the harmonics.
        def fit_d(l):
            v = rng.normal(size=(50, 3))
            v /= np.linalg.norm(v, axis=-1, keepdims=True)
            y = np.asarray(spherical_harmonics(3, v))[
                :, l * l:(l + 1) * (l + 1)
            ]
            yr = np.asarray(spherical_harmonics(3, v @ rotation.T))[
                :, l * l:(l + 1) * (l + 1)
            ]
            return np.linalg.lstsq(
                y.astype(np.float64), yr.astype(np.float64), rcond=None
            )[0].T

        blocks = split_irreps(out, irreps_out)
        blocks_rot = split_irreps(out_rot, irreps_out)
        for (mul, ir), b, br in zip(irreps_out, blocks, blocks_rot):
            d = fit_d(ir.l)
            np.testing.assert_allclose(
                np.asarray(br),
                np.einsum("ncm,Mm->ncM", np.asarray(b), d),
                atol=2e-4,
                err_msg=f"l={ir.l}",
            )

    def test_element_dependence(self):
        """Weights are selected by the element one-hot."""
        channels = 2
        irreps_a = interaction_irreps(channels, 1)
        module = SymmetricContraction(
            irreps_a=str(irreps_a),
            irreps_out=str(irreps_a),
            correlation=2,
            num_elements=2,
        )
        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.normal(size=(3, irreps_a.dim)), dtype=jnp.float32)
        e0 = jnp.asarray(np.tile([1.0, 0.0], (3, 1)), dtype=jnp.float32)
        e1 = jnp.asarray(np.tile([0.0, 1.0], (3, 1)), dtype=jnp.float32)
        params = module.init(jax.random.PRNGKey(2), a, e0)
        out0 = module.apply(params, a, e0)
        out1 = module.apply(params, a, e1)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))


@pytest.mark.slow
def test_mace_supercell_consistency():
    """Per-atom Cartesian scores are invariant under cell duplication.

    Same physics check as the equivariant net's test: duplicating the cell
    along x preserves local environments, so per-atom Cartesian scores
    (out.X = cell @ s_cart; divide by axis lengths) must agree between the
    8-atom cell and its 16-atom supercell. Exercises the image-expanded
    pair grid at r_max > cell/2 where min-image pairs alone are wrong
    (the reference instead clips the box, mace_score_network.py:170-175).
    """
    cfg = MaceScoreNetworkConfig(
        num_atom_types=1,
        hidden_irreps="4x0e + 4x1o",
        max_ell=2,
        correlation=2,
        r_max=4.5,
        num_interactions=2,
        condition_on_sigma=True,
    )
    net = MaceScoreNetwork(cfg)
    key = jax.random.PRNGKey(5)
    n = 8
    x = jax.random.uniform(key, (1, n, 3))
    a = jnp.zeros((1, n), jnp.int32)

    def batch_of(x_, a_, lengths):
        lattice = jnp.asarray([list(lengths) + [0.0, 0.0, 0.0]])
        return {
            NOISY_AXL_COMPOSITION: AXL(A=a_, X=x_, L=lattice),
            TIME: jnp.full((1, 1), 0.4),
            NOISE: jnp.full((1, 1), 0.1),
            ATOM_MASK: jnp.ones_like(a_, dtype=bool),
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
    assert np.abs(cart_small).max() > 1e-4, "trivially zero scores"
    for copy in (slice(0, n), slice(n, 2 * n)):
        np.testing.assert_allclose(
            cart_super[:, copy], cart_small, atol=5e-4, rtol=1e-3
        )
