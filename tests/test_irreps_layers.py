"""Direct unit tests for the equivariant primitives (ops/irreps_layers.py)."""

import math

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.irreps_layers import (
    IrrepsLinear,
    ScalarTensorProduct,
    bessel_basis,
    polynomial_cutoff,
    tensor_product_paths,
    weighted_tensor_product,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.so3 import (
    Irreps,
    spherical_harmonics,
    split_irreps,
)


def random_unit(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def covariant_features(vectors, irreps, seed=0):
    """Build features with known transformation law from harmonics."""
    rng = np.random.default_rng(seed)
    y = np.asarray(spherical_harmonics(3, vectors))
    blocks = []
    for mul, ir in Irreps(irreps):
        base = y[:, ir.l * ir.l:(ir.l + 1) * (ir.l + 1)]
        scales = rng.normal(size=(mul, 1))
        blocks.append((base[:, None, :] * scales).reshape(len(vectors), -1))
    return np.concatenate(blocks, axis=-1)


def fit_d(l, rotation):
    v = random_unit(50, seed=40 + l)
    y = np.asarray(spherical_harmonics(3, v))[:, l * l:(l + 1) * (l + 1)]
    yr = np.asarray(spherical_harmonics(3, v @ rotation.T))[
        :, l * l:(l + 1) * (l + 1)
    ]
    return np.linalg.lstsq(
        y.astype(np.float64), yr.astype(np.float64), rcond=None
    )[0].T


def assert_covariant(out, out_rot, irreps, rotation, atol=2e-4):
    for (mul, ir), b, br in zip(
        Irreps(irreps), split_irreps(out, Irreps(irreps)),
        split_irreps(out_rot, Irreps(irreps)),
    ):
        d = fit_d(ir.l, rotation)
        np.testing.assert_allclose(
            np.asarray(br), np.einsum("num,Mm->nuM", np.asarray(b), d),
            atol=atol, err_msg=f"l={ir.l}",
        )


class TestIrrepsLinear:
    def test_mixes_only_matching_irreps(self):
        """A 1o output from pure-0e input is identically zero (no path)."""
        module = IrrepsLinear("4x0e", "2x0e + 2x1o")
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)),
                        dtype=jnp.float32)
        params = module.init(jax.random.PRNGKey(0), x)
        out = np.asarray(module.apply(params, x))
        assert out.shape == (3, 2 + 6)
        assert np.any(out[:, :2])
        np.testing.assert_array_equal(out[:, 2:], 0.0)

    def test_equivariance(self):
        irreps = "2x0e + 3x1o + 1x2e"
        module = IrrepsLinear(irreps, irreps)
        vectors = random_unit(6, seed=1)
        feats = covariant_features(vectors, irreps, seed=2)
        params = module.init(
            jax.random.PRNGKey(1), jnp.asarray(feats, dtype=jnp.float32)
        )
        rotation = Rotation.from_rotvec([0.7, -0.2, 0.5]).as_matrix()
        feats_rot = covariant_features(vectors @ rotation.T, irreps, seed=2)
        out = module.apply(params, jnp.asarray(feats, dtype=jnp.float32))
        out_rot = module.apply(
            params, jnp.asarray(feats_rot, dtype=jnp.float32)
        )
        assert_covariant(out, out_rot, irreps, rotation)

    def test_fan_in_normalization(self):
        """With all-ones weights and inputs, output = sqrt(fan_in)."""
        module = IrrepsLinear("4x0e", "1x0e")
        x = jnp.ones((1, 4))
        params = {"params": {"w_0_0": jnp.ones((4, 1))}}
        out = float(module.apply(params, x)[0, 0])
        assert abs(out - math.sqrt(4.0)) < 1e-6


class TestScalarTensorProduct:
    def test_scalar_gating_is_linear_in_scalars(self):
        module = ScalarTensorProduct("2x0e", "2x1o", "2x1o")
        rng = np.random.default_rng(3)
        s = jnp.asarray(rng.normal(size=(4, 2)), dtype=jnp.float32)
        f = jnp.asarray(rng.normal(size=(4, 6)), dtype=jnp.float32)
        params = module.init(jax.random.PRNGKey(2), s, f)
        out1 = np.asarray(module.apply(params, s, f))
        out2 = np.asarray(module.apply(params, 2.0 * s, f))
        np.testing.assert_allclose(out2, 2.0 * out1, rtol=1e-5)

    def test_rejects_nonscalar_first_operand(self):
        module = ScalarTensorProduct("1x1o", "1x1o", "1x1o")
        x = jnp.ones((1, 3))
        with pytest.raises(AssertionError):
            module.init(jax.random.PRNGKey(0), x, x)


class TestWeightedTensorProduct:
    def test_path_enumeration(self):
        paths = tensor_product_paths(
            Irreps("8x0e + 8x1o"), 3,
            Irreps("8x0e + 8x1o + 8x2e + 8x3o"),
        )
        # 0e x Y_l -> l (4 paths); 1o x Y_l -> parity-allowed targets (6).
        assert len(paths) == 10

    def test_equivariance_with_external_weights(self):
        irreps_in = Irreps("2x0e + 2x1o")
        target = Irreps("2x0e + 2x1o + 2x2e")
        paths = tensor_product_paths(irreps_in, 2, target)
        rng = np.random.default_rng(4)
        vectors = random_unit(5, seed=5)
        rotation = Rotation.from_rotvec([0.3, 0.9, -0.6]).as_matrix()
        weights = jnp.asarray(
            rng.normal(size=(5, len(paths) * 2)), dtype=jnp.float32
        )

        def run(vecs):
            feats = covariant_features(vecs, str(irreps_in), seed=6)
            harmonics = spherical_harmonics(2, jnp.asarray(vecs, jnp.float32))
            return weighted_tensor_product(
                jnp.asarray(feats, jnp.float32), harmonics, weights,
                irreps_in, 2, target, paths=paths,
            )

        out = run(vectors)
        out_rot = run(vectors @ rotation.T)
        assert_covariant(out, out_rot, str(target), rotation, atol=5e-4)


class TestRadialEmbedding:
    def test_bessel_basis_values(self):
        r = jnp.asarray([1.0, 2.5])
        basis = np.asarray(bessel_basis(r, r_max=5.0, num_basis=3))
        assert basis.shape == (2, 3)
        expected = (
            math.sqrt(2.0 / 5.0) * math.sin(math.pi * 1.0 / 5.0) / 1.0
        )
        np.testing.assert_allclose(basis[0, 0], expected, rtol=1e-6)

    def test_polynomial_cutoff_boundary_conditions(self):
        r = jnp.asarray([0.0, 2.5, 4.999, 5.0, 6.0])
        env = np.asarray(polynomial_cutoff(r, r_max=5.0, p=5))
        np.testing.assert_allclose(env[0], 1.0, atol=1e-6)
        assert 0.0 < env[1] < 1.0
        np.testing.assert_allclose(env[2], 0.0, atol=1e-5)
        np.testing.assert_array_equal(env[3:], 0.0)
        # Smooth: derivative vanishes at both ends.
        grad = jax.grad(lambda x: polynomial_cutoff(x, 5.0, 5))
        assert abs(float(grad(jnp.asarray(1e-6)))) < 1e-3
        assert abs(float(grad(jnp.asarray(5.0 - 1e-6)))) < 1e-3


def test_weighted_tensor_product_j_contracted_matches_messages():
    """The MXU-shaped J-GEMM edge formulation (round-5 MACE layout v1) must
    equal materialize-messages-then-sum to float tolerance for every path
    structure the trunk uses."""
    from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.irreps_layers import (
        weighted_tensor_product_j_contracted,
    )

    for spec_in, spec_tgt, lmax in [
        ("8x0e + 8x1o", "8x0e + 8x1o + 8x2e", 2),
        ("4x0e + 4x1o + 4x2e", "4x0e + 4x1o + 4x2e + 4x3o", 3),
        ("8x0e", "8x0e + 8x1o", 1),
    ]:
        irreps_in, irreps_tgt = Irreps(spec_in), Irreps(spec_tgt)
        paths = tensor_product_paths(irreps_in, lmax, irreps_tgt)
        channels = irreps_in[0][0]
        key = jax.random.PRNGKey(11)
        batch, natoms, pairs = 2, 3, 7
        f = jax.random.normal(key, (batch, natoms, pairs, irreps_in.dim))
        y = jax.random.normal(
            jax.random.fold_in(key, 1), (batch, natoms, pairs, (lmax + 1) ** 2)
        )
        w = jax.random.normal(
            jax.random.fold_in(key, 2),
            (batch, natoms, pairs, len(paths) * channels),
        )
        messages = weighted_tensor_product(
            f, y, w, irreps_in, lmax, irreps_tgt, paths=paths
        )
        reference = jnp.sum(messages, axis=2)
        contracted = weighted_tensor_product_j_contracted(
            f, y, w, irreps_in, lmax, irreps_tgt, paths=paths
        )
        np.testing.assert_allclose(
            np.asarray(contracted), np.asarray(reference), rtol=2e-5, atol=2e-5
        )
