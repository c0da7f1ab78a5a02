"""Tests for the native SO(3) layer (ops/so3.py).

The ground truth is mathematics, not a library: spherical harmonics are
checked against the addition theorem and scipy's complex harmonics, and the
Clebsch-Gordan couplings are checked by *fitting* Wigner-D matrices from the
harmonics of rotated points and asserting the intertwining property. If the
harmonic and coupling conventions ever drift apart, these tests fail.
"""

import math

import numpy as np
import pytest
from scipy.spatial.transform import Rotation
from scipy.special import eval_legendre, sph_harm_y

from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.so3 import (
    Irrep,
    Irreps,
    clebsch_gordan,
    concat_irreps,
    coupling_paths,
    irrep_to_vector,
    spherical_harmonics,
    split_irreps,
    vector_to_irrep,
)

LMAX = 3


def random_unit_vectors(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def sh_block(l, vectors):
    flat = np.asarray(spherical_harmonics(LMAX, vectors))
    return flat[..., l * l:(l + 1) * (l + 1)]


def fit_wigner_d(l, rotation_matrix, seed=1):
    """Solve Y_l(R v) = D_l Y_l(v) for D_l in the least-squares sense."""
    v = random_unit_vectors(64, seed=seed)
    y = sh_block(l, v)
    y_rotated = sh_block(l, v @ rotation_matrix.T)
    d, residuals, *_ = np.linalg.lstsq(
        y.astype(np.float64), y_rotated.astype(np.float64), rcond=None
    )
    d = d.T  # y_rotated = y @ d.T  =>  Y(Rv) = D Y(v)
    # The harmonics are evaluated in float32; the fit is exact to that noise.
    assert np.allclose(y_rotated, y @ d.T, atol=1e-4)
    return d


class TestSphericalHarmonics:
    def test_component_normalization_sum_rule(self):
        v = random_unit_vectors(128)
        flat = np.asarray(spherical_harmonics(LMAX, v))
        for l in range(LMAX + 1):
            block = flat[:, l * l:(l + 1) * (l + 1)]
            np.testing.assert_allclose(
                np.sum(block**2, axis=-1), 2 * l + 1, rtol=1e-5
            )

    def test_addition_theorem(self):
        """sum_m Y_lm(u) Y_lm(w) = (2l+1) P_l(u . w)."""
        u = random_unit_vectors(32, seed=2)
        w = random_unit_vectors(32, seed=3)
        cos = np.sum(u * w, axis=-1)
        for l in range(LMAX + 1):
            lhs = np.sum(sh_block(l, u) * sh_block(l, w), axis=-1)
            rhs = (2 * l + 1) * eval_legendre(l, cos)
            np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    @pytest.mark.parametrize("l", range(LMAX + 1))
    def test_against_scipy_complex_harmonics(self, l):
        """Real harmonics = Condon-Shortley real combinations of scipy's Y_l^m."""
        v = random_unit_vectors(16, seed=4)
        theta = np.arccos(np.clip(v[:, 2], -1, 1))
        phi = np.arctan2(v[:, 1], v[:, 0])
        ours = sh_block(l, v) / math.sqrt(4 * math.pi)  # back to orthonormal
        for m in range(-l, l + 1):
            y_complex = sph_harm_y(l, abs(m), theta, phi)
            if m > 0:
                expected = (-1) ** m * math.sqrt(2) * y_complex.real
            elif m < 0:
                expected = (-1) ** m * math.sqrt(2) * y_complex.imag
            else:
                expected = y_complex.real
            np.testing.assert_allclose(ours[:, l + m], expected, atol=1e-7)

    def test_l1_is_permuted_vector(self):
        v = random_unit_vectors(8, seed=5)
        np.testing.assert_allclose(
            sh_block(1, v), math.sqrt(3.0) * np.asarray(vector_to_irrep(v)), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(irrep_to_vector(vector_to_irrep(v))), v, atol=1e-12
        )

    def test_zero_vector_needs_masking(self):
        """Y_l(0) is nonzero for even l — the documented masking contract."""
        flat = np.asarray(spherical_harmonics(LMAX, np.zeros((1, 3))))[0]
        assert flat[0] == 1.0
        np.testing.assert_allclose(flat[1:4], 0.0)  # l=1
        assert abs(flat[6]) > 0.1  # l=2, m=0 is a constant at the origin
        np.testing.assert_allclose(flat[9:16], 0.0)  # l=3

    @pytest.mark.parametrize("l", range(1, LMAX + 1))
    def test_rotation_equivariance_and_parity(self, l):
        rotation = Rotation.from_rotvec([0.3, -1.1, 0.7]).as_matrix()
        d = fit_wigner_d(l, rotation)
        np.testing.assert_allclose(d @ d.T, np.eye(2 * l + 1), atol=1e-4)
        # Parity: Y_l(-v) = (-1)^l Y_l(v).
        v = random_unit_vectors(8, seed=6)
        np.testing.assert_allclose(
            sh_block(l, -v), (-1) ** l * sh_block(l, v), atol=1e-8
        )


class TestClebschGordan:
    def all_triples(self):
        return [
            (l1, l2, l3)
            for l1 in range(LMAX + 1)
            for l2 in range(LMAX + 1)
            for l3 in range(LMAX + 1)
            if abs(l1 - l2) <= l3 <= l1 + l2
        ]

    def test_unit_frobenius_norm(self):
        for triple in self.all_triples():
            np.testing.assert_allclose(
                np.linalg.norm(clebsch_gordan(*triple)), 1.0, rtol=1e-10
            )

    def test_triangle_violation_is_zero(self):
        assert not np.any(clebsch_gordan(0, 1, 3))
        assert not np.any(clebsch_gordan(3, 1, 1))

    def test_intertwining_property(self):
        """C contracted with D_l1, D_l2 equals D_l3 applied to the output index."""
        rotation = Rotation.from_rotvec([1.2, 0.4, -0.8]).as_matrix()
        d = {l: fit_wigner_d(l, rotation, seed=7 + l) for l in range(LMAX + 1)}
        for l1, l2, l3 in self.all_triples():
            c = clebsch_gordan(l1, l2, l3)
            lhs = np.einsum("abc,aA,bB->ABc", c, d[l1], d[l2])
            rhs = np.einsum("ABC,cC->ABc", c, d[l3])
            np.testing.assert_allclose(lhs, rhs, atol=1e-4, err_msg=str((l1, l2, l3)))

    def test_couples_harmonics_of_same_vector(self):
        """C(l1,l2->l3) applied to (Y_l1(v), Y_l2(v)) is proportional to Y_l3(v)."""
        v = random_unit_vectors(16, seed=8)
        c = clebsch_gordan(1, 1, 2)
        coupled = np.einsum("abc,na,nb->nc", c, sh_block(1, v), sh_block(1, v))
        y2 = sh_block(2, v)
        ratio = coupled / y2
        np.testing.assert_allclose(ratio, ratio[0, 0], rtol=1e-5)

    def test_l0_coupling_is_identity_scaling(self):
        c = clebsch_gordan(0, 2, 2)
        np.testing.assert_allclose(
            np.abs(c[0]), np.eye(5) / math.sqrt(5.0), atol=1e-10
        )


class TestIrreps:
    def test_parse_and_dim(self):
        irreps = Irreps("128x0e + 128x1o")
        assert irreps.dim == 128 + 128 * 3
        assert irreps.num_irreps == 256
        assert irreps.lmax == 1
        assert repr(irreps) == "128x0e + 128x1o"

    def test_sort_and_simplify(self):
        irreps = Irreps("4x1o + 2x0e + 3x0e")
        sorted_irreps, order = irreps.sort()
        assert repr(sorted_irreps) == "2x0e + 3x0e + 4x1o"
        assert order == [1, 2, 0]
        assert repr(sorted_irreps.simplify()) == "5x0e + 4x1o"

    def test_slices_split_concat_roundtrip(self):
        irreps = Irreps("2x0e + 3x1o + 1x2e")
        rng = np.random.default_rng(9)
        flat = rng.normal(size=(4, irreps.dim))
        blocks = split_irreps(flat, irreps)
        assert [b.shape[-2:] for b in blocks] == [(2, 1), (3, 3), (1, 5)]
        np.testing.assert_allclose(np.asarray(concat_irreps(blocks)), flat)

    def test_coupling_paths_parity(self):
        paths = coupling_paths(
            Irreps("1x0e + 1x1o"), Irreps("1x1o"), Irreps("1x0e + 1x1o + 1x2e")
        )
        # 0e x 1o -> 1o; 1o x 1o -> 0e, 2e (1o x 1o -> 1o is parity-even
        # output, so 1x1o target is excluded: p1*p2 = +1 != -1).
        assert (0, 0, 1) in paths
        assert (1, 0, 0) in paths
        assert (1, 0, 2) in paths
        assert (1, 0, 1) not in paths

    def test_irrep_parse(self):
        assert Irrep.parse("2e") == Irrep(2, 1)
        assert Irrep.parse("3o") == Irrep(3, -1)
        assert Irrep(1, -1).dim == 3
