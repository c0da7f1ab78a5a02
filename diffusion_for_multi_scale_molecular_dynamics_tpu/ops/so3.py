r"""SO(3) irreducible representations: real spherical harmonics, Clebsch-Gordan
couplings, and irreps bookkeeping.

The reference delegates all of this to e3nn (``o3.Irreps``, ``o3.spherical_harmonics``,
``o3.TensorProduct`` — used by src/diffusion_for_multi_scale_molecular_dynamics/models/
diffusion_mace.py:131-465 and models/mace_utils.py). This module is the native
TPU-first replacement: every constant is precomputed on the host as a dense
numpy table at trace time, and every runtime op is a dense einsum (MXU-friendly,
no Clebsch-Gordan gathers or scatter ops).

Conventions (documented because they define the on-disk parameter layout):

* Real spherical harmonics in the standard z-polar, Condon-Shortley-derived
  real basis (Wikipedia "Table of real spherical harmonics"), components
  ordered m = -l..l, with "component" normalization: sum_m Y_lm(u)^2 = 2l+1
  on unit vectors (= sqrt(4 pi) times the orthonormal harmonics).
* A Cartesian vector (x, y, z) maps onto the l=1 basis as (y, z, x); use
  `vector_to_irrep` / `irrep_to_vector`.
* Flat irreps feature layout matches e3nn: contiguous blocks per irrep group,
  each block mul-major, i.e. [mul, 2l+1] row-major.
* Y_l of the zero vector is NOT zero for even l (the m=0 component is a
  constant): callers must mask self-edges / padded edges *after* evaluating
  the harmonics, exactly like the radial cutoff masks messages.
* Coupling tensors are normalized to unit Frobenius norm (Wigner-3j-like),
  with an overall phase fixed so entries are real; equivariance (not any
  external sign convention) is the contract, enforced by tests/test_so3.py.
"""

from __future__ import annotations

import functools
import math
import re
from dataclasses import dataclass
from fractions import Fraction
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "Irrep",
    "Irreps",
    "spherical_harmonics",
    "clebsch_gordan",
    "vector_to_irrep",
    "irrep_to_vector",
    "split_irreps",
    "concat_irreps",
]


# ---------------------------------------------------------------------------
# Irreps bookkeeping
# ---------------------------------------------------------------------------


@dataclass(frozen=True, order=True)
class Irrep:
    """A single O(3) irrep: angular momentum l and parity p (+1 even / -1 odd)."""

    l: int
    p: int

    def __post_init__(self):
        assert self.l >= 0 and self.p in (1, -1)

    @property
    def dim(self) -> int:
        return 2 * self.l + 1

    def __repr__(self) -> str:
        return f"{self.l}{'e' if self.p == 1 else 'o'}"

    @staticmethod
    def parse(token: str) -> "Irrep":
        match = re.fullmatch(r"(\d+)([eo])", token.strip())
        assert match, f"cannot parse irrep {token!r}"
        return Irrep(int(match.group(1)), 1 if match.group(2) == "e" else -1)


class Irreps(tuple):
    """A direct sum of irreps with multiplicities: ((mul, Irrep), ...).

    Mirrors the subset of e3nn's ``o3.Irreps`` the reference relies on
    (parsing, dim, slices, concatenation, sorting) — models/mace_utils.py:72-100
    builds and sorts these strings for the MACE output features.
    """

    def __new__(cls, spec) -> "Irreps":
        if isinstance(spec, Irreps):
            return spec
        if isinstance(spec, str):
            entries = []
            for chunk in spec.split("+"):
                chunk = chunk.strip()
                if not chunk:
                    continue
                if "x" in chunk:
                    mul_text, irrep_text = chunk.split("x")
                    entries.append((int(mul_text), Irrep.parse(irrep_text)))
                else:
                    entries.append((1, Irrep.parse(chunk)))
            return super().__new__(cls, entries)
        normalized = []
        for mul, irrep in spec:
            if not isinstance(irrep, Irrep):
                irrep = Irrep.parse(irrep) if isinstance(irrep, str) else Irrep(*irrep)
            normalized.append((int(mul), irrep))
        return super().__new__(cls, normalized)

    @property
    def dim(self) -> int:
        return sum(mul * irrep.dim for mul, irrep in self)

    @property
    def num_irreps(self) -> int:
        return sum(mul for mul, _ in self)

    @property
    def lmax(self) -> int:
        return max(irrep.l for _, irrep in self)

    def slices(self) -> List[slice]:
        out, start = [], 0
        for mul, irrep in self:
            out.append(slice(start, start + mul * irrep.dim))
            start += mul * irrep.dim
        return out

    def __add__(self, other) -> "Irreps":
        return Irreps(tuple(self) + tuple(Irreps(other)))

    def __repr__(self) -> str:
        return " + ".join(f"{mul}x{irrep}" for mul, irrep in self)

    def sort(self) -> Tuple["Irreps", List[int]]:
        """Sorted by (l, p); returns (sorted_irreps, permutation of groups)."""
        order = sorted(
            range(len(self)), key=lambda i: (self[i][1].l, -self[i][1].p)
        )
        return Irreps([self[i] for i in order]), order

    def simplify(self) -> "Irreps":
        """Merge adjacent groups with identical irreps."""
        merged: List[Tuple[int, Irrep]] = []
        for mul, irrep in self:
            if merged and merged[-1][1] == irrep:
                merged[-1] = (merged[-1][0] + mul, irrep)
            else:
                merged.append((mul, irrep))
        return Irreps(merged)


def split_irreps(features, irreps: Irreps) -> List[jnp.ndarray]:
    """Split a flat [..., irreps.dim] array into per-group [..., mul, 2l+1] blocks."""
    irreps = Irreps(irreps)
    assert features.shape[-1] == irreps.dim, (features.shape, irreps)
    blocks = []
    for (mul, irrep), block_slice in zip(irreps, irreps.slices()):
        block = features[..., block_slice]
        blocks.append(block.reshape(*block.shape[:-1], mul, irrep.dim))
    return blocks


def concat_irreps(blocks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of :func:`split_irreps`: flatten [..., mul, 2l+1] blocks and concat."""
    flat = [b.reshape(*b.shape[:-2], b.shape[-2] * b.shape[-1]) for b in blocks]
    return jnp.concatenate(flat, axis=-1)


# ---------------------------------------------------------------------------
# Real spherical harmonics (component normalization, m = -l..l)
# ---------------------------------------------------------------------------

# A Cartesian (x, y, z) vector written in the l=1 irrep basis is (y, z, x).
_VEC_TO_IRREP = (1, 2, 0)
_IRREP_TO_VEC = (2, 0, 1)


def vector_to_irrep(vectors):
    """[..., 3] Cartesian vectors -> l=1 irrep components (y, z, x)."""
    return vectors[..., _VEC_TO_IRREP]


def irrep_to_vector(components):
    """[..., 3] l=1 irrep components -> Cartesian vectors."""
    return components[..., _IRREP_TO_VEC]


def spherical_harmonics(lmax: int, unit_vectors, *, dtype=None):
    """Real spherical harmonics of unit vectors, flat over l = 0..lmax.

    Args:
        lmax: maximum angular momentum (supported up to 3 — MACE's foundation
            models use max_ell=3; the reference's fresh config uses 2).
        unit_vectors: [..., 3] unit Cartesian vectors.

    Returns:
        [..., (lmax+1)**2] array, blocks ordered l=0,1,..,lmax, each m=-l..l,
        component normalization (sum_m Y_lm^2 = 2l+1 on the unit sphere).
    """
    assert 0 <= lmax <= 3, "spherical_harmonics implemented for lmax <= 3"
    x = unit_vectors[..., 0]
    y = unit_vectors[..., 1]
    z = unit_vectors[..., 2]
    one = jnp.ones_like(x)

    blocks = [one[..., None]]
    if lmax >= 1:
        s3 = math.sqrt(3.0)
        blocks.append(jnp.stack([s3 * y, s3 * z, s3 * x], axis=-1))
    if lmax >= 2:
        s15 = math.sqrt(15.0)
        s5 = math.sqrt(5.0)
        blocks.append(
            jnp.stack(
                [
                    s15 * x * y,
                    s15 * y * z,
                    0.5 * s5 * (3.0 * z * z - 1.0),
                    s15 * x * z,
                    0.5 * s15 * (x * x - y * y),
                ],
                axis=-1,
            )
        )
    if lmax >= 3:
        c3m3 = math.sqrt(35.0 / 8.0)
        c3m2 = math.sqrt(105.0)
        c3m1 = math.sqrt(21.0 / 8.0)
        c30 = 0.5 * math.sqrt(7.0)
        c32 = 0.5 * math.sqrt(105.0)
        blocks.append(
            jnp.stack(
                [
                    c3m3 * y * (3.0 * x * x - y * y),
                    c3m2 * x * y * z,
                    c3m1 * y * (5.0 * z * z - 1.0),
                    c30 * z * (5.0 * z * z - 3.0),
                    c3m1 * x * (5.0 * z * z - 1.0),
                    c32 * z * (x * x - y * y),
                    c3m3 * x * (x * x - 3.0 * y * y),
                ],
                axis=-1,
            )
        )
    out = jnp.concatenate(blocks, axis=-1)
    if dtype is not None:
        out = out.astype(dtype)
    return out


def spherical_harmonics_irreps(lmax: int) -> Irreps:
    """Irreps of the flat spherical-harmonics output: 1x0e + 1x1o + ... (p = (-1)^l)."""
    return Irreps([(1, Irrep(l, (-1) ** l)) for l in range(lmax + 1)])


# ---------------------------------------------------------------------------
# Clebsch-Gordan couplings in the real basis
# ---------------------------------------------------------------------------


def _exact_sqrt(value: Fraction) -> float:
    return math.copysign(math.sqrt(abs(float(value))), float(value))


@functools.lru_cache(maxsize=None)
def _complex_clebsch_gordan(l1: int, l2: int, l3: int) -> np.ndarray:
    """<l1 m1, l2 m2 | l3 m3> via Racah's formula (exact rational arithmetic)."""
    f = math.factorial
    table = np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    if not abs(l1 - l2) <= l3 <= l1 + l2:
        return table
    delta = Fraction(
        f(l1 + l2 - l3) * f(l1 - l2 + l3) * f(-l1 + l2 + l3), f(l1 + l2 + l3 + 1)
    )
    for m1 in range(-l1, l1 + 1):
        for m2 in range(-l2, l2 + 1):
            m3 = m1 + m2
            if abs(m3) > l3:
                continue
            prefactor = (
                Fraction(2 * l3 + 1)
                * delta
                * f(l1 + m1) * f(l1 - m1)
                * f(l2 + m2) * f(l2 - m2)
                * f(l3 + m3) * f(l3 - m3)
            )
            total = Fraction(0)
            k_min = max(0, l2 - l3 - m1, l1 - l3 + m2)
            k_max = min(l1 + l2 - l3, l1 - m1, l2 + m2)
            for k in range(k_min, k_max + 1):
                denominator = (
                    f(k)
                    * f(l1 + l2 - l3 - k)
                    * f(l1 - m1 - k)
                    * f(l2 + m2 - k)
                    * f(l3 - l2 + m1 + k)
                    * f(l3 - l1 - m2 + k)
                )
                total += Fraction((-1) ** k, denominator)
            table[l1 + m1, l2 + m2, l3 + m3] = _exact_sqrt(prefactor) * float(total)
    return table


@functools.lru_cache(maxsize=None)
def _real_basis_change(l: int) -> np.ndarray:
    """Unitary U with Y_real[m] = sum_m' U[m, m'] Y_complex[m'] (Condon-Shortley)."""
    u = np.zeros((2 * l + 1, 2 * l + 1), dtype=complex)
    u[l, l] = 1.0
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for m in range(1, l + 1):
        sign = (-1.0) ** m
        # Y_{l, m} = ((-1)^m Y^m + Y^{-m}) / sqrt(2)
        u[l + m, l + m] = sign * inv_sqrt2
        u[l + m, l - m] = inv_sqrt2
        # Y_{l,-m} = ((-1)^m Y^m - Y^{-m}) / (i sqrt(2))
        u[l - m, l + m] = -1j * sign * inv_sqrt2
        u[l - m, l - m] = 1j * inv_sqrt2
    return u


@functools.lru_cache(maxsize=None)
def clebsch_gordan(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real-basis coupling tensor C[a, b, c]: (l1 (x) l2 -> l3), unit Frobenius norm.

    out[c] = sum_{a,b} C[a, b, c] x[a] y[b] transforms as an l3 irrep whenever
    x, y transform as l1, l2 (in the real spherical-harmonic basis above).
    Zero tensor when the triangle inequality fails.
    """
    complex_cg = _complex_clebsch_gordan(l1, l2, l3)
    if not np.any(complex_cg):
        return np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    u1 = _real_basis_change(l1)
    u2 = _real_basis_change(l2)
    u3 = _real_basis_change(l3)
    table = np.einsum(
        "Aa,Bb,Cc,abc->ABC", u1.conj(), u2.conj(), u3, complex_cg.astype(complex)
    )
    # The result is purely real or purely imaginary depending on l1+l2+l3
    # parity; rotate the global phase to land on the real axis.
    real_norm = np.abs(table.real).max()
    imag_norm = np.abs(table.imag).max()
    if imag_norm > real_norm:
        table = table * (-1j)
    assert np.abs(table.imag).max() < 1e-10 * max(np.abs(table.real).max(), 1e-30)
    result = table.real
    return result / np.linalg.norm(result)


@functools.lru_cache(maxsize=None)
def coupling_paths(
    irreps_in1: Irreps, irreps_in2: Irreps, irreps_out: Irreps
) -> Tuple[Tuple[int, int, int], ...]:
    """All (i1, i2, i_out) group-index triples allowed by triangle + parity."""
    paths = []
    for i1, (_, ir1) in enumerate(Irreps(irreps_in1)):
        for i2, (_, ir2) in enumerate(Irreps(irreps_in2)):
            for i_out, (_, ir3) in enumerate(Irreps(irreps_out)):
                if ir1.p * ir2.p != ir3.p:
                    continue
                if not abs(ir1.l - ir2.l) <= ir3.l <= ir1.l + ir2.l:
                    continue
                paths.append((i1, i2, i_out))
    return tuple(paths)
