r"""Equivariant neural-network primitives over flat irreps features.

The native replacements for the e3nn modules the reference's MACE-family
networks are built from (src/diffusion_for_multi_scale_molecular_dynamics/
models/diffusion_mace.py, models/score_networks/score_prediction_head.py):

* :class:`IrrepsLinear`      — e3nn ``o3.Linear``: per-(l, p) channel mixing.
* :class:`ScalarTensorProduct` — ``o3.FullyConnectedTensorProduct`` for the
  cases the reference uses it in (one operand is all-scalar: the element
  one-hot in MACE's ``skip_tp`` and the time embedding in the equivariant
  prediction head) — an element/time-conditioned linear map per irrep.
* :func:`weighted_tensor_product` — MACE's ``conv_tp``: node features
  (mul = channels) coupled with single-multiplicity spherical harmonics,
  path weights supplied externally (per edge, from the radial MLP).
* :func:`bessel_basis` / :func:`polynomial_cutoff` — MACE's radial embedding.

Everything is a dense einsum over statically-shaped blocks; coupling tables
come from :mod:`.so3` and are baked into the jaxpr as constants.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .so3 import Irreps, clebsch_gordan, concat_irreps, split_irreps

__all__ = [
    "IrrepsLinear",
    "ScalarTensorProduct",
    "tensor_product_paths",
    "weighted_tensor_product",
    "bessel_basis",
    "polynomial_cutoff",
]


def _normal_init(std: float = 1.0):
    return nn.initializers.normal(stddev=std)


class IrrepsLinear(nn.Module):
    """Equivariant linear map: mixes multiplicities within each (l, p) irrep.

    Matches e3nn ``o3.Linear`` semantics (no bias except optionally on
    scalars): output group <- sum over input groups with the same irrep of
    ``x @ w / sqrt(fan_in)`` where fan_in is the total input multiplicity
    feeding that output group.
    """

    irreps_in: str
    irreps_out: str
    use_scalar_bias: bool = False

    @nn.compact
    def __call__(self, features):
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        blocks_in = split_irreps(features, irreps_in)
        blocks_out: List[jnp.ndarray] = []
        for i_out, (mul_out, ir_out) in enumerate(irreps_out):
            sources = [
                (i_in, mul_in)
                for i_in, (mul_in, ir_in) in enumerate(irreps_in)
                if ir_in == ir_out
            ]
            fan_in = sum(mul_in for _, mul_in in sources)
            shape = features.shape[:-1] + (mul_out, ir_out.dim)
            accumulated = jnp.zeros(shape, dtype=features.dtype)
            for i_in, mul_in in sources:
                w = self.param(
                    f"w_{i_in}_{i_out}", _normal_init(), (mul_in, mul_out),
                    jnp.float32,
                )
                accumulated = accumulated + jnp.einsum(
                    "...um,uv->...vm", blocks_in[i_in], w.astype(features.dtype)
                )
            if fan_in > 0:
                accumulated = accumulated / math.sqrt(fan_in)
            if self.use_scalar_bias and ir_out.l == 0:
                b = self.param(
                    f"b_{i_out}", nn.initializers.zeros, (mul_out, 1), jnp.float32
                )
                accumulated = accumulated + b.astype(features.dtype)
            blocks_out.append(accumulated)
        return concat_irreps(blocks_out)


class ScalarTensorProduct(nn.Module):
    """FullyConnectedTensorProduct with an all-scalar (0e) first operand.

    out(l,p) = sum over (scalar group s, feature group with irrep (l,p)) of
    W[u, v, w] scalars[u] feats[v, m] / sqrt(fan_in) — exactly what the
    reference uses ``o3.FullyConnectedTensorProduct`` for: MACE's
    element-conditioned skip connection (skip_tp) and the equivariant head's
    time mixing (score_prediction_head.py:141-147).
    """

    irreps_scalars: str  # must be all l=0, even parity
    irreps_features: str
    irreps_out: str

    @nn.compact
    def __call__(self, scalars, features):
        irreps_scalars = Irreps(self.irreps_scalars)
        irreps_features = Irreps(self.irreps_features)
        irreps_out = Irreps(self.irreps_out)
        assert all(ir.l == 0 and ir.p == 1 for _, ir in irreps_scalars)
        scalar_blocks = split_irreps(scalars, irreps_scalars)
        feature_blocks = split_irreps(features, irreps_features)
        blocks_out: List[jnp.ndarray] = []
        for i_out, (mul_out, ir_out) in enumerate(irreps_out):
            sources = [
                (i_s, mul_s, i_f, mul_f)
                for i_s, (mul_s, _) in enumerate(irreps_scalars)
                for i_f, (mul_f, ir_f) in enumerate(irreps_features)
                if ir_f == ir_out
            ]
            fan_in = sum(mul_s * mul_f for _, mul_s, _, mul_f in sources)
            shape = features.shape[:-1] + (mul_out, ir_out.dim)
            accumulated = jnp.zeros(shape, dtype=features.dtype)
            for i_s, mul_s, i_f, mul_f in sources:
                w = self.param(
                    f"w_{i_s}_{i_f}_{i_out}",
                    _normal_init(),
                    (mul_s, mul_f, mul_out),
                    jnp.float32,
                )
                accumulated = accumulated + jnp.einsum(
                    "...u,...vm,uvw->...wm",
                    scalar_blocks[i_s][..., 0],
                    feature_blocks[i_f],
                    w.astype(features.dtype),
                )
            if fan_in > 0:
                accumulated = accumulated / math.sqrt(fan_in)
            blocks_out.append(accumulated)
        return concat_irreps(blocks_out)


def tensor_product_paths(
    irreps_features: Irreps, lmax_sh: int, irreps_target: Irreps
) -> Tuple[Tuple[int, int, int], ...]:
    """(feature group, l_sh, target group) triples allowed by triangle+parity.

    The instruction set of MACE's ``conv_tp`` (features (x) spherical
    harmonics -> interaction irreps) with one external weight per path and
    channel ("uvu" connectivity with single-multiplicity harmonics).
    """
    irreps_features = Irreps(irreps_features)
    irreps_target = Irreps(irreps_target)
    paths = []
    for i_f, (mul_f, ir_f) in enumerate(irreps_features):
        for l_sh in range(lmax_sh + 1):
            parity = ir_f.p * (-1) ** l_sh
            for i_t, (mul_t, ir_t) in enumerate(irreps_target):
                if ir_t.p != parity or mul_t != mul_f:
                    continue
                if not abs(ir_f.l - l_sh) <= ir_t.l <= ir_f.l + l_sh:
                    continue
                paths.append((i_f, l_sh, i_t))
    return tuple(paths)


def weighted_tensor_product(
    features,
    harmonics,
    weights,
    irreps_features: Irreps,
    lmax_sh: int,
    irreps_target: Irreps,
    paths: Optional[Sequence[Tuple[int, int, int]]] = None,
):
    """Couple node features with spherical harmonics using per-path weights.

    Args:
        features: [..., irreps_features.dim] (every group must have the same
            multiplicity = channels).
        harmonics: [..., (lmax_sh+1)**2].
        weights: [..., n_paths * channels] external path weights (from the
            radial MLP in MACE), ordered path-major.
        irreps_features / lmax_sh / irreps_target: layout metadata.

    Returns:
        [..., irreps_target.dim] coupled features, each target group
        normalized by sqrt(number of paths writing into it).
    """
    irreps_features = Irreps(irreps_features)
    irreps_target = Irreps(irreps_target)
    if paths is None:
        paths = tensor_product_paths(irreps_features, lmax_sh, irreps_target)
    feature_blocks = split_irreps(features, irreps_features)
    n_paths = len(paths)
    channels = irreps_features[0][0]
    assert weights.shape[-1] == n_paths * channels, (
        weights.shape, n_paths, channels,
    )
    path_weights = weights.reshape(weights.shape[:-1] + (n_paths, channels))

    fan_in = {i_t: 0 for i_t in range(len(irreps_target))}
    for _, _, i_t in paths:
        fan_in[i_t] += 1

    accumulators: List[Optional[jnp.ndarray]] = [None] * len(irreps_target)
    for p_index, (i_f, l_sh, i_t) in enumerate(paths):
        mul_t, ir_t = irreps_target[i_t]
        ir_f = irreps_features[i_f][1]
        coupling = jnp.asarray(
            clebsch_gordan(ir_f.l, l_sh, ir_t.l), dtype=features.dtype
        )
        y_block = harmonics[..., l_sh * l_sh:(l_sh + 1) * (l_sh + 1)]
        term = jnp.einsum(
            "abc,...ua,...b,...u->...uc",
            coupling,
            feature_blocks[i_f],
            y_block,
            path_weights[..., p_index, :],
        )
        if accumulators[i_t] is None:
            accumulators[i_t] = term
        else:
            accumulators[i_t] = accumulators[i_t] + term
    blocks_out = []
    for i_t, (mul_t, ir_t) in enumerate(irreps_target):
        block = accumulators[i_t]
        assert block is not None, f"no path reaches target group {i_t}"
        blocks_out.append(block / math.sqrt(fan_in[i_t]))
    return concat_irreps(blocks_out)


def bessel_basis(distances, r_max: float, num_basis: int):
    """MACE's Bessel radial embedding: sqrt(2/r) sin(n pi r / r_max) / r."""
    safe = jnp.where(distances > 1e-8, distances, 1.0)
    n = jnp.arange(1, num_basis + 1, dtype=distances.dtype)
    prefactor = math.sqrt(2.0 / r_max)
    return prefactor * jnp.sin(
        (math.pi / r_max) * n * distances[..., None]
    ) / safe[..., None]


def polynomial_cutoff(distances, r_max: float, p: int = 5):
    """Smooth polynomial cutoff envelope (MACE's PolynomialCutoff, order p)."""
    x = jnp.clip(distances / r_max, 0.0, 1.0)
    out = (
        1.0
        - ((p + 1.0) * (p + 2.0) / 2.0) * x**p
        + p * (p + 2.0) * x ** (p + 1)
        - (p * (p + 1.0) / 2.0) * x ** (p + 2)
    )
    return jnp.where(distances < r_max, out, 0.0)


def weighted_tensor_product_j_contracted(
    features,
    harmonics,
    weights,
    irreps_features: Irreps,
    lmax_sh: int,
    irreps_target: Irreps,
    paths: Optional[Sequence[Tuple[int, int, int]]] = None,
):
    """``sum_j weighted_tensor_product(...)`` as MXU-shaped J-GEMMs.

    Same math as ``weighted_tensor_product`` followed by a sum over the pair
    axis (features/harmonics/weights are [B, N, J, ...]; returns
    [B, N, irreps_target.dim]), but reorganized so the J contraction is a
    single batched GEMM per feature group instead of a materialize-then-
    reduce over per-edge messages:

      * group the paths by source feature group i_f;
      * left operand  L[b,n,j,(p,u,a)] = w_p[b,n,j,u] * f[b,n,j,u,a]
        (an elementwise broadcast product XLA fuses into the dot read);
      * one dot_general contracting j against the FULL harmonic row
        y[b,n,j,(lmax_sh+1)^2]  ->  O[b,n,(p,u,a),y]  (J-free, small);
      * per path, slice O at (p, y-block of l_sh) and contract the tiny
        Clebsch-Gordan [a,b,c].

    Why: the round-4 cost anatomy (experiments/round4_results.md, "Fused
    MACE edge kernel") showed the per-edge message tensor
    [B,N,J,target_dim] (~0.9 GB written + read) dominating an HBM-bound
    interaction at 3.6% MFU; contracting J inside the GEMM never
    materializes it, and K = J (e.g. 216) is an MXU-friendly contraction
    depth — unlike the fused Pallas kernel's [J,8]x[8,32] per-(atom,path)
    GEMMs that measured 2.4x slower (arch_timing_r4.json).

    Masking contract: invalid pairs must already be zeroed in ``weights``
    (exactly as for ``weighted_tensor_product``).
    """
    irreps_features = Irreps(irreps_features)
    irreps_target = Irreps(irreps_target)
    if paths is None:
        paths = tensor_product_paths(irreps_features, lmax_sh, irreps_target)
    feature_blocks = split_irreps(features, irreps_features)
    n_paths = len(paths)
    channels = irreps_features[0][0]
    assert weights.shape[-1] == n_paths * channels, (
        weights.shape, n_paths, channels,
    )
    path_weights = weights.reshape(weights.shape[:-1] + (n_paths, channels))

    fan_in = {i_t: 0 for i_t in range(len(irreps_target))}
    for _, _, i_t in paths:
        fan_in[i_t] += 1

    # Group paths by source feature block.
    groups: Dict[int, List[Tuple[int, int, int]]] = {}
    for p_index, (i_f, l_sh, i_t) in enumerate(paths):
        groups.setdefault(i_f, []).append((p_index, l_sh, i_t))

    batch_shape = features.shape[:-1]  # [B, N, J]
    accumulators: List[Optional[jnp.ndarray]] = [None] * len(irreps_target)
    for i_f, group in groups.items():
        block = feature_blocks[i_f]  # [B, N, J, u, a]
        a_dim = block.shape[-1]
        w_group = path_weights[..., [p for p, _, _ in group], :]  # [B,N,J,P,u]
        left = (
            w_group[..., None] * block[..., None, :, :]
        )  # [B, N, J, P, u, a]
        left = left.reshape(batch_shape + (len(group) * channels * a_dim,))
        # O[b, n, (p,u,a), y]: contract j on the MXU.
        coupled = jnp.einsum("bnjk,bnjy->bnky", left, harmonics)
        coupled = coupled.reshape(
            batch_shape[:2] + (len(group), channels, a_dim, harmonics.shape[-1])
        )
        for g_index, (p_index, l_sh, i_t) in enumerate(group):
            mul_t, ir_t = irreps_target[i_t]
            ir_f = irreps_features[i_f][1]
            coupling = jnp.asarray(
                clebsch_gordan(ir_f.l, l_sh, ir_t.l), dtype=features.dtype
            )
            o_slice = coupled[
                :, :, g_index, :, :, l_sh * l_sh:(l_sh + 1) * (l_sh + 1)
            ]  # [B, N, u, a, b]
            term = jnp.einsum("xyc,bnuxy->bnuc", coupling, o_slice)
            if accumulators[i_t] is None:
                accumulators[i_t] = term
            else:
                accumulators[i_t] = accumulators[i_t] + term
    blocks_out = []
    for i_t, (mul_t, ir_t) in enumerate(irreps_target):
        block = accumulators[i_t]
        assert block is not None, f"no path reaches target group {i_t}"
        blocks_out.append(block / math.sqrt(fan_in[i_t]))
    return concat_irreps(blocks_out)
