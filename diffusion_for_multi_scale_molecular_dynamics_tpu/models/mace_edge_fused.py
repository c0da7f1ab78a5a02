r"""Pallas-fused MACE edge pipeline: radial MLP + tensor product + aggregation.

Why: at production MACE shapes (32 channels, N=8 atoms, J=N*27 periodic
images, batch 256) the interaction's edge stage is HBM-bandwidth-bound, not
FLOP-bound. The dense path materializes two giant per-pair tensors per
interaction — the radial-MLP path weights [B, N, J, n_paths*U] (~0.7 GB)
and the messages [B, N, J, target_dim] (~0.9 GB) — written and re-read once
each, ~3.2 GB of traffic per interaction against ~0.05 GFLOP of useful
math. That traffic is the measured 6.97 ms / 3.6% MFU forward
(experiments/arch_timing.json, experiments/mace_profile.py).

This kernel keeps both per-pair tensors in VMEM: one grid program per
(batch element, target atom) computes the radial MLP on its [J, num_bessel]
basis rows, forms the per-path couplings against the spherical-harmonic
row block, and contracts over the pair axis J on the MXU — HBM sees only
the inputs ([J, 8] basis, [J, F] sources, [J, SH] harmonics) and the
[U, C_total] aggregated output.

Same algebra as ops/irreps_layers.py::weighted_tensor_product composed with
models/mace_modules.py::RadialMLP (the e3nn FullyConnectedNet semantics:
no biases, 1/sqrt(fan_in) weight scaling, variance-normalized silu).
``dense_edge_block`` below is the line-for-line jnp reference used for the
custom-VJP backward and for tests; the reference torch stack delegates this
stage to mace-torch/e3nn CUDA kernels (reference:
src/.../models/diffusion_mace.py:131-465 via o3.TensorProduct).

Masking contract: invalid pairs (self images, padding, beyond cutoff) must
arrive as all-zero rows of the radial basis — the MLP has no biases, so
zero basis rows produce zero path weights and therefore zero messages,
exactly equivalent to the dense path's post-MLP weight masking.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.irreps_layers import tensor_product_paths
from ..ops.so3 import Irreps, clebsch_gordan
from .mace_modules import _SILU_NORM

__all__ = [
    "EdgeBlockMeta",
    "build_edge_block_meta",
    "dense_edge_block",
    "fused_edge_block",
    "features_to_a_major",
    "output_to_irreps_flat",
]


class EdgeBlockMeta:
    """Static layout metadata shared by the dense reference and the kernel."""

    def __init__(self, irreps_features: Irreps, lmax_sh: int,
                 irreps_target: Irreps):
        self.irreps_features = Irreps(irreps_features)
        self.irreps_target = Irreps(irreps_target)
        self.lmax_sh = int(lmax_sh)
        self.paths = tensor_product_paths(
            self.irreps_features, self.lmax_sh, self.irreps_target
        )
        self.channels = self.irreps_features[0][0]
        for mul, _ in self.irreps_features:
            assert mul == self.channels, "uniform multiplicity required"
        # a-major feature layout: per group, columns ordered (a, u) with u
        # minor, so the per-(group, a) channel slice is contiguous.
        self.feature_offsets = []
        offset = 0
        for mul, ir in self.irreps_features:
            self.feature_offsets.append(offset)
            offset += mul * ir.dim
        self.feature_dim = offset
        # target groups live side by side on the last axis of the
        # [..., U, c_total] kernel output.
        self.target_offsets = []
        offset = 0
        for mul, ir in self.irreps_target:
            assert mul == self.channels
            self.target_offsets.append(offset)
            offset += ir.dim
        self.target_c_total = offset
        self.fan_in = {}
        for _, _, i_t in self.paths:
            self.fan_in[i_t] = self.fan_in.get(i_t, 0) + 1
        # Clebsch-Gordan tables per path, indexed [a][b, c] (numpy, traced
        # into the kernel as constants).
        self.couplings = []
        for i_f, l_sh, i_t in self.paths:
            table = clebsch_gordan(
                self.irreps_features[i_f][1].l, l_sh, self.irreps_target[i_t][1].l
            )
            self.couplings.append(np.asarray(table, np.float32))

    @property
    def n_paths(self) -> int:
        return len(self.paths)


def build_edge_block_meta(irreps_features, lmax_sh, irreps_target) -> EdgeBlockMeta:
    return EdgeBlockMeta(irreps_features, lmax_sh, irreps_target)


def features_to_a_major(features, meta: EdgeBlockMeta):
    """[..., irreps.dim] u-major flat -> a-major flat (per group: a outer, u inner)."""
    blocks = []
    for (mul, ir), off in zip(meta.irreps_features, meta.feature_offsets):
        block = features[..., off:off + mul * ir.dim]
        block = block.reshape(*block.shape[:-1], mul, ir.dim)
        blocks.append(
            jnp.swapaxes(block, -1, -2).reshape(*block.shape[:-2], ir.dim * mul)
        )
    return jnp.concatenate(blocks, axis=-1)


def output_to_irreps_flat(out4, meta: EdgeBlockMeta):
    """[..., U, c_total] kernel output -> [..., irreps_target.dim] flat (u-major)."""
    blocks = []
    for (mul, ir), off, i_t in zip(
        meta.irreps_target, meta.target_offsets, range(len(meta.irreps_target))
    ):
        block = out4[..., :, off:off + ir.dim]  # [..., U, dim]
        block = block / math.sqrt(meta.fan_in.get(i_t, 1))
        blocks.append(block.reshape(*block.shape[:-2], mul * ir.dim))
    return jnp.concatenate(blocks, axis=-1)


def _radial_mlp(params: Dict[str, jnp.ndarray], x):
    """e3nn FullyConnectedNet forward (mace_modules.py::RadialMLP)."""
    n_layers = len(params)
    for depth in range(n_layers):
        w = params[f"layer{depth}"].astype(x.dtype)
        x = x @ w / math.sqrt(x.shape[-1])
        if depth < n_layers - 1:
            x = jax.nn.silu(x) * _SILU_NORM
    return x


def dense_edge_block(params, radial_basis, features_a_major, harmonics,
                     meta: EdgeBlockMeta):
    """jnp reference: returns [..., U, c_total] aggregated (un-normalized).

    Args:
        params: radial MLP weights {layer0..layerK}.
        radial_basis: [B, N, J, num_bessel], zero rows for invalid pairs.
        features_a_major: [B, J, feature_dim] expanded sources, a-major.
        harmonics: [B, N, J, (lmax+1)^2].
    """
    w_all = _radial_mlp(params, radial_basis)  # [B, N, J, n_paths*U]
    U = meta.channels
    out = jnp.zeros(
        radial_basis.shape[:2] + (U, meta.target_c_total), w_all.dtype
    )
    for p_index, (i_f, l_sh, i_t) in enumerate(meta.paths):
        ir_f = meta.irreps_features[i_f][1]
        w_p = w_all[..., p_index * U:(p_index + 1) * U]  # [B, N, J, U]
        y_blk = harmonics[..., l_sh * l_sh:(l_sh + 1) * (l_sh + 1)]
        c_off = meta.target_offsets[i_t]
        c_dim = meta.irreps_target[i_t][1].dim
        coupling = jnp.asarray(meta.couplings[p_index], w_all.dtype)
        for a in range(ir_f.dim):
            f_off = meta.feature_offsets[i_f] + a * U
            f_a = features_a_major[..., f_off:f_off + U]  # [B, J, U]
            # G[b,i,j,u] = f_a[b,j,u] * w_p[b,i,j,u]; M[b,i,u,b'] = sum_j G*y
            m = jnp.einsum(
                "bju,biju,bijy->biuy", f_a, w_p, y_blk.astype(w_all.dtype)
            )
            out = out.at[..., :, c_off:c_off + c_dim].add(
                jnp.einsum("biuy,yc->biuc", m, coupling[a])
            )
    return out


def _path_expanded_layout(meta: EdgeBlockMeta):
    """Column layout [sum_p a_p * U] with one (path, a)-major block per path.

    Both the expanded source features and the expanded radial weights use
    it, so the kernel's G = f_exp * w_exp is a single elementwise multiply
    and each path's J-contraction is one contiguous column slice.
    """
    spans = []
    offset = 0
    for i_f, _, _ in meta.paths:
        a_dim = meta.irreps_features[i_f][1].dim
        spans.append((offset, a_dim))
        offset += a_dim * meta.channels
    return spans, offset


def expand_features_for_paths(features_a_major, meta: EdgeBlockMeta):
    """[..., feature_dim] a-major -> [..., sum_p a_p*U] path-expanded."""
    U = meta.channels
    pieces = []
    for i_f, _, _ in meta.paths:
        a_dim = meta.irreps_features[i_f][1].dim
        off = meta.feature_offsets[i_f]
        pieces.append(features_a_major[..., off:off + a_dim * U])
    return jnp.concatenate(pieces, axis=-1)


def expand_last_layer_for_paths(w_last, meta: EdgeBlockMeta):
    """[H, n_paths*U] -> [H, sum_p a_p*U]: per-path column block repeated a_p x."""
    U = meta.channels
    pieces = []
    for p_index, (i_f, _, _) in enumerate(meta.paths):
        a_dim = meta.irreps_features[i_f][1].dim
        block = w_last[:, p_index * U:(p_index + 1) * U]
        pieces.extend([block] * a_dim)
    return jnp.concatenate(pieces, axis=-1)


def _edge_kernel(
    rb_ref, f_ref, y_ref, *param_refs, out_ref, meta: EdgeBlockMeta,
    n_mlp_layers: int, param_names: Sequence[str], natoms: int, n_pairs: int,
):
    """One grid program per batch element (v2).

    The v1 kernel ran one program per (batch element, target atom) and was
    grid-overhead-bound: 2048 programs x ~10 us beat the dense path's
    6.96 ms outright (experiments/mace_profile.json, full_fused_ms 21.4).
    v2 collapses the grid to (batch,) and batches the per-(path, a)
    channel multiplies into one elementwise product on the path-expanded
    layout, leaving ~n_paths J-contraction GEMMs per target atom.

    param_refs = MLP weights (last layer pre-expanded to the path layout),
    then one Clebsch-Gordan [b, c] slice per (path, a).
    """
    params = {name: ref[:] for name, ref in zip(param_names, param_refs)}
    coupling_refs = param_refs[len(param_names):]
    spans, _ = _path_expanded_layout(meta)

    rb = rb_ref[0]  # [N*J, num_bessel]
    f = f_ref[0]  # [J, P] path-expanded sources
    y = y_ref[0]  # [N*J, SH]

    x = rb
    for depth in range(n_mlp_layers):
        w = params[f"layer{depth}"]
        x = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (1.0 / math.sqrt(w.shape[0]))
        if depth < n_mlp_layers - 1:
            x = jax.nn.silu(x) * _SILU_NORM
    w_rep = x  # [N*J, P] (last layer pre-expanded to the path layout)

    U = meta.channels
    for i in range(natoms):
        g = f * w_rep[i * n_pairs:(i + 1) * n_pairs, :]  # [J, P]
        y_i = y[i * n_pairs:(i + 1) * n_pairs, :]  # [J, SH]
        accumulators = [
            jnp.zeros((U, ir.dim), jnp.float32) for _, ir in meta.irreps_target
        ]
        coupling_index = 0
        for p_index, (i_f, l_sh, i_t) in enumerate(meta.paths):
            offset, a_dim = spans[p_index]
            y_blk = y_i[:, l_sh * l_sh:(l_sh + 1) * (l_sh + 1)]  # [J, b]
            # One J-contraction GEMM per path: [a*U, J] @ [J, b].
            m = jax.lax.dot_general(
                g[:, offset:offset + a_dim * U], y_blk,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [a*U, b]
            for a in range(a_dim):
                c_a = coupling_refs[coupling_index][:]  # [b, c]
                coupling_index += 1
                accumulators[i_t] = accumulators[i_t] + jax.lax.dot_general(
                    m[a * U:(a + 1) * U, :], c_a,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        # Per-group slice stores (a lane-dim concatenate may not lower on
        # all Mosaic versions; sliced stores always do).
        for i_t, acc in enumerate(accumulators):
            c_off = meta.target_offsets[i_t]
            c_dim = meta.irreps_target[i_t][1].dim
            out_ref[0, i, :, c_off:c_off + c_dim] = acc


def pallas_edge_block(params, radial_basis, features_a_major, harmonics,
                      meta: EdgeBlockMeta):
    """Fused forward. Shapes as in dense_edge_block; output [B, N, U, c_total]."""
    batch, natoms, n_pairs, num_bessel = radial_basis.shape
    param_names = sorted(params)
    n_mlp_layers = len(param_names)
    last = param_names[-1]
    param_values = [
        expand_last_layer_for_paths(params[name], meta) if name == last
        else params[name]
        for name in param_names
    ]
    # One CG slice per (path, a), in kernel traversal order.
    coupling_values = [
        jnp.asarray(meta.couplings[p_index][a], jnp.float32)
        for p_index, (i_f, _, _) in enumerate(meta.paths)
        for a in range(meta.irreps_features[i_f][1].dim)
    ]
    param_values = param_values + coupling_values

    _, expanded_dim = _path_expanded_layout(meta)
    f_expanded = expand_features_for_paths(features_a_major, meta)
    rb_flat = radial_basis.reshape(batch, natoms * n_pairs, num_bessel)
    y_flat = harmonics.reshape(batch, natoms * n_pairs, harmonics.shape[-1])

    kernel = functools.partial(
        _edge_kernel,
        meta=meta,
        n_mlp_layers=n_mlp_layers,
        param_names=param_names,
        natoms=natoms,
        n_pairs=n_pairs,
    )

    replicated = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct(
        (batch, natoms, meta.channels, meta.target_c_total), jnp.float32
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        lambda *refs: kernel(*refs[:-1], out_ref=refs[-1]),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(
                (1, natoms * n_pairs, num_bessel), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_pairs, expanded_dim), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, natoms * n_pairs, harmonics.shape[-1]),
                lambda b: (b, 0, 0), memory_space=pltpu.VMEM,
            ),
        ] + [replicated(v.shape) for v in param_values],
        out_specs=pl.BlockSpec(
            (1, natoms, meta.channels, meta.target_c_total),
            lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(rb_flat, f_expanded, y_flat, *param_values)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_edge_block(params, radial_basis, features_a_major, harmonics,
                     meta: EdgeBlockMeta):
    """Pallas forward; backward recomputes through the dense reference."""
    return pallas_edge_block(params, radial_basis, features_a_major,
                             harmonics, meta)


def _fwd(params, radial_basis, features_a_major, harmonics, meta):
    out = fused_edge_block(params, radial_basis, features_a_major, harmonics,
                           meta)
    return out, (params, radial_basis, features_a_major, harmonics)


def _bwd(meta, residuals, cotangent):
    params, radial_basis, features_a_major, harmonics = residuals
    _, vjp = jax.vjp(
        lambda p, rb, f, y: dense_edge_block(p, rb, f, y, meta),
        params, radial_basis, features_a_major, harmonics,
    )
    return vjp(cotangent)


fused_edge_block.defvjp(_fwd, _bwd)
