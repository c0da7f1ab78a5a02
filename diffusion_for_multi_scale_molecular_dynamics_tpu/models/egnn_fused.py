r"""Fused EGNN message block: Pallas kernel + algebraically identical jnp path.

The E(n)-GCL hot loop evaluates, for every ordered pair (i, j):

    m_ij   = MLP_msg([h_i, h_j, r2_ij])        (L_m layers, width H)
    phi_ij = MLP_coord(m_ij) -> scalar          (L_c layers, width H)
    m_i    = agg_j w_ij m_ij
    (z update uses phi_ij outside this block)

Two optimizations, shared by both paths:

  1. *Layer-0 factorization.* The first message layer's [N^2, 2F+1] x
     [2F+1, H] matmul splits exactly into two [N, F] x [F, H] matmuls plus a
     broadcast add (m0_ij = u_i + v_j + r2_ij * w_r + b0), removing the only
     O(N^2 F H) contraction entirely.
  2. *Fusion (Pallas path).* The [B, N, N, H] message activations (hundreds
     of MB per layer at production shapes) never leave VMEM: one kernel
     program per batch element computes the full per-pair MLP stack and the
     weighted aggregation in on-chip memory, writing only m_agg [B, N, H]
     and the pair gate phi [B, N, N] back to HBM.

Gradients: the fused op carries a custom VJP whose backward recomputes
through the jnp path (rematerialization) — training works, and the
inference-heavy sampling loop gets the full fused speedup.

Matmuls run in bfloat16 with float32 accumulation; aggregation is float32.
"""

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def init_message_block_params(
    rng, feature_size: int, hidden_size: int, n_message_layers: int,
    n_coordinate_layers: int, coordinate_hidden_size: int,
):
    """Parameter pytree of the fused block (lecun-normal kernels, zero biases).

    message_w0 keeps the un-split [2F+1, H] layout so initialization
    statistics match a single dense layer over the concatenated inputs.
    """
    initializer = jax.nn.initializers.lecun_normal()
    keys = jax.random.split(rng, n_message_layers + n_coordinate_layers + 3)
    params = {
        "message_w0": initializer(keys[0], (2 * feature_size + 1, hidden_size)),
        "message_b0": jnp.zeros((hidden_size,)),
    }
    k = 1
    for layer in range(1, n_message_layers):
        params[f"message_w{layer}"] = initializer(
            keys[k], (hidden_size, hidden_size)
        )
        params[f"message_b{layer}"] = jnp.zeros((hidden_size,))
        k += 1
    in_size = hidden_size
    for layer in range(n_coordinate_layers):
        params[f"coord_w{layer}"] = initializer(
            keys[k], (in_size, coordinate_hidden_size)
        )
        params[f"coord_b{layer}"] = jnp.zeros((coordinate_hidden_size,))
        in_size = coordinate_hidden_size
        k += 1
    params["coord_wf"] = initializer(keys[k], (in_size, 1))
    return params


def _bf16_matmul(x, w, b=None):
    # Explicit DEFAULT precision: the framework's global float32-precision
    # policy must not reach these intentionally-bf16 contractions (Mosaic
    # rejects fp32 contract precision on bf16 operands).
    out = jnp.dot(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    if b is not None:
        out = out + b
    return out


def _message_stack(params, h, radial, n_message_layers, n_coordinate_layers, tanh):
    """Shared math: per-pair message MLP + coordinate gate.

    Args:
        h: [N, F]; radial: [N, N] (squared distances).

    Returns:
        m [N, N, H] float32, phi [N, N] float32.
    """
    w0 = params["message_w0"]
    feature_size = h.shape[-1]
    u = _bf16_matmul(h, w0[:feature_size])  # [N, H]
    v = _bf16_matmul(h, w0[feature_size : 2 * feature_size])  # [N, H]
    w_radial = w0[2 * feature_size :]  # [1, H]

    m = (
        u[:, None, :]
        + v[None, :, :]
        + radial[:, :, None] * w_radial[None, :, :]
        + params["message_b0"].reshape(1, 1, -1)
    )
    m = jax.nn.silu(m)
    n = h.shape[0]
    hidden = m.shape[-1]
    m = m.reshape(n * n, hidden)
    for layer in range(1, n_message_layers):
        m = jax.nn.silu(
            _bf16_matmul(m, params[f"message_w{layer}"], params[f"message_b{layer}"])
        )

    p = m
    for layer in range(n_coordinate_layers):
        p = jax.nn.silu(
            _bf16_matmul(p, params[f"coord_w{layer}"], params[f"coord_b{layer}"])
        )
    phi = _bf16_matmul(p, params["coord_wf"])  # [N*N, 1]
    if tanh:
        phi = jnp.tanh(phi)
    return m.reshape(n, n, hidden), phi.reshape(n, n)


def dense_message_block(
    params, h, radial, edge_weights, *, n_message_layers, n_coordinate_layers, tanh
):
    """jnp reference path (used for gradients and as the fallback).

    Args:
        h [B, N, F], radial [B, N, N], edge_weights [B, N, N].

    Returns:
        m_agg [B, N, H] (weighted *sum* over sources), phi [B, N, N].
    """

    def per_sample(h_b, radial_b, w_b):
        m, phi = _message_stack(
            params, h_b, radial_b, n_message_layers, n_coordinate_layers, tanh
        )
        m_agg = jnp.sum(m * w_b[:, :, None], axis=1)
        return m_agg, phi

    return jax.vmap(per_sample)(h, radial, edge_weights)


def _kernel(
    h_ref,
    radial_ref,
    weights_ref,
    *param_refs,
    m_agg_ref,
    phi_ref,
    n_message_layers,
    n_coordinate_layers,
    tanh,
    param_names,
):
    # Biases arrive as [1, H]; the stack broadcasts them.
    params = {name: ref[:] for name, ref in zip(param_names, param_refs)}
    h = h_ref[0]
    radial = radial_ref[0]
    weights = weights_ref[0]

    m, phi = _message_stack(
        params, h, radial, n_message_layers, n_coordinate_layers, tanh
    )
    m_agg_ref[0] = jnp.sum(m * weights[:, :, None], axis=1)
    phi_ref[0] = phi


def pallas_message_block(
    params, h, radial, edge_weights, *, n_message_layers, n_coordinate_layers, tanh
):
    """Fused kernel: one grid program per batch element, messages stay in VMEM."""
    batch, n, feature_size = h.shape
    hidden = params["message_b0"].shape[-1]

    param_names = sorted(params)
    # Reshape biases to [1, H] (TPU scalars/vectors want >= 2D).
    def prep(name):
        value = params[name]
        return value[None] if value.ndim == 1 else value

    param_values = [prep(name) for name in param_names]

    kernel = functools.partial(
        _kernel,
        n_message_layers=n_message_layers,
        n_coordinate_layers=n_coordinate_layers,
        tanh=tanh,
        param_names=param_names,
    )

    def wrapped(h_ref, radial_ref, weights_ref, *rest):
        param_refs = rest[:-2]
        m_agg_ref, phi_ref = rest[-2:]
        kernel(
            h_ref, radial_ref, weights_ref, *param_refs,
            m_agg_ref=m_agg_ref, phi_ref=phi_ref,
        )

    replicated = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    # Interpreter mode off-TPU so the same code path is testable on CPU.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        wrapped,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, n, feature_size), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [replicated(value.shape) for value in param_values],
        out_specs=[
            pl.BlockSpec((1, n, hidden), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, n, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, n, n), jnp.float32),
        ],
        interpret=interpret,
    )(h, radial, edge_weights, *param_values)
    return out[0], out[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_message_block(
    params, h, radial, edge_weights, n_message_layers, n_coordinate_layers, tanh
):
    """Pallas-fused forward with a rematerializing jnp backward."""
    return pallas_message_block(
        params, h, radial, edge_weights,
        n_message_layers=n_message_layers,
        n_coordinate_layers=n_coordinate_layers,
        tanh=tanh,
    )


def _fwd(params, h, radial, edge_weights, n_message_layers, n_coordinate_layers, tanh):
    out = fused_message_block(
        params, h, radial, edge_weights, n_message_layers, n_coordinate_layers, tanh
    )
    return out, (params, h, radial, edge_weights)


def _bwd(n_message_layers, n_coordinate_layers, tanh, residuals, cotangents):
    params, h, radial, edge_weights = residuals
    _, vjp = jax.vjp(
        lambda p, hh, rr, ww: dense_message_block(
            p, hh, rr, ww,
            n_message_layers=n_message_layers,
            n_coordinate_layers=n_coordinate_layers,
            tanh=tanh,
        ),
        params, h, radial, edge_weights,
    )
    return vjp(cotangents)


fused_message_block.defvjp(_fwd, _bwd)
