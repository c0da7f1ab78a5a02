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

Gradients: the fused op carries a custom VJP whose backward is itself a
Pallas kernel (``pallas_message_block_bwd``): per (batch, row-block) grid
program it *recomputes* the pair activations in VMEM (flash-attention-style
rematerialization — the [B, N, N, H] tensors never reach HBM in either
direction) and backpropagates through the whole per-pair stack, accumulating
parameter gradients across grid steps in resident output blocks. A jnp
rematerializing backward remains available (``use_pallas_backward=False``)
as the reference/fallback path.

Matmuls run in bfloat16 with float32 accumulation; aggregation is float32.

Mosaic lowering constraints learned at n=216 (Si 3x3x3), where a row block
first stopped fitting a single vreg tile — all invisible at n=64:

  * A partial VMEM block's second-to-last dim must be a multiple of 8
    (``_forward_block_rows``: 18-row blocks fail, 8-row blocks lower).
  * Reshapes may not move data across the 128-wide lane dim once a tile
    spans multiple vregs: [P, 1] <-> [R, N] flattenings fail for N > 128.
    Hence the phi gate is a lane *reduction* against a [1, C] coord_wf row
    (``_lane_dot``) — no [P, 1] column ever exists inside a kernel.
  * The per-kernel scoped-VMEM budget defaults to 16 MB; the recompute
    working set legitimately needs more at n=216, so both kernels set
    ``CompilerParams(vmem_limit_bytes=100 MiB)`` (v5e: 128 MiB/core) and
    the backward keeps only pre-activations live, recomputing each
    ``silu(pre)`` at its single use site (bit-identical, half the VMEM).
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


def _bf16_round(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _lane_dot(x3, w_row):
    """sum_c x3[..., c] * w_row[0, c] -> x3.shape[:-1] in float32.

    Lane-reduction substitute for a matmul against a [C, 1] column: both
    operands are rounded to bf16 so the products match _bf16_matmul's MXU
    numerics exactly (bf16 x bf16 products are exact in f32); only the
    accumulation order differs. Used where the matmul would create a
    [P, 1] tensor that Mosaic cannot reshape back to [R, N].
    """
    return jnp.sum(_bf16_round(x3) * _bf16_round(w_row)[None, :, :], axis=-1)


def _message_stack(
    params, h_rows, h_all, radial, n_message_layers, n_coordinate_layers, tanh
):
    """Shared math: per-pair message MLP + coordinate gate for a row block.

    Args:
        h_rows: [R, F] target-row features (R = N for the unblocked path);
        h_all: [N, F] all source features;
        radial: [R, N] (squared distances).

    Returns:
        m [R, N, H] float32, phi [R, N] float32.
    """
    w0 = params["message_w0"]
    feature_size = h_all.shape[-1]
    u = _bf16_matmul(h_rows, w0[:feature_size])  # [R, H]
    v = _bf16_matmul(h_all, w0[feature_size : 2 * feature_size])  # [N, H]
    w_radial = w0[2 * feature_size :]  # [1, H]

    m = (
        u[:, None, :]
        + v[None, :, :]
        + radial[:, :, None] * w_radial[None, :, :]
        + params["message_b0"].reshape(1, 1, -1)
    )
    m = jax.nn.silu(m)
    rows, n = radial.shape
    hidden = m.shape[-1]
    m = m.reshape(rows * n, hidden)
    for layer in range(1, n_message_layers):
        m = jax.nn.silu(
            _bf16_matmul(m, params[f"message_w{layer}"], params[f"message_b{layer}"])
        )

    p = m
    for layer in range(n_coordinate_layers):
        p = jax.nn.silu(
            _bf16_matmul(p, params[f"coord_w{layer}"], params[f"coord_b{layer}"])
        )
    wf = params["coord_wf"]
    if wf.shape[0] == 1:
        # Kernel path: coord_wf arrives pre-transposed as a [1, C] row and
        # the gate is a lane reduction, so no [P, 1] column ever exists —
        # Mosaic cannot reshape across the lane dim once an [R, N] tile
        # spans multiple 128-lane vregs (the n=216 lowering crash;
        # (8, 64) fit a single vreg, which is why n=64 worked).
        phi = _lane_dot(p.reshape(rows, n, -1), wf)
    else:
        # jnp/dense path: the [C, 1] column matmul XLA handles natively.
        phi = _bf16_matmul(p, wf).reshape(rows, n)
    if tanh:
        phi = jnp.tanh(phi)
    return m.reshape(rows, n, hidden), phi


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
            params, h_b, h_b, radial_b, n_message_layers, n_coordinate_layers, tanh
        )
        m_agg = jnp.sum(m * w_b[:, :, None], axis=1)
        return m_agg, phi

    return jax.vmap(per_sample)(h, radial, edge_weights)


def _forward_block_rows(n: int, pair_budget: int = 4096) -> int:
    """Largest valid row block whose [rows, n] tile holds <= pair_budget pairs.

    At production Si 2x2x2 (n=64) this is the whole sample (4096 pairs, the
    round-2 kernel); at n=216 it blocks rows so the [R, N, H] activations
    stay a few MB — whole-sample [N, N, H] blocks would be ~48 MB/layer at
    H=256 and overflow VMEM.

    Mosaic constrains a VMEM block's second-to-last dimension to be a
    multiple of 8 unless it equals the full array dimension, so a partial
    block must be a multiple-of-8 divisor of n (the grid tiles n exactly).
    A divisor that merely fits the budget is not enough — picking 18 at
    n=216 fails TPU lowering (the r3k fused-resume crash).
    """
    if n * n <= pair_budget:
        return n
    best = 0
    for rows in range(8, n, 8):
        if n % rows == 0 and rows * n <= pair_budget:
            best = rows
    if best == 0:
        raise ValueError(
            f"fused EGNN forward: no multiple-of-8 row block divides n={n} "
            f"within the {pair_budget}-pair VMEM budget; pad the atom count "
            "to a multiple of 8 (the data modules' max_atom padding) or use "
            "the dense path."
        )
    return best


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
    block_rows,
):
    # Biases arrive as [1, H]; the stack broadcasts them.
    params = {name: ref[:] for name, ref in zip(param_names, param_refs)}
    h_all = h_ref[0]
    # Slice the ref, not the value: Mosaic has no dynamic_slice lowering.
    h_rows = h_ref[0, pl.ds(pl.program_id(1) * block_rows, block_rows), :]
    radial = radial_ref[0]
    weights = weights_ref[0]

    m, phi = _message_stack(
        params, h_rows, h_all, radial, n_message_layers, n_coordinate_layers, tanh
    )
    m_agg_ref[0] = jnp.sum(m * weights[:, :, None], axis=1)
    phi_ref[0] = phi


def pallas_message_block(
    params, h, radial, edge_weights, *, n_message_layers, n_coordinate_layers, tanh,
    pair_budget: int = 4096,
):
    """Fused kernel: one grid program per (batch element, target-row block);
    the per-pair message activations stay in VMEM."""
    batch, n, feature_size = h.shape
    hidden = params["message_b0"].shape[-1]
    block_rows = _forward_block_rows(n, pair_budget)
    n_blocks = n // block_rows

    param_names = sorted(params)
    # Reshape biases to [1, H] (TPU scalars/vectors want >= 2D); hand the
    # [C, 1] gate column to the kernel as a [1, C] row (see _lane_dot).
    def prep(name):
        value = params[name]
        if name == "coord_wf":
            return value.T
        return value[None] if value.ndim == 1 else value

    param_values = [prep(name) for name in param_names]

    kernel = functools.partial(
        _kernel,
        n_message_layers=n_message_layers,
        n_coordinate_layers=n_coordinate_layers,
        tanh=tanh,
        param_names=param_names,
        block_rows=block_rows,
    )

    def wrapped(h_ref, radial_ref, weights_ref, *rest):
        param_refs = rest[:-2]
        m_agg_ref, phi_ref = rest[-2:]
        kernel(
            h_ref, radial_ref, weights_ref, *param_refs,
            m_agg_ref=m_agg_ref, phi_ref=phi_ref,
        )

    replicated = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, k: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    row_block = lambda width: pl.BlockSpec(  # noqa: E731
        (1, block_rows, width), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM
    )
    # Interpreter mode off-TPU so the same code path is testable on CPU.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        wrapped,
        # The row-blocked working set (pair activations for every MLP layer)
        # legitimately exceeds the 16 MB scoped-VMEM default at n=216;
        # v5e has 128 MB of VMEM per core.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, n, feature_size), lambda b, k: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row_block(n),
            row_block(n),
        ]
        + [replicated(value.shape) for value in param_values],
        out_specs=[
            row_block(hidden),
            row_block(n),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, n, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, n, n), jnp.float32),
        ],
        interpret=interpret,
    )(h, radial, edge_weights, *param_values)
    return out[0], out[1]


# --------------------------------------------------------------------- bwd


def _bf16_matmul_t(x, w, transpose_w=False):
    """bf16 matmul with fp32 accumulation, optionally against w^T."""
    w = w.astype(jnp.bfloat16)
    return jnp.dot(
        x.astype(jnp.bfloat16),
        w.T if transpose_w else w,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _silu_grad(pre):
    sig = jax.nn.sigmoid(pre)
    return sig * (1.0 + pre * (1.0 - sig))


def _backward_kernel(
    h_ref,
    radial_ref,
    weights_ref,
    g_magg_ref,
    g_phi_ref,
    *rest,
    n_message_layers,
    n_coordinate_layers,
    tanh,
    param_names,
    feature_size,
    block_rows,
):
    """One grid program = one (batch sample, target-row block).

    Recomputes the pair activations for its row block in VMEM, then
    backpropagates through coord + message stacks. Parameter gradients and dh
    accumulate in resident output blocks (constant index maps) across the
    sequentially-executed grid.
    """
    n_params = len(param_names)
    param_refs = rest[:n_params]
    out_refs = rest[n_params:]
    dh_ref, dradial_ref, dweights_ref = out_refs[:3]
    dparam_refs = dict(zip(param_names, out_refs[3:]))
    params = {name: ref[:] for name, ref in zip(param_names, param_refs)}

    block_index = pl.program_id(1)
    is_first_program = (pl.program_id(0) == 0) & (block_index == 0)

    @pl.when(is_first_program)
    def _init_dparams():
        for ref in out_refs[3:]:
            ref[:] = jnp.zeros_like(ref)

    @pl.when(block_index == 0)
    def _init_dh():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    h = h_ref[0]  # [N, F] (full sample)
    n = h.shape[0]
    rows = pl.ds(block_index * block_rows, block_rows)
    # Slice the ref, not the value: Mosaic has no dynamic_slice lowering.
    h_blk = h_ref[0, rows, :]  # [BI, F]
    radial_blk = radial_ref[0]  # [BI, N]
    weights_blk = weights_ref[0]  # [BI, N]
    g_magg = g_magg_ref[0]  # [BI, H]
    g_phi = g_phi_ref[0]  # [BI, N]

    w0 = params["message_w0"]
    w_u = w0[:feature_size]
    w_v = w0[feature_size : 2 * feature_size]
    w_radial = w0[2 * feature_size :]  # [1, H]
    hidden = w0.shape[-1]

    # ---- forward recompute (activations stay in VMEM) ----
    u_blk = _bf16_matmul(h_blk, w_u)  # [BI, H]
    v_all = _bf16_matmul(h, w_v)  # [N, H]
    pre0 = (
        u_blk[:, None, :]
        + v_all[None, :, :]
        + radial_blk[:, :, None] * w_radial[None, :, :]
        + params["message_b0"].reshape(1, 1, -1)
    ).reshape(block_rows * n, hidden)
    # Only the pre-activations are kept live across the sweep; each act is
    # recomputed as silu(pre) at its (single) use site — bit-identical and
    # half the VMEM of storing both (10 [P, H] tensors instead of 20; the
    # n=216 block otherwise blows the kernel's scoped-VMEM budget).
    message_pres = [pre0]
    act = jax.nn.silu(pre0)
    for layer in range(1, n_message_layers):
        pre = _bf16_matmul(
            act, params[f"message_w{layer}"], params[f"message_b{layer}"]
        )
        act = jax.nn.silu(pre)
        message_pres.append(pre)
    m = act  # [P, H]

    coord_pres = []
    c_act = m
    for layer in range(n_coordinate_layers):
        pre = _bf16_matmul(
            c_act, params[f"coord_w{layer}"], params[f"coord_b{layer}"]
        )
        c_act = jax.nn.silu(pre)
        coord_pres.append(pre)
    # coord_wf arrives pre-transposed as a [1, C] row; the gate is a lane
    # reduction so no [P, 1] column exists in the kernel (Mosaic cannot
    # reshape across the lane dim once [BI, N] spans multiple vregs).
    wf_row = params["coord_wf"]  # [1, C]
    coord_width = wf_row.shape[-1]
    c_act3 = c_act.reshape(block_rows, n, coord_width)

    # ---- backward ----
    # Aggregation: m_agg_i = sum_j w_ij m_ij.
    dm = (weights_blk[:, :, None] * g_magg[:, None, :]).reshape(
        block_rows * n, hidden
    )
    m_3d = m.reshape(block_rows, n, hidden)
    dweights_ref[0] = jnp.sum(m_3d * g_magg[:, None, :], axis=-1)

    # Coordinate gate chain (2D [BI, N] throughout).
    dphi = g_phi
    if tanh:
        phi = jnp.tanh(_lane_dot(c_act3, wf_row))
        dphi = dphi * (1.0 - phi**2)
    dparam_refs["coord_wf"][:] += jnp.sum(
        (_bf16_round(c_act3) * _bf16_round(dphi)[:, :, None]).reshape(
            block_rows * n, coord_width
        ),
        axis=0,
        keepdims=True,
    )
    d_act = (
        _bf16_round(dphi)[:, :, None] * _bf16_round(wf_row)[None, :, :]
    ).reshape(block_rows * n, coord_width)
    for layer in range(n_coordinate_layers - 1, -1, -1):
        d_pre = d_act * _silu_grad(coord_pres[layer])
        inputs = jax.nn.silu(coord_pres[layer - 1]) if layer > 0 else m
        dparam_refs[f"coord_w{layer}"][:] += _bf16_matmul_t(inputs.T, d_pre)
        dparam_refs[f"coord_b{layer}"][:] += jnp.sum(
            d_pre, axis=0, keepdims=True
        )
        d_act = _bf16_matmul_t(d_pre, params[f"coord_w{layer}"], transpose_w=True)
    dm = dm + d_act  # total cotangent on m

    # Message chain.
    for layer in range(n_message_layers - 1, 0, -1):
        d_pre = dm * _silu_grad(message_pres[layer])
        dparam_refs[f"message_w{layer}"][:] += _bf16_matmul_t(
            jax.nn.silu(message_pres[layer - 1]).T, d_pre
        )
        dparam_refs[f"message_b{layer}"][:] += jnp.sum(
            d_pre, axis=0, keepdims=True
        )
        dm = _bf16_matmul_t(d_pre, params[f"message_w{layer}"], transpose_w=True)

    ds0 = (dm * _silu_grad(message_pres[0])).reshape(block_rows, n, hidden)
    du = jnp.sum(ds0, axis=1)  # [BI, H]
    dv = jnp.sum(ds0, axis=0)  # [N, H]
    ds0_flat = ds0.reshape(block_rows * n, hidden)

    dradial_ref[0] = jnp.sum(ds0 * w_radial[None, :, :], axis=-1)
    # dW0, assembled in the un-split [2F+1, H] layout. The radial row is a
    # broadcast-multiply + sublane reduction: flattening radial_blk to a
    # [P, 1] column is a lane-crossing reshape Mosaic cannot lower.
    dparam_refs["message_w0"][:feature_size, :] += _bf16_matmul_t(h_blk.T, du)
    dparam_refs["message_w0"][feature_size : 2 * feature_size, :] += (
        _bf16_matmul_t(h.T, dv)
    )
    dparam_refs["message_w0"][2 * feature_size :, :] += jnp.sum(
        (_bf16_round(radial_blk)[:, :, None] * _bf16_round(ds0)).reshape(
            block_rows * n, hidden
        ),
        axis=0,
        keepdims=True,
    )
    dparam_refs["message_b0"][:] += jnp.sum(ds0_flat, axis=0, keepdims=True)

    # dh: row block gets the u-path; every source row gets the v-path.
    dh_ref[0, rows, :] += _bf16_matmul_t(du, w_u, transpose_w=True)
    dh_ref[0] += _bf16_matmul_t(dv, w_v, transpose_w=True)


def pallas_message_block_bwd(
    params,
    h,
    radial,
    edge_weights,
    g_magg,
    g_phi,
    *,
    n_message_layers,
    n_coordinate_layers,
    tanh,
    block_rows: int = 8,
):
    """Fused backward: returns (dparams, dh, dradial, dedge_weights)."""
    batch, n, feature_size = h.shape
    hidden = params["message_b0"].shape[-1]
    block_rows = min(block_rows, n)
    if n % block_rows != 0:
        # Mirror the forward's whole-sample exemption: Mosaic only accepts a
        # partial VMEM block whose sublane dim is a multiple of 8, so an
        # atom count like n=12..63 (accepted whole-sample by the forward)
        # must also run whole-sample here — and an n with no legal block
        # gets _forward_block_rows' descriptive error instead of an assert.
        block_rows = _forward_block_rows(n)
    n_blocks = n // block_rows

    param_names = sorted(params)

    def prep(name):
        value = params[name]
        if name == "coord_wf":
            return value.T  # [1, C] row form for the kernel (see _lane_dot)
        return value[None] if value.ndim == 1 else value

    param_values = [prep(name) for name in param_names]

    kernel = functools.partial(
        _backward_kernel,
        n_message_layers=n_message_layers,
        n_coordinate_layers=n_coordinate_layers,
        tanh=tanh,
        param_names=param_names,
        feature_size=feature_size,
        block_rows=block_rows,
    )

    replicated = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, k: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    row_block = lambda width: pl.BlockSpec(  # noqa: E731
        (1, block_rows, width), lambda b, k: (b, k, 0), memory_space=pltpu.VMEM
    )

    out_shapes = [
        jax.ShapeDtypeStruct((batch, n, feature_size), jnp.float32),  # dh
        jax.ShapeDtypeStruct((batch, n, n), jnp.float32),  # dradial
        jax.ShapeDtypeStruct((batch, n, n), jnp.float32),  # dweights
    ] + [jax.ShapeDtypeStruct(v.shape, jnp.float32) for v in param_values]
    out_specs = [
        pl.BlockSpec(
            (1, n, feature_size), lambda b, k: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        row_block(n),
        row_block(n),
    ] + [replicated(v.shape) for v in param_values]

    interpret = jax.default_backend() != "tpu"
    outs = pl.pallas_call(
        kernel,
        # See pallas_message_block: the recompute working set needs more
        # than the 16 MB scoped-VMEM default at n=216 (v5e: 128 MB/core).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, n, feature_size), lambda b, k: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row_block(n),  # radial
            row_block(n),  # edge weights
            row_block(hidden),  # g_magg
            row_block(n),  # g_phi
        ]
        + [replicated(v.shape) for v in param_values],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(h, radial, edge_weights, g_magg, g_phi, *param_values)

    dh, dradial, dweights = outs[:3]
    dparams = {}
    for name, value in zip(param_names, outs[3:]):
        if name == "coord_wf":
            dparams[name] = value.T  # kernel accumulates the [1, C] row form
        elif params[name].ndim == 1:
            dparams[name] = value[0]
        else:
            dparams[name] = value
    return dparams, dh, dradial, dweights


# ------------------------------------------------------------- custom VJP

# Global switch (tests flip it to compare paths); the Pallas backward is the
# default — training no longer rematerializes through HBM-resident pair
# tensors.
use_pallas_backward = True


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_message_block(
    params, h, radial, edge_weights, n_message_layers, n_coordinate_layers, tanh
):
    """Pallas-fused forward with a Pallas-fused backward."""
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
    g_magg, g_phi = cotangents
    if use_pallas_backward:
        return pallas_message_block_bwd(
            params, h, radial, edge_weights, g_magg, g_phi,
            n_message_layers=n_message_layers,
            n_coordinate_layers=n_coordinate_layers,
            tanh=tanh,
        )
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
