"""Broadcast helpers: per-batch scalars/matrices to per-atom shapes.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/tensor_utils.py:6-43)
"""

from typing import Tuple

import jax.numpy as jnp


def broadcast_batch_tensor_to_all_dimensions(
    batch_values: jnp.ndarray, final_shape: Tuple[int, ...]
) -> jnp.ndarray:
    """Broadcast per-batch scalars [batch] to a configuration shape [batch, ...]."""
    assert batch_values.ndim == 1, "batch_values must be one-dimensional"
    assert final_shape[0] == batch_values.shape[0], (
        "the first dimension of final_shape must be the batch size"
    )
    reshaped = batch_values.reshape((-1,) + (1,) * (len(final_shape) - 1))
    return jnp.broadcast_to(reshaped, final_shape)


def broadcast_batch_matrix_tensor_to_all_dimensions(
    batch_values: jnp.ndarray, final_shape: Tuple[int, ...]
) -> jnp.ndarray:
    """Broadcast per-batch matrices [batch, c, c] to [*final_shape, c, c]."""
    assert batch_values.ndim == 3, "batch_values must be [batch, c, c]"
    assert final_shape[0] == batch_values.shape[0], (
        "the first dimension of final_shape must be the batch size"
    )
    c = batch_values.shape[-1]
    reshaped = batch_values.reshape(
        (-1,) + (1,) * (len(final_shape) - 1) + (c, c)
    )
    return jnp.broadcast_to(reshaped, tuple(final_shape) + (c, c))
