"""Discrete-diffusion (D3PM) algebra.

All functions are pure jnp and broadcast over arbitrary leading axes, so the
same code serves training losses, forward noising and the reverse sampler.

Capability parity with the reference's D3PM helpers
(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/d3pm_utils.py),
with one TPU-motivated difference: transition matrices may be supplied either
per-atom ([batch, natoms, C, C], the reference layout) or per-sample
([batch, 1, C, C] / [batch, C, C] broadcastable), avoiding the natoms-fold
replication of tiny C x C matrices in HBM.
"""

import jax
import jax.numpy as jnp

# Probability algebra must stay exact: force full-precision contractions so
# the MXU does not silently round these C x C products to bfloat16.
_EXACT = jax.lax.Precision.HIGHEST


def class_index_to_onehot(index: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """One-hot encode integer class indices as float32."""
    return jax.nn.one_hot(index, num_classes, dtype=jnp.float32)


def compute_q_at_given_a0(
    one_hot_a0: jnp.ndarray, q_bar_t: jnp.ndarray
) -> jnp.ndarray:
    """q(a_t | a_0) = a_0 @ Qbar_t for one-hot (or distributional) a_0.

    Args:
        one_hot_a0: [..., C]
        q_bar_t: [..., C, C], broadcastable against one_hot_a0's batch axes.
    """
    return jnp.einsum("...j,...ji->...i", one_hot_a0, q_bar_t, precision=_EXACT)


def compute_q_at_given_atm1(
    one_hot_atm1: jnp.ndarray, q_tm1: jnp.ndarray
) -> jnp.ndarray:
    """q(a_t | a_{t-1}) = a_{t-1} @ Q_{t-1}^T."""
    return jnp.einsum("...j,...ij->...i", one_hot_atm1, q_tm1, precision=_EXACT)


def get_probability_from_logits(
    logits: jnp.ndarray, lowest_probability_value: float
) -> jnp.ndarray:
    """Softmax with a per-class probability floor, renormalized.

    Clipping every class probability at ``lowest_probability_value`` prevents
    log(0) downstream (reference: d3pm_utils.py:127-150; the reference's
    shape assert is a host-side check and is omitted inside jit).
    """
    raw = jax.nn.softmax(logits, axis=-1)
    clipped = jnp.clip(raw, min=lowest_probability_value)
    return clipped / jnp.sum(clipped, axis=-1, keepdims=True)


def get_probability_at_previous_time_step(
    probability_at_zeroth_timestep: jnp.ndarray,
    one_hot_probability_at_current_timestep: jnp.ndarray,
    q_matrices: jnp.ndarray,
    q_bar_matrices: jnp.ndarray,
    q_bar_tm1_matrices: jnp.ndarray,
    small_epsilon: float,
    probability_at_zeroth_timestep_are_logits: bool = False,
) -> jnp.ndarray:
    r"""Posterior / model distribution over a_{t-1}.

    .. math::
        P(a_{t-1} | a_t, \gamma_0) =
            (\gamma_0 \bar{Q}_{t-1})_{a_{t-1}} (Q_t a_t)_{a_{t-1}}
            / (\gamma_0 \bar{Q}_t a_t)

    Args:
        probability_at_zeroth_timestep: gamma_0, [..., C] (probabilities, or
            logits if the flag is set).
        one_hot_probability_at_current_timestep: one-hot a_t, [..., C].
        q_matrices / q_bar_matrices / q_bar_tm1_matrices: [..., C, C],
            broadcastable.
        small_epsilon: probability floor (guards the division as well).
        probability_at_zeroth_timestep_are_logits: normalize gamma_0 from
            logits with a clipped softmax first.

    Returns:
        normalized probabilities over a_{t-1}, [..., C].
    """
    if probability_at_zeroth_timestep_are_logits:
        probability_at_zeroth_timestep = get_probability_from_logits(
            probability_at_zeroth_timestep, lowest_probability_value=small_epsilon
        )

    numerator1 = jnp.einsum(
        "...j,...ji->...i",
        probability_at_zeroth_timestep,
        q_bar_tm1_matrices,
        precision=_EXACT,
    )
    numerator2 = jnp.einsum(
        "...ij,...j->...i",
        q_matrices,
        one_hot_probability_at_current_timestep,
        precision=_EXACT,
    )
    numerator = numerator1 * numerator2

    den1 = jnp.einsum(
        "...ij,...j->...i",
        q_bar_matrices,
        one_hot_probability_at_current_timestep,
        precision=_EXACT,
    )
    denominator = jnp.einsum(
        "...j,...j->...", probability_at_zeroth_timestep, den1, precision=_EXACT
    )[..., None]

    return numerator / denominator
