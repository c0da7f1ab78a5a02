"""Unit tests for the per-modality loss calculators (loss/loss_calculators.py).

Translation of the reference's loss tests (tests/loss/
test_atom_type_loss_calculator.py): the variational-bound KL vanishes when
the model nails a_0, the cross-entropy term matches its closed form with the
MASK column squashed, the unreduced loss is VB + ce_weight * CE, and the
first time step switches to the NLL. KL values are cross-checked against an
independent scipy implementation.
"""

import numpy as np
import pytest
import scipy.stats

import jax
import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.loss.loss_calculators import (
    calculate_atom_types_loss,
    calculate_coordinates_loss,
    _cross_entropy_term,
    _variational_bound_term,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.loss.loss_parameters import (
    AtomTypeLossParameters,
    MSELossParameters,
    WeightedMSELossParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.d3pm import (
    class_index_to_onehot,
    get_probability_at_previous_time_step,
)

BATCH, NATOMS, NUM_ATOM_TYPES = 16, 4, 3
NUM_CLASSES = NUM_ATOM_TYPES + 1
EPS = 1e-8


@pytest.fixture
def rng():
    return np.random.default_rng(3423423)


@pytest.fixture
def predicted_logits(rng):
    logits = 10.0 * (rng.standard_normal((BATCH, NATOMS, NUM_CLASSES)) - 0.5)
    logits[..., -1] = -np.inf  # the model may never predict MASK
    return jnp.asarray(logits, dtype=jnp.float32)


@pytest.fixture
def one_hot_a0(rng):
    # a0 cannot be MASK.
    return class_index_to_onehot(
        jnp.asarray(rng.integers(0, NUM_ATOM_TYPES, (BATCH, NATOMS))), NUM_CLASSES
    ).astype(jnp.float32)


@pytest.fixture
def one_hot_at(rng):
    # a_t can be MASK.
    return class_index_to_onehot(
        jnp.asarray(rng.integers(0, NUM_CLASSES, (BATCH, NATOMS))), NUM_CLASSES
    ).astype(jnp.float32)


@pytest.fixture
def q_matrices(rng):
    """Consistent Markov triple (Q_t, Qbar_t = Qbar_{t-1} Q_t, Qbar_{t-1}) —
    the posterior only normalizes when the chain is consistent."""

    def random_stochastic():
        q = rng.uniform(0.1, 1.0, (BATCH, 1, NUM_CLASSES, NUM_CLASSES))
        return q / q.sum(axis=-1, keepdims=True)

    q = random_stochastic()
    q_bar_tm1 = random_stochastic()
    q_bar = q_bar_tm1 @ q
    return tuple(
        jnp.asarray(m, dtype=jnp.float32) for m in (q, q_bar, q_bar_tm1)
    )


@pytest.fixture
def time_indices(rng):
    return jnp.asarray(rng.integers(0, 8, (BATCH,)))


class TestCrossEntropyTerm:
    def test_matches_closed_form(self, predicted_logits, one_hot_a0):
        computed = _cross_entropy_term(predicted_logits, one_hot_a0)
        p = jax.nn.softmax(predicted_logits, axis=-1)
        log_p = np.log(np.asarray(p))
        log_p[..., -1] = 0.0  # MASK column squashed (reference :43)
        expected = -log_p * np.asarray(one_hot_a0)
        np.testing.assert_allclose(np.asarray(computed), expected, atol=1e-5)

    def test_zero_when_predicting_a0(self, one_hot_a0):
        logits = jnp.log(one_hot_a0)
        computed = _cross_entropy_term(logits, one_hot_a0)
        np.testing.assert_allclose(np.asarray(computed), 0.0, atol=1e-6)


class TestVariationalBoundTerm:
    def test_kl_vanishes_when_predicting_a0(
        self, one_hot_a0, one_hot_at, q_matrices, time_indices
    ):
        """KL == 0 when p_theta(.|a_t) predicts a0 with probability 1
        (reference test_vb_loss_predicting_a0:312)."""
        logits = jnp.log(one_hot_a0)
        vb = _variational_bound_term(
            logits, one_hot_a0, one_hot_at, *q_matrices, time_indices, EPS
        )
        kl = np.asarray(vb)[np.asarray(time_indices) != 0]
        np.testing.assert_allclose(kl, 0.0, atol=1e-5)

    def test_kl_matches_scipy(
        self, predicted_logits, one_hot_a0, one_hot_at, q_matrices
    ):
        """Summed KL integrand equals scipy's KL of the two posteriors."""
        time_indices = jnp.ones((BATCH,), dtype=jnp.int32)  # all KL branch
        vb = np.asarray(
            _variational_bound_term(
                predicted_logits,
                one_hot_a0,
                one_hot_at,
                *q_matrices,
                time_indices,
                EPS,
            )
        ).sum(axis=-1)

        q_posterior = np.asarray(
            get_probability_at_previous_time_step(
                one_hot_a0, one_hot_at, *q_matrices, small_epsilon=EPS
            )
        )
        p_model = np.asarray(
            get_probability_at_previous_time_step(
                predicted_logits,
                one_hot_at,
                *q_matrices,
                small_epsilon=EPS,
                probability_at_zeroth_timestep_are_logits=True,
            )
        )
        expected = scipy.stats.entropy(
            q_posterior, p_model, axis=-1
        )
        np.testing.assert_allclose(vb, expected, rtol=2e-3, atol=1e-5)

    def test_first_time_step_is_nll(
        self, predicted_logits, one_hot_a0, one_hot_at, q_matrices
    ):
        """At index 0 (t = 1), the loss is -log p_theta(a_0) (reference
        atom_type_loss_calculator.py:120-124)."""
        time_indices = jnp.zeros((BATCH,), dtype=jnp.int32)
        vb = np.asarray(
            _variational_bound_term(
                predicted_logits,
                one_hot_a0,
                one_hot_at,
                *q_matrices,
                time_indices,
                EPS,
            )
        )
        p_model = np.asarray(
            get_probability_at_previous_time_step(
                predicted_logits,
                one_hot_at,
                *q_matrices,
                small_epsilon=EPS,
                probability_at_zeroth_timestep_are_logits=True,
            )
        )
        expected = -np.log(np.clip(p_model, EPS, None)) * np.asarray(one_hot_a0)
        np.testing.assert_allclose(vb, expected, rtol=1e-4, atol=1e-6)


class TestUnreducedAtomTypesLoss:
    @pytest.mark.parametrize("ce_weight", [0.0, 0.001, 1.0])
    def test_is_vb_plus_weighted_ce(
        self,
        predicted_logits,
        one_hot_a0,
        one_hot_at,
        q_matrices,
        time_indices,
        ce_weight,
    ):
        parameters = AtomTypeLossParameters(
            algorithm="d3pm", ce_weight=ce_weight, eps=EPS
        )
        computed = calculate_atom_types_loss(
            predicted_logits,
            one_hot_a0,
            one_hot_at,
            time_indices,
            *q_matrices,
            parameters=parameters,
        )
        vb = _variational_bound_term(
            predicted_logits, one_hot_a0, one_hot_at, *q_matrices,
            time_indices, EPS,
        )
        ce = _cross_entropy_term(predicted_logits, one_hot_a0)
        np.testing.assert_allclose(
            np.asarray(computed),
            np.asarray(vb + ce_weight * ce),
            rtol=1e-6,
        )


class TestCoordinatesLoss:
    def test_mse(self, rng):
        predicted = jnp.asarray(rng.standard_normal((BATCH, NATOMS, 3)))
        target = jnp.asarray(rng.standard_normal((BATCH, NATOMS, 3)))
        sigmas = jnp.full((BATCH, NATOMS, 3), 0.1)
        out = calculate_coordinates_loss(
            predicted, target, sigmas, MSELossParameters()
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray((predicted - target) ** 2), rtol=1e-6
        )

    def test_weighted_mse_weights(self, rng):
        """weights = exp(exponent * (sigma - sigma0)) + 1 (reference
        coordinates_loss_calculator.py:86)."""
        parameters = WeightedMSELossParameters(algorithm="weighted_mse")
        predicted = jnp.asarray(rng.standard_normal((BATCH, NATOMS, 3)))
        target = jnp.zeros_like(predicted)
        for sigma in (parameters.sigma0, 0.5):
            sigmas = jnp.full(predicted.shape, sigma)
            out = calculate_coordinates_loss(
                predicted, target, sigmas, parameters
            )
            expected_weight = (
                np.exp(parameters.exponent * (sigma - parameters.sigma0)) + 1.0
            )
            np.testing.assert_allclose(
                np.asarray(out),
                expected_weight * np.asarray(predicted**2),
                rtol=1e-4,
            )
        # The weight at sigma0 is exactly 2.
        out0 = calculate_coordinates_loss(
            predicted,
            target,
            jnp.full(predicted.shape, parameters.sigma0),
            parameters,
        )
        np.testing.assert_allclose(
            np.asarray(out0), 2.0 * np.asarray(predicted**2), rtol=1e-5
        )
