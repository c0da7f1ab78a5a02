import jax.numpy as jnp
import numpy as np

from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.d3pm import (
    class_index_to_onehot,
    compute_q_at_given_a0,
    compute_q_at_given_atm1,
    get_probability_at_previous_time_step,
    get_probability_from_logits,
)


def test_onehot():
    idx = jnp.array([[0, 2], [1, 1]])
    oh = class_index_to_onehot(idx, 3)
    assert oh.shape == (2, 2, 3)
    np.testing.assert_allclose(np.asarray(oh.sum(-1)), 1.0)
    assert oh[0, 1, 2] == 1.0


def test_q_products_match_manual():
    rng = np.random.RandomState(0)
    a0 = np.eye(3)[rng.randint(0, 3, size=(2, 4))].astype(np.float32)
    q = rng.dirichlet(np.ones(3), size=(2, 4, 3)).astype(np.float32)

    got = compute_q_at_given_a0(jnp.asarray(a0), jnp.asarray(q))
    expected = np.einsum("bnj,bnji->bni", a0, q)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)

    got_tm1 = compute_q_at_given_atm1(jnp.asarray(a0), jnp.asarray(q))
    expected_tm1 = np.einsum("bnj,bnij->bni", a0, q)
    np.testing.assert_allclose(np.asarray(got_tm1), expected_tm1, atol=1e-6)


def test_q_product_broadcasts_per_sample_matrices():
    # Per-sample [batch, 1, C, C] matrices broadcast against per-atom states.
    rng = np.random.RandomState(1)
    a0 = np.eye(3)[rng.randint(0, 3, size=(2, 4))].astype(np.float32)
    q = rng.dirichlet(np.ones(3), size=(2, 1, 3)).astype(np.float32)
    got = compute_q_at_given_a0(jnp.asarray(a0), jnp.asarray(q))
    expected = np.einsum("bnj,bji->bni", a0, q[:, 0])
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_probability_from_logits_clips_and_normalizes():
    logits = jnp.array([[10.0, -30.0, 0.0]])
    probs = get_probability_from_logits(logits, lowest_probability_value=1e-4)
    p = np.asarray(probs)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-6)
    assert (p >= 1e-5).all()


def test_posterior_matches_bayes_rule():
    """Check q(a_{t-1} | a_t, a_0) against a direct Bayes computation."""
    rng = np.random.RandomState(2)
    C = 3
    q_t = rng.dirichlet(np.ones(C) * 5, size=C).astype(np.float64)  # rows: from-state
    q_bar_tm1 = rng.dirichlet(np.ones(C) * 5, size=C).astype(np.float64)
    q_bar_t = q_bar_tm1 @ q_t

    a0 = 1
    at = 2
    one_hot_a0 = np.eye(C)[a0]
    one_hot_at = np.eye(C)[at]

    # Direct: q(a_{t-1}=j | a_t, a_0) ∝ qbar_{t-1}[a0, j] * q_t[j, at]
    unnorm = q_bar_tm1[a0, :] * q_t[:, at]
    expected = unnorm / unnorm.sum()

    got = get_probability_at_previous_time_step(
        probability_at_zeroth_timestep=jnp.asarray(one_hot_a0[None, None]),
        one_hot_probability_at_current_timestep=jnp.asarray(one_hot_at[None, None]),
        q_matrices=jnp.asarray(q_t[None, None]),
        q_bar_matrices=jnp.asarray(q_bar_t[None, None]),
        q_bar_tm1_matrices=jnp.asarray(q_bar_tm1[None, None]),
        small_epsilon=1e-12,
    )
    np.testing.assert_allclose(np.asarray(got[0, 0]), expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, atol=1e-5)
