"""Optimizer chain: gradient accumulation and injected learning rate.

Covers the reference's trainer-level ``accumulate_grad_batches`` knob
(reference: train_diffusion config surface, lightning Trainer argument) as
implemented through ``optax.MultiSteps`` in
``training/optimizer.py::load_optimizer``.
"""

import jax
import jax.numpy as jnp
import optax
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.training.optimizer import (
    OptimizerParameters,
    load_optimizer,
    set_learning_rate,
)


def _params():
    return {"w": jnp.arange(4.0), "b": jnp.ones((2,))}


def _grad(scale):
    return {"w": scale * jnp.ones(4), "b": -scale * jnp.ones((2,))}


def test_accumulation_matches_one_step_on_the_mean_gradient():
    opt_params = OptimizerParameters(
        name="adamw", learning_rate=1e-2, weight_decay=0.0
    )
    plain = load_optimizer(opt_params)
    accumulating = load_optimizer(
        OptimizerParameters(
            name="adamw",
            learning_rate=1e-2,
            weight_decay=0.0,
            accumulate_grad_batches=2,
        )
    )

    params = _params()

    # Two micro-batches through the accumulating chain...
    acc_state = accumulating.init(params)
    acc = params
    for g in (_grad(1.0), _grad(3.0)):
        updates, acc_state = accumulating.update(g, acc_state, acc)
        acc = optax.apply_updates(acc, updates)

    # ...must equal one plain step on the averaged gradient.
    plain_state = plain.init(params)
    updates, _ = plain.update(_grad(2.0), plain_state, params)
    expected = optax.apply_updates(params, updates)

    jax.tree_util.tree_map(
        lambda a, b: None
        if jnp.allclose(a, b, atol=1e-7)
        else pytest.fail(f"{a} != {b}"),
        acc,
        expected,
    )


def test_intermediate_micro_steps_leave_parameters_unchanged():
    accumulating = load_optimizer(
        OptimizerParameters(learning_rate=1e-2, accumulate_grad_batches=3)
    )
    params = _params()
    state = accumulating.init(params)
    updates, state = accumulating.update(_grad(1.0), state, params)
    after_one = optax.apply_updates(params, updates)
    jax.tree_util.tree_map(
        lambda a, b: None
        if jnp.array_equal(a, b)
        else pytest.fail("micro-step moved the parameters"),
        after_one,
        params,
    )


def test_set_learning_rate_reaches_inside_multisteps():
    accumulating = load_optimizer(
        OptimizerParameters(learning_rate=1e-2, accumulate_grad_batches=2)
    )
    params = _params()
    state = accumulating.init(params)
    state = set_learning_rate(state, 5e-4)

    def find_lr(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            return float(s.hyperparams["learning_rate"])
        if hasattr(s, "inner_opt_state"):
            return find_lr(s.inner_opt_state)
        if isinstance(s, tuple):
            for sub in s:
                found = find_lr(sub)
                if found is not None:
                    return found
        return None

    assert find_lr(state) == pytest.approx(5e-4)


def test_set_learning_rate_still_works_without_accumulation():
    chain = load_optimizer(
        OptimizerParameters(learning_rate=1e-2, gradient_clipping=1.0)
    )
    state = chain.init(_params())
    state = set_learning_rate(state, 2e-3)
    # The clipped chain nests the injected state inside a plain tuple.
    flat = state
    while isinstance(flat, tuple) and not hasattr(flat, "hyperparams"):
        flat = next(
            sub
            for sub in flat
            if hasattr(sub, "hyperparams")
            or (isinstance(sub, tuple) and len(sub) > 0)
        )
    assert float(flat.hyperparams["learning_rate"]) == pytest.approx(2e-3)
