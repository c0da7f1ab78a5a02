"""The experiments-side force-field partial must match the plain wrapper.

`experiments/_ff_partial.wrap_force_field` rebuilds the force-field wrapper
as a bare `functools.partial` so the Langevin generator keeps the
params-as-jit-arguments fast path (langevin_generator.py:140-155); this test
pins (a) output equality with `ForceFieldAugmentedScoreNetwork` and (b) that
the generator actually detects the fast path through it.
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments")
)

from _ff_partial import wrap_force_field  # noqa: E402

from diffusion_for_multi_scale_molecular_dynamics_tpu.models.force_field_augmented_score_network import (  # noqa: E402,E501
    ForceFieldAugmentedScoreNetwork,
    ForceFieldParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (  # noqa: E402
    AXL,
    CARTESIAN_FORCES,
    NOISE,
    NOISY_AXL_COMPOSITION,
    TIME,
)

NATOMS = 8


def fake_apply(params, batch):
    x = batch[NOISY_AXL_COMPOSITION].X
    return AXL(
        A=jnp.zeros((x.shape[0], NATOMS, 2)),
        X=params["scale"] * x,
        L=jnp.zeros((x.shape[0], 6)),
    )


def make_batch(key):
    x = jax.random.uniform(key, (3, NATOMS, 3))
    return {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((3, NATOMS), jnp.int32),
            X=x,
            L=jnp.asarray([[5.43] * 3 + [0.0] * 3] * 3),
        ),
        TIME: jnp.full((3, 1), 0.5),
        NOISE: jnp.full((3, 1), 0.1),
        CARTESIAN_FORCES: jnp.zeros((3, NATOMS, 3)),
    }


def test_ff_partial_matches_wrapper_and_keeps_fast_path():
    params = {"scale": jnp.asarray(0.7)}
    base = functools.partial(fake_apply, params)
    batch = make_batch(jax.random.PRNGKey(0))

    fast = wrap_force_field(base, 1.5, 20.0)
    slow = ForceFieldAugmentedScoreNetwork(
        base, ForceFieldParameters(radial_cutoff=1.5, strength=20.0)
    )

    out_fast = fast(batch)
    out_slow = slow(batch)
    np.testing.assert_allclose(
        np.asarray(out_fast.X), np.asarray(out_slow.X), atol=1e-6
    )
    # The force field must actually change something at this density.
    assert float(jnp.abs(out_fast.X - base(batch).X).max()) > 0.0

    # Fast-path shape preserved: a bare partial with one positional arg.
    assert isinstance(fast, functools.partial)
    assert len(fast.args) == 1 and not fast.keywords

    # And the generator detects it.
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )

    generator = LangevinGenerator(
        NoiseParameters(total_time_steps=5, sigma_min=1e-3, sigma_max=0.2),
        PredictorCorrectorSamplingParameters(
            num_atom_types=1,
            number_of_atoms=NATOMS,
            number_of_samples=2,
            number_of_corrector_steps=1,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[5.43] * 3,
        ),
        fast,
    )
    assert generator._apply_fn is not None


def test_ff_partial_falls_back_for_opaque_callables():
    opaque = lambda batch: None  # noqa: E731
    wrapped = wrap_force_field(opaque, 1.5, 20.0)
    assert isinstance(wrapped, ForceFieldAugmentedScoreNetwork)
