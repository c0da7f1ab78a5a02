"""Force-field wrapping that preserves the params-as-jit-arguments fast path.

`load_axl_network_from_checkpoint` returns `functools.partial(apply_fn,
params)`; the Langevin generator detects that exact shape and feeds the
parameters to the compiled scan as *arguments* (langevin_generator.py:140-155).
Wrapping it in `ForceFieldAugmentedScoreNetwork` hides the partial, so the
generator falls back to the closure path that bakes every weight into the
HLO as literals — 5-20 minutes of client-side lowering per compiled variant,
and the reheat probe compiles one variant per tau. The pseudo-force is a
pure function of the batch (no parameters), so the wrapper can instead be
rebuilt as a new bare partial around a `(params, batch)` function.
"""

import functools

from diffusion_for_multi_scale_molecular_dynamics_tpu.models.force_field_augmented_score_network import (  # noqa: E501
    ForceFieldAugmentedScoreNetwork,
    ForceFieldParameters,
)


def wrap_force_field(axl_network, radial_cutoff: float, strength: float):
    """Add the repulsive pseudo-force without defeating the fast path.

    When `axl_network` is the bare `functools.partial(apply_fn, params)` the
    restore helper produces, return a new bare partial whose function applies
    the pseudo-force after the network — the generator still sees
    (apply_fn, params) and compiles with parameters as arguments. Any other
    callable falls back to the plain wrapper (closure path).
    """
    parameters = ForceFieldParameters(radial_cutoff=radial_cutoff, strength=strength)
    if (
        isinstance(axl_network, functools.partial)
        and len(axl_network.args) == 1
        and not axl_network.keywords
    ):
        base_apply = axl_network.func
        params = axl_network.args[0]
        # Network=None: only the (network-independent) pseudo-force is used.
        force_field = ForceFieldAugmentedScoreNetwork(None, parameters)

        def apply_with_force_field(p, batch):
            raw = base_apply(p, batch)
            forces = force_field.get_relative_coordinates_pseudo_force(batch)
            return raw._replace(X=raw.X + forces)

        return functools.partial(apply_with_force_field, params)
    return ForceFieldAugmentedScoreNetwork(axl_network, parameters)
