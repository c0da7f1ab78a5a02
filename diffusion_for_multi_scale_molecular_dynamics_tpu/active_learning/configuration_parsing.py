"""Active-learning configuration glue: config dicts -> assembled components.

(reference: active_learning_loop/configuration_parsing.py:24-196,
 sample_maker/sample_maker_factory.py:36-90)
"""

import logging
from typing import Any, Dict, Optional

from ..generators.instantiate_generator import load_sampling_parameters
from ..noise_schedulers import NoiseParameters
from .atom_selector import create_atom_selector, create_atom_selector_arguments
from .excisor import create_excisor, create_excisor_arguments
from .sample_maker import (
    BaseSampleMaker,
    ExciseAndNoOpSampleMaker,
    ExciseAndNoOpSampleMakerArguments,
    ExciseAndRandomSampleMaker,
    ExciseAndRandomSampleMakerArguments,
    ExciseAndRepaintSampleMaker,
    ExciseAndRepaintSampleMakerArguments,
    NoOpSampleMaker,
    NoOpSampleMakerArguments,
)

logger = logging.getLogger(__name__)

_SAMPLE_MAKER_ARGUMENTS = {
    "no_op": NoOpSampleMakerArguments,
    "excise_and_noop": ExciseAndNoOpSampleMakerArguments,
    "excise_and_random": ExciseAndRandomSampleMakerArguments,
    "excise_and_repaint": ExciseAndRepaintSampleMakerArguments,
}
_SAMPLE_MAKERS = {
    "no_op": NoOpSampleMaker,
    "excise_and_noop": ExciseAndNoOpSampleMaker,
    "excise_and_random": ExciseAndRandomSampleMaker,
    "excise_and_repaint": ExciseAndRepaintSampleMaker,
}


def get_repaint_generation_pieces(
    repaint_config: Dict[str, Any], score_network_checkpoint: Optional[str]
):
    """Build (noise parameters, sampling parameters, bound axl network)."""
    from ..utils.restore import load_axl_network_from_checkpoint

    noise_parameters = NoiseParameters(**repaint_config["noise"])
    sampling_parameters = load_sampling_parameters(repaint_config["sampling"])
    assert score_network_checkpoint is not None, (
        "excise_and_repaint needs a trained score-network checkpoint"
    )
    axl_network = load_axl_network_from_checkpoint(score_network_checkpoint)
    # Optional repulsive pseudo-force (the production sampling configs run
    # with it; round-5 AL ladder showed 5/24 repaint candidates with
    # overlapping pairs without it): force_field: [radial_cutoff, strength].
    force_field = repaint_config.get("force_field")
    if force_field is not None:
        from ..models.force_field_augmented_score_network import (
            wrap_axl_network_with_force_field,
        )

        axl_network = wrap_axl_network_with_force_field(
            axl_network, float(force_field[0]), float(force_field[1])
        )
    return noise_parameters, sampling_parameters, axl_network


def get_sample_maker_from_configuration(
    sample_maker_config: Dict[str, Any],
    elements,
    score_network_checkpoint: Optional[str] = None,
    axl_network=None,
) -> BaseSampleMaker:
    """Assemble a sample maker (selector + excisor + strategy) from config."""
    cfg = dict(sample_maker_config)
    algorithm = cfg.pop("algorithm")
    assert algorithm in _SAMPLE_MAKERS, f"unknown sample maker '{algorithm}'"

    atom_selector = create_atom_selector(
        create_atom_selector_arguments(cfg.pop("atom_selector"))
    )

    kwargs: Dict[str, Any] = {}
    if algorithm.startswith("excise"):
        kwargs["environment_excisor"] = create_excisor(
            create_excisor_arguments(cfg.pop("excisor"))
        )
    if algorithm == "excise_and_repaint":
        repaint_config = cfg.pop("repaint_generator")
        if axl_network is None:
            noise_parameters, sampling_parameters, axl_network = (
                get_repaint_generation_pieces(
                    repaint_config, score_network_checkpoint
                )
            )
        else:
            noise_parameters = NoiseParameters(**repaint_config["noise"])
            sampling_parameters = load_sampling_parameters(
                repaint_config["sampling"]
            )
        kwargs.update(
            noise_parameters=noise_parameters,
            sampling_parameters=sampling_parameters,
            axl_network=axl_network,
        )

    arguments = _SAMPLE_MAKER_ARGUMENTS[algorithm](element_list=list(elements), **cfg)
    return _SAMPLE_MAKERS[algorithm](
        sample_maker_arguments=arguments, atom_selector=atom_selector, **kwargs
    )
