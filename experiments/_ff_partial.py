"""Back-compat shim: the fast-path force-field wrapper now lives in the
library (models/force_field_augmented_score_network.py, round 5)."""

from diffusion_for_multi_scale_molecular_dynamics_tpu.models.force_field_augmented_score_network import (  # noqa: F401,E501
    wrap_axl_network_with_force_field as wrap_force_field,
)
