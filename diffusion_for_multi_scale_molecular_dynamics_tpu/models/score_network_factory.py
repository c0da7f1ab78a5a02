"""Config-keyed score network factory.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/models/score_networks/score_network_factory.py:25-119)
"""

from typing import Any, Dict

from .analytical_score_network import (
    AnalyticalScoreNetwork,
    AnalyticalScoreNetworkConfig,
    EquivariantAnalyticalScoreNetwork,
    EquivariantAnalyticalScoreNetworkConfig,
)
from .egnn_score_network import EGNNScoreNetwork, EGNNScoreNetworkConfig
from .equivariant_score_network import (
    EquivariantScoreNetwork,
    EquivariantScoreNetworkConfig,
)
from .mace_score_network import MaceScoreNetwork, MaceScoreNetworkConfig
from .mlp_score_network import MLPScoreNetwork, MLPScoreNetworkConfig

SCORE_NETWORKS_BY_ARCH = {
    "mlp": MLPScoreNetwork,
    "egnn": EGNNScoreNetwork,
    # "diffusion_mace": higher-order-equivariant slot, implemented TPU-first
    # as scalar/vector/rank-2-tensor message passing
    # (equivariant_score_network.py).
    "diffusion_mace": EquivariantScoreNetwork,
    # "mace": faithful MACE trunk (spherical irreps up to l=3, correlation-3
    # product basis) + prediction heads; supports torch-checkpoint import
    # (mace_score_network.py / mace_import.py).
    "mace": MaceScoreNetwork,
    "analytical": AnalyticalScoreNetwork,
    "equivariant_analytical": EquivariantAnalyticalScoreNetwork,
}

SCORE_NETWORK_CONFIGS_BY_ARCH = {
    "mlp": MLPScoreNetworkConfig,
    "egnn": EGNNScoreNetworkConfig,
    "diffusion_mace": EquivariantScoreNetworkConfig,
    "mace": MaceScoreNetworkConfig,
    "analytical": AnalyticalScoreNetworkConfig,
    "equivariant_analytical": EquivariantAnalyticalScoreNetworkConfig,
}


def create_score_network_config(
    score_network_dictionary: Dict[str, Any],
    global_parameters_dictionary: Dict[str, Any],
):
    """Merge global parameters (elements, spatial dimension, max atoms) into
    the architecture-specific config, checking consistency like the reference
    factory does."""
    cfg = dict(score_network_dictionary)
    architecture = cfg.pop("architecture")
    assert architecture in SCORE_NETWORK_CONFIGS_BY_ARCH, (
        f"Unknown score network architecture '{architecture}'. "
        f"Known: {sorted(SCORE_NETWORK_CONFIGS_BY_ARCH)}"
    )

    num_atom_types = len(global_parameters_dictionary["elements"])
    if "num_atom_types" in cfg:
        assert cfg["num_atom_types"] == num_atom_types, (
            "num_atom_types inconsistent with the global elements list"
        )
    cfg["num_atom_types"] = num_atom_types

    spatial_dimension = global_parameters_dictionary.get("spatial_dimension", 3)
    if "spatial_dimension" in cfg:
        assert cfg["spatial_dimension"] == spatial_dimension, (
            "spatial_dimension inconsistent between global and network config"
        )
    cfg["spatial_dimension"] = spatial_dimension

    config_cls = SCORE_NETWORK_CONFIGS_BY_ARCH[architecture]
    if architecture == "mlp" and "number_of_atoms" not in cfg:
        cfg["number_of_atoms"] = global_parameters_dictionary["max_atom"]

    return config_cls(architecture=architecture, **cfg)


def create_score_network(score_network_config):
    """Instantiate the flax module for a score network config."""
    architecture = score_network_config.architecture
    return SCORE_NETWORKS_BY_ARCH[architecture](score_network_config)
