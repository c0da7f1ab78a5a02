"""Score networks: MLP, EGNN (+Pallas-fused), equivariant, analytical; factory."""

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
from .mlp_score_network import MLPScoreNetwork, MLPScoreNetworkConfig
from .score_network import (
    ScoreNetworkConfig,
    guided_forward,
    impose_non_mask_atomic_type_prediction,
    validate_score_network_batch,
)
from .score_network_factory import (
    SCORE_NETWORKS_BY_ARCH,
    create_score_network,
    create_score_network_config,
)

__all__ = [
    "ScoreNetworkConfig",
    "MLPScoreNetwork",
    "MLPScoreNetworkConfig",
    "EGNNScoreNetwork",
    "EGNNScoreNetworkConfig",
    "EquivariantScoreNetwork",
    "EquivariantScoreNetworkConfig",
    "AnalyticalScoreNetwork",
    "AnalyticalScoreNetworkConfig",
    "EquivariantAnalyticalScoreNetwork",
    "EquivariantAnalyticalScoreNetworkConfig",
    "create_score_network",
    "create_score_network_config",
    "SCORE_NETWORKS_BY_ARCH",
    "guided_forward",
    "impose_non_mask_atomic_type_prediction",
    "validate_score_network_batch",
]
from .egnn_import import (
    convert_reference_egnn_state_dict,
    load_reference_egnn_checkpoint,
    load_torch_state_dict,
)
