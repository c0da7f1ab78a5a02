r"""MACE score network: a MACE feature extractor + score prediction heads.

The native rebuild of the reference's "mace" architecture
(src/diffusion_for_multi_scale_molecular_dynamics/models/score_networks/
mace_score_network.py:27-200): node features from a MACE trunk (optionally
imported from a released mace-torch checkpoint and frozen), a coordinate
prediction head (MLP or equivariant, score_prediction_head.py:61/:112) fed
with the diffusion time, and an MLP atom-type head. The X output is a
Cartesian score converted to fractional coordinates through the cell, the L
head is zeros — identical output conventions.

Pretrained weights: the reference downloads the released small/medium/large
MACE checkpoints at runtime (models/mace_utils.py:133). Here
``use_pretrained`` takes a *local path* to such a torch checkpoint's state
dict; models/mace_import.py maps it onto the flax trunk (this environment
has no network egress, so downloading is the caller's job). ``freeze_trunk``
reproduces the reference's frozen-feature-extractor mode via stop_gradient.
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..namespace import ATOM_MASK, AXL, NOISE, NOISY_AXL_COMPOSITION, TIME
from ..ops.geometry import (
    image_coverage_nan_guard,
    map_lattice_parameters_to_unit_cell_vectors,
)
from ..ops.irreps_layers import IrrepsLinear, ScalarTensorProduct
from ..ops.neighbors import get_orthogonal_min_image_displacements
from ..ops.so3 import Irreps, irrep_to_vector, split_irreps, concat_irreps
from .mace_modules import MaceFeatureExtractor, mace_output_irreps
from .score_network import (
    ScoreNetworkConfig,
    broadcast_per_graph_scalar_to_nodes,
    impose_non_mask_atomic_type_prediction,
)

_EXACT = jax.lax.Precision.HIGHEST


@dataclass(frozen=True, kw_only=True)
class MaceScoreNetworkConfig(ScoreNetworkConfig):
    """Hyperparameters of the MACE score network.

    Field names follow the reference's MACEScoreNetworkParameters
    (mace_score_network.py:27-61) where they exist there.
    """

    architecture: str = "mace"
    r_max: float = 5.0
    num_bessel: int = 8
    num_polynomial_cutoff: int = 5
    max_ell: int = 2
    num_interactions: int = 2
    hidden_irreps: str = "128x0e + 128x1o"
    avg_num_neighbors: float = 1.0
    correlation: int = 3
    radial_mlp: Tuple[int, ...] = (64, 64, 64)
    # Number of element channels for the one-hot node attributes. Fresh
    # models default to num_atom_types + 1 (MASK gets a channel); imported
    # checkpoints use the checkpoint's own table (89 for the released ones).
    num_elements: Optional[int] = None
    # Atom-type index -> element-channel mapping. The released checkpoints
    # index node attributes by atomic number over an 89-entry z-table
    # (the reference builds it with get_atomic_number_table_from_zs(range(89)),
    # mace_score_network.py:79-82), so Si must hit channel 14, not 0. One
    # entry per atom type, e.g. (14,) for [Si]; MASK atoms map to channel 0
    # (the reference has no defined MASK behavior for pretrained MACE — its
    # own TODO at mace_score_network.py:138). None = identity mapping.
    element_z_numbers: Optional[Tuple[int, ...]] = None
    # Coordinate prediction head: "mlp" or "equivariant"
    # (score_prediction_head.py:61/:112).
    prediction_head: str = "equivariant"
    head_hidden_size: int = 64
    head_n_hidden_layers: int = 2
    time_embedding_irreps: str = "16x0e"
    head_number_of_layers: int = 2
    atom_type_head_hidden_size: int = 64
    atom_type_head_n_hidden_layers: int = 2
    # Local path to a torch MACE checkpoint state dict (no download; the
    # reference fetches small/medium/large at mace_utils.py:133).
    use_pretrained: Optional[str] = None
    freeze_trunk: bool = False
    # Mix the noise level into the trunk's initial node features — the
    # defining move of the reference's DiffusionMACE (sigma embedded into the
    # node attributes via a tensor product, diffusion_mace.py:218). Off by
    # default to keep the trunk checkpoint-compatible with plain MACE.
    condition_on_sigma: bool = False
    sigma_embedding_size: int = 16
    compute_dtype: str = "float32"
    # Periodic-image shells for the pair grid: offsets in {-s..s}^d, so the
    # trunk sees every image of every neighbor within r_max. s=1 is exact
    # whenever r_max < box length; s=0 falls back to single min-image pairs
    # (exact only when the box exceeds 2 x r_max — cheaper by (2s+1)^d, use
    # it for large cells). The reference instead *clips* the box to
    # >= 2.2 r_max (mace_score_network.py:170-175), which silently distorts
    # the geometry of any cell smaller than that: for Si 1x1x1 (5.43 A,
    # r_max 4.5) the first neighbor shell lands at r/r_max = 0.95 where the
    # polynomial cutoff envelope is ~0 and the trunk goes geometry-blind.
    image_shells: int = 1
    # Pallas-fused edge pipeline (models/mace_edge_fused.py): same
    # parameters and algebra as the dense path, per-pair tensors kept in
    # VMEM. Checkpoint-compatible in both directions (no layout change).
    use_fused_edge_kernel: bool = False
    # Edge-stage formulation: "messages" (default — measured fastest,
    # arch_timing_r5.json) or "j_gemm" (round-5 MXU-layout v1, measured
    # 1.38x slower; see mace_modules.MaceInteraction). Same algebra,
    # checkpoint-compatible both ways.
    edge_contraction: str = "messages"

    def __post_init__(self):
        assert self.prediction_head in ("mlp", "equivariant")
        assert 1 <= self.correlation <= 3
        assert 0 <= self.max_ell <= 3
        assert not (self.use_pretrained and self.condition_on_sigma), (
            "sigma conditioning adds trunk parameters plain-MACE checkpoints "
            "do not have; use the head's time conditioning instead"
        )

    @property
    def resolved_num_elements(self) -> int:
        return (
            self.num_elements
            if self.num_elements is not None
            else self.num_atom_types + 1
        )

    @property
    def output_node_irreps(self) -> Irreps:
        return mace_output_irreps(self.hidden_irreps, self.num_interactions)


class _MlpHead(nn.Module):
    """ReLU MLP on (node features, time) — MaceMLPScorePredictionHead."""

    hidden_size: int
    n_hidden_layers: int
    output_size: int

    @nn.compact
    def __call__(self, node_features, times):
        h = jnp.concatenate([node_features, times], axis=-1)
        for index in range(self.n_hidden_layers):
            h = nn.relu(nn.Dense(self.hidden_size, name=f"hidden_{index}")(h))
        return nn.Dense(self.output_size, name="output")(h)


class _EquivariantHead(nn.Module):
    """Time-conditioned equivariant head — MaceEquivariantScorePredictionHead.

    time -> 0e embedding; mixed into the node features with a scalar tensor
    product; then stacked [IrrepsLinear -> per-irrep RMS norm -> gated silu
    on scalars]; linear readout to a single 1o vector. The reference's e3nn
    BatchNorm (running batch statistics, score_prediction_head.py:155) is
    replaced by a batch-independent per-irrep RMS norm — jit-friendly and
    identical in role (activation-scale control).
    """

    feature_irreps: str
    time_embedding_irreps: str = "16x0e"
    number_of_layers: int = 2

    @nn.compact
    def __call__(self, node_features, times):
        feature_irreps = Irreps(self.feature_irreps)
        mixed_irreps, _ = feature_irreps.sort()
        mixed_irreps = mixed_irreps.simplify()

        time_embedding = IrrepsLinear(
            "1x0e", self.time_embedding_irreps, name="time_embedding"
        )(times)
        h = ScalarTensorProduct(
            self.time_embedding_irreps,
            str(feature_irreps),
            str(mixed_irreps),
            name="time_mixing",
        )(time_embedding, node_features)

        for index in range(self.number_of_layers):
            h = IrrepsLinear(
                str(mixed_irreps), str(mixed_irreps), name=f"linear_{index}"
            )(h)
            h = _irreps_rms_norm(h, mixed_irreps)
            h = _gated_scalar_activation(h, mixed_irreps)
        vector = IrrepsLinear(str(mixed_irreps), "1x1o", name="readout")(h)
        return irrep_to_vector(vector)


def _irreps_rms_norm(features, irreps: Irreps, eps: float = 1e-6):
    """Normalize each irrep group by the RMS of its channel norms."""
    blocks = split_irreps(features, irreps)
    normalized = []
    for block in blocks:
        mean_square = jnp.mean(jnp.sum(block**2, axis=-1), axis=-1, keepdims=True)
        normalized.append(block * jax.lax.rsqrt(mean_square + eps)[..., None])
    return concat_irreps(normalized)


def _gated_scalar_activation(features, irreps: Irreps):
    """silu on l=0 blocks, identity on l>0 (the reference's Activation with
    [gate] + [None]*k, score_prediction_head.py:160-165)."""
    blocks = split_irreps(features, irreps)
    activated = [
        nn.silu(block) if ir.l == 0 else block
        for block, (_, ir) in zip(blocks, irreps)
    ]
    return concat_irreps(activated)


class MaceScoreNetwork(nn.Module):
    """MACE trunk + prediction heads mapping a noisy AXL batch to scores."""

    config: MaceScoreNetworkConfig

    @nn.compact
    def __call__(self, batch: Dict[str, Any], conditional: bool = False) -> AXL:
        cfg = self.config
        composition = batch[NOISY_AXL_COMPOSITION]
        x = composition.X
        batch_size, natoms, d = x.shape

        # True-geometry pair grid over (2s+1)^d periodic images. Unlike the
        # reference's box clip to >= 2.2 r_max (mace_score_network.py:170-175)
        # — which distorts any smaller cell — the real cell is kept and each
        # neighbor image within the cutoff becomes its own pair, flattened
        # into the source axis (J = N * K, source atom = index // K).
        lattice = jnp.clip(composition.L, min=1e-3)  # degenerate-cell guard
        lattice = lattice.at[:, d:].set(0.0)
        cell = map_lattice_parameters_to_unit_cell_vectors(lattice)
        lengths = jnp.diagonal(cell, axis1=-2, axis2=-1)  # [B, d]

        shells = int(cfg.image_shells)
        if shells > 0:
            offsets = jnp.stack(
                jnp.meshgrid(*([jnp.arange(-shells, shells + 1)] * d),
                             indexing="ij"),
                axis=-1,
            ).reshape(-1, d)  # [K, d]
            n_images = offsets.shape[0]
            delta = x[:, None, :, :] - x[:, :, None, :]  # [B,N,N,d], no wrap
            delta = delta - jnp.round(delta)  # principal image in [-1/2,1/2)
            frac = delta[:, :, :, None, :] + offsets[None, None, None, :, :]
            disp = frac * lengths[:, None, None, None, :]
            disp = disp.reshape(batch_size, natoms, natoms * n_images, d)
        else:
            disp = get_orthogonal_min_image_displacements(x, cell)  # [B,N,N,d]
        r2 = jnp.sum(disp**2, axis=-1)
        nonzero = r2 > 1e-12
        distances = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, r2, 1.0)), 0.0)
        pair_mask = (distances <= cfg.r_max) & nonzero
        # A diffusing cell below grid coverage must fail loudly, not drop
        # images silently (ops/geometry.py::image_coverage_nan_guard).
        distances = image_coverage_nan_guard(
            distances, lengths, cfg.r_max, shells
        )
        atom_mask = batch.get(ATOM_MASK)
        if atom_mask is not None:
            source_mask = atom_mask[:, None, :]
            if shells > 0:
                source_mask = jnp.repeat(source_mask, n_images, axis=2)
            pair_mask = pair_mask & atom_mask[:, :, None] & source_mask

        if cfg.element_z_numbers is not None:
            assert len(cfg.element_z_numbers) == cfg.num_atom_types
            channel_of_type = jnp.asarray(
                tuple(cfg.element_z_numbers) + (0,), dtype=jnp.int32
            )
            element_channels = channel_of_type[composition.A]
        else:
            element_channels = composition.A
        # The trunk modules follow their input dtype (mace_modules.py casts
        # weights/CG tables to the feature dtype at every use site), so the
        # one-hot's dtype selects the trunk compute precision; geometry
        # (displacements, distances) stays float32 and is cast at use.
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        node_attrs = jax.nn.one_hot(
            element_channels, cfg.resolved_num_elements, dtype=compute_dtype
        )

        trunk = MaceFeatureExtractor(
            num_elements=cfg.resolved_num_elements,
            hidden_irreps=cfg.hidden_irreps,
            num_interactions=cfg.num_interactions,
            max_ell=cfg.max_ell,
            correlation=cfg.correlation,
            r_max=cfg.r_max,
            num_bessel=cfg.num_bessel,
            num_polynomial_cutoff=cfg.num_polynomial_cutoff,
            avg_num_neighbors=cfg.avg_num_neighbors,
            radial_mlp=tuple(cfg.radial_mlp),
            use_fused_edge_kernel=cfg.use_fused_edge_kernel,
            edge_contraction=cfg.edge_contraction,
            name="mace",
        )
        if cfg.condition_on_sigma:
            sigma = broadcast_per_graph_scalar_to_nodes(batch[NOISE], natoms)
            conditioning = nn.silu(
                nn.Dense(cfg.sigma_embedding_size, name="sigma_embedding")(sigma)
            )
        else:
            conditioning = None
        node_features = trunk(
            node_attrs, disp, distances, pair_mask, conditioning
        ).astype(jnp.float32)
        if cfg.freeze_trunk:
            # The reference freezes the pretrained extractor
            # (mace_score_network.py:27 docstring / mace_utils.py:133).
            node_features = jax.lax.stop_gradient(node_features)

        times = broadcast_per_graph_scalar_to_nodes(batch[TIME], natoms)
        feature_irreps = str(cfg.output_node_irreps)

        if cfg.prediction_head == "equivariant":
            cartesian_scores = _EquivariantHead(
                feature_irreps=feature_irreps,
                time_embedding_irreps=cfg.time_embedding_irreps,
                number_of_layers=cfg.head_number_of_layers,
                name="coordinates_head",
            )(node_features, times)
        else:
            cartesian_scores = _MlpHead(
                hidden_size=cfg.head_hidden_size,
                n_hidden_layers=cfg.head_n_hidden_layers,
                output_size=d,
                name="coordinates_head",
            )(node_features, times)

        logits = _MlpHead(
            hidden_size=cfg.atom_type_head_hidden_size,
            n_hidden_layers=cfg.atom_type_head_n_hidden_layers,
            output_size=cfg.num_classes,
            name="atom_types_head",
        )(node_features, times)

        # Covector conversion to fractional coordinates: s_frac = cell @ s_cart
        # (same contraction as diffusion_mace_score_network.py:160-165).
        coordinates_scores = jnp.einsum(
            "bia,bna->bni", cell, cartesian_scores, precision=_EXACT
        )

        output = AXL(
            A=logits,
            X=coordinates_scores,
            L=jnp.zeros_like(composition.L),
        )
        return impose_non_mask_atomic_type_prediction(output)
