"""EGNN score network — the production architecture.

E(n)-equivariant GNN (Satorras et al.) adapted to the torus: relative
coordinates are uplifted to a Euclidean embedding via Bloch waves
z = [cos(2 pi K x), sin(2 pi K x)], message-passed, and the coordinate output
is projected back to a fractional-coordinate score through antisymmetric
per-direction generators (equivalent to the reference's block-diagonal Gamma
matrices, egnn_score_network.py:130-160).

TPU-first redesign (functional parity with
src/diffusion_for_multi_scale_molecular_dynamics/models/{egnn,egnn_score_network,egnn_utils}.py,
different algorithm):

  * The reference builds dynamic COO edge lists (KeOps) and scatter-adds
    per-edge messages. Dynamic edge counts and scatters are XLA-hostile, and
    at 8..216 atoms the graph is tiny: here message passing is *dense* over
    [batch, n, n, features] with a boolean/weight mask. Every MLP becomes a
    large batched matmul on the MXU; masked mean/sum replaces
    unsorted_segment_mean/sum; there is no gather/scatter at all.
  * Periodic edges use minimum-image distances over the 3^d image shell; the
    cell is clipped to >= 2.2 * radial_cutoff exactly like the reference
    (egnn_score_network.py:236) which also guarantees the minimum image is
    the only one inside the cutoff. With drop_duplicate_edges=False, image
    multiplicity within the cutoff enters as an integer edge weight instead
    of repeated COO rows.
  * Padded atoms (static max-atom batches) are excluded via ATOM_MASK.
"""

import logging
from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..namespace import ATOM_MASK, AXL, NOISE, NOISY_AXL_COMPOSITION
from ..ops.geometry import (
    get_positions_from_coordinates,
    map_lattice_parameters_to_unit_cell_vectors,
)
from ..ops.lattice_shells import get_positive_bloch_wave_vectors
from ..ops.neighbors import (
    get_orthogonal_min_image_displacements,
    get_periodic_images,
)
from .score_network import ScoreNetworkConfig, impose_non_mask_atomic_type_prediction

logger = logging.getLogger(__name__)


@dataclass(frozen=True, kw_only=True)
class EGNNScoreNetworkConfig(ScoreNetworkConfig):
    """Hyperparameters of the EGNN score network (reference defaults)."""

    architecture: str = "egnn"
    number_of_bloch_wave_shells: int = 1
    message_n_hidden_dimensions: int = 1
    message_hidden_dimensions_size: int = 16
    node_n_hidden_dimensions: int = 1
    node_hidden_dimensions_size: int = 32
    coordinate_n_hidden_dimensions: int = 1
    coordinate_hidden_dimensions_size: int = 32
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    coords_agg: str = "mean"
    message_agg: str = "mean"
    n_layers: int = 4
    edges: str = "fully_connected"
    radial_cutoff: Optional[float] = None
    drop_duplicate_edges: bool = True
    # bfloat16 runs the message/node MLPs on the MXU at full rate; geometry
    # (uplift, radial, projection) always stays float32.
    compute_dtype: str = "float32"
    # Pallas-fused message block: the [B, N, N, H] per-pair activations stay
    # in VMEM (see egnn_fused.py). Requires attention=False, normalize=False.
    use_fused_message_block: bool = False
    # Lattice-parameter score head (round 5, beyond the reference's zeros —
    # its egnn_score_network.py:300 hard-codes L=0, so the reference EGNN
    # cannot diffuse a lattice at all). A masked mean over the final node
    # features (translation/permutation invariant: EGCL messages depend only
    # on coordinate differences) is concatenated with sigma and the lattice
    # parameters themselves — the trunk never sees L in fully_connected mode
    # — and read out by a small SiLU MLP. Default off: enabling it adds
    # parameters, which would break restore of pre-round-5 checkpoints.
    predict_lattice_parameter_scores: bool = False
    lattice_head_n_hidden_dimensions: int = 2
    lattice_head_hidden_dimensions_size: int = 64

    def __post_init__(self):
        assert self.edges in ("fully_connected", "radial_cutoff"), (
            f"Edges type should be fully_connected or radial_cutoff. Got {self.edges}"
        )
        if self.edges == "fully_connected":
            assert self.radial_cutoff is None, (
                "A radial cutoff is inconsistent with fully_connected edges."
            )
        else:
            assert isinstance(self.radial_cutoff, float), (
                "A float radial_cutoff is required for edges=radial_cutoff."
            )
        assert self.coords_agg in ("mean", "sum")
        assert self.message_agg in ("mean", "sum")
        if self.use_fused_message_block:
            assert not self.attention and not self.normalize, (
                "the fused message block supports attention=False, "
                "normalize=False"
            )


def _mlp(widths, name, dtype, final_activation=True, use_final_bias=True):
    """A list of (Dense, activate?) specs; applied by _apply_mlp."""
    layers = []
    for i, w in enumerate(widths):
        act = final_activation or i < len(widths) - 1
        layers.append((w, act, f"{name}_{i}", use_final_bias or i < len(widths) - 1))
    return layers


class _DenseEGCL(nn.Module):
    """One dense masked E(n)-equivariant layer.

    Message m_ij = phi_e(h_i, h_j, |z_i - z_j|^2), aggregated over sources j
    at target i with the edge weight matrix; coordinate update
    z_i += agg_j (z_i - z_j) phi_x(m_ij); node update h_i = h_i + phi_h(h_i, m_i).
    """

    config: EGNNScoreNetworkConfig

    @nn.compact
    def __call__(self, h, z, edge_weights):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        eps = 1e-8

        # Geometry in fp32.
        diff = z[:, :, None, :] - z[:, None, :, :]  # [B, N, N, D]
        radial = jnp.sum(diff**2, axis=-1, keepdims=True)  # [B, N, N, 1]

        if cfg.use_fused_message_block:
            return self._fused_call(h, z, edge_weights, diff, radial[..., 0])

        if cfg.normalize:
            # Smoothly normalized direction: tanh(|r|^2)/sqrt(|r|^2 + eps^2)
            # vanishes at overlap and saturates to a unit vector.
            diff = diff * (jnp.tanh(radial) / jnp.sqrt(radial + eps**2))

        n = h.shape[1]
        # TPU single buffers are limited to 2^31 bytes: the dense path's
        # [B, N, N, 2F+1] edge-MLP input crosses that at production widths
        # (e.g. batch 32 at N=216, F=256 -> 2.85 GiB, a hard worker fault —
        # experiments/buffer_audit.py). The fused path never builds it.
        pair_bytes = (
            jnp.dtype(dtype).itemsize * h.shape[0] * n * n * (2 * h.shape[-1] + 1)
        )
        if pair_bytes >= 2**31:
            logger.warning(
                "dense EGCL edge tensor is %.2f GiB (batch %d, N %d, F %d) — "
                "at or above the 2^31-byte TPU buffer limit; set "
                "use_fused_message_block: true (see "
                "utils/egnn_param_migration.py to migrate a trained "
                "checkpoint) or reduce the sampling batch",
                pair_bytes / 2**30, h.shape[0], n, h.shape[-1],
            )
        h_i = jnp.broadcast_to(h[:, :, None, :], (h.shape[0], n, n, h.shape[-1]))
        h_j = jnp.broadcast_to(h[:, None, :, :], (h.shape[0], n, n, h.shape[-1]))
        msg_in = jnp.concatenate(
            [h_i, h_j, radial.astype(dtype)], axis=-1
        ).astype(dtype)

        m = msg_in
        for _ in range(cfg.message_n_hidden_dimensions + 1):
            m = nn.silu(nn.Dense(cfg.message_hidden_dimensions_size, dtype=dtype)(m))
        if cfg.attention:
            m = m * nn.sigmoid(nn.Dense(1, dtype=dtype)(m))

        w = edge_weights[..., None].astype(dtype)  # [B, N, N, 1]
        degree = jnp.clip(jnp.sum(w, axis=2), min=1.0)  # [B, N, 1]

        # Aggregate messages over sources j.
        m_sum = jnp.sum(m * w, axis=2)
        m_agg = m_sum / degree if cfg.message_agg == "mean" else m_sum

        # Coordinate update (fp32 geometry).
        phi_x = m
        for _ in range(cfg.coordinate_n_hidden_dimensions + 1):
            phi_x = nn.silu(
                nn.Dense(cfg.coordinate_hidden_dimensions_size, dtype=dtype)(phi_x)
            )
        phi_x = nn.Dense(1, use_bias=False, dtype=dtype)(phi_x)
        if cfg.tanh:
            phi_x = nn.tanh(phi_x)
        trans = diff * phi_x.astype(jnp.float32) * edge_weights[..., None]
        trans_sum = jnp.sum(trans, axis=2)
        z_agg = (
            trans_sum / degree.astype(jnp.float32)
            if cfg.coords_agg == "mean"
            else trans_sum
        )
        z = z + z_agg

        # Node update.
        h_new = self._node_update(h, m_agg, dtype)
        return h_new, z

    def _node_update(self, h, m_agg, dtype):
        cfg = self.config
        node_in = jnp.concatenate([h.astype(dtype), m_agg.astype(dtype)], axis=-1)
        u = node_in
        for _ in range(cfg.node_n_hidden_dimensions + 1):
            u = nn.silu(nn.Dense(cfg.node_hidden_dimensions_size, dtype=dtype)(u))
        u = nn.Dense(h.shape[-1], dtype=dtype)(u)
        h_new = u.astype(h.dtype)
        if cfg.residual:
            h_new = h + h_new
        return h_new

    def _fused_call(self, h, z, edge_weights, diff, radial):
        """Pallas-fused message+gate path (egnn_fused.py)."""
        from .egnn_fused import fused_message_block, init_message_block_params

        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        n_message_layers = cfg.message_n_hidden_dimensions + 1
        n_coordinate_layers = cfg.coordinate_n_hidden_dimensions + 1

        params = self.param(
            "fused_message_block",
            init_message_block_params,
            h.shape[-1],
            cfg.message_hidden_dimensions_size,
            n_message_layers,
            n_coordinate_layers,
            cfg.coordinate_hidden_dimensions_size,
        )
        m_agg_sum, phi = fused_message_block(
            params,
            h,
            radial,
            edge_weights,
            n_message_layers,
            n_coordinate_layers,
            cfg.tanh,
        )

        degree = jnp.clip(jnp.sum(edge_weights, axis=2), min=1.0)[..., None]
        m_agg = m_agg_sum / degree if cfg.message_agg == "mean" else m_agg_sum

        trans = diff * (phi * edge_weights)[..., None]
        trans_sum = jnp.sum(trans, axis=2)
        z_agg = trans_sum / degree if cfg.coords_agg == "mean" else trans_sum
        z = z + z_agg

        h_new = self._node_update(h, m_agg, dtype)
        return h_new, z


class EGNNScoreNetwork(nn.Module):
    """EGNN over the Bloch-uplifted torus with Gamma-projected X scores."""

    config: EGNNScoreNetworkConfig

    def _edge_weights(
        self, composition, atom_mask: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        """Edge weight matrix [batch, n, n]: 0 = no edge, k = image multiplicity."""
        cfg = self.config
        x = composition.X
        batch_size, n, d = x.shape

        no_self = 1.0 - jnp.eye(n, dtype=jnp.float32)
        if cfg.edges == "fully_connected":
            weights = jnp.broadcast_to(no_self, (batch_size, n, n))
        else:
            # Clip the box so it cannot collapse below twice the cutoff
            # (same guard as the reference); with the box > 2 x cutoff the
            # minimum image decides edge membership.
            lattice = jnp.clip(composition.L, min=2.2 * cfg.radial_cutoff)
            lattice = lattice.at[:, d:].set(0.0)
            cell = map_lattice_parameters_to_unit_cell_vectors(lattice)
            if cfg.drop_duplicate_edges:
                # Fast path: direct fractional min-image, no 3^d expansion.
                disp = get_orthogonal_min_image_displacements(x, cell)
                within = jnp.sum(disp**2, axis=-1) <= cfg.radial_cutoff**2
                weights = within.astype(jnp.float32)
            else:
                cart = get_positions_from_coordinates(x, cell)
                images = get_periodic_images(cart, cell)
                within = (
                    images.distances <= cfg.radial_cutoff
                ) & ~images.self_mask[None]
                weights = jnp.sum(within, axis=-1).astype(jnp.float32)
            weights = weights * no_self

        if atom_mask is not None:
            pair = atom_mask[:, :, None] * atom_mask[:, None, :]
            weights = weights * pair
        return weights

    @nn.compact
    def __call__(self, batch: Dict[str, Any], conditional: bool = False) -> AXL:
        cfg = self.config
        composition = batch[NOISY_AXL_COMPOSITION]
        x = composition.X
        batch_size, n, d = x.shape

        bloch = jnp.asarray(
            get_positive_bloch_wave_vectors(cfg.number_of_bloch_wave_shells, d),
            dtype=jnp.float32,
        )  # [K, d]

        # Uplift to the Bloch embedding space; layout per wave: (cos, sin).
        kr = 2.0 * jnp.pi * jnp.einsum("bnd,kd->bnk", x, bloch)
        z0 = jnp.stack([jnp.cos(kr), jnp.sin(kr)], axis=-1).reshape(
            batch_size, n, -1
        )  # [B, N, 2K]

        sigma = batch[NOISE]  # [B, 1]
        onehot = jax.nn.one_hot(composition.A, cfg.num_classes, dtype=jnp.float32)
        node_features = [
            jnp.broadcast_to(sigma[:, None, :], (batch_size, n, 1)), onehot,
        ]
        if cfg.predict_lattice_parameter_scores:
            # Lattice-diffusing mode conditions every head on L: in
            # fully_connected mode nothing else sees the lattice, and the X
            # score of a free-lattice model physically depends on the cell.
            node_features.append(
                jnp.broadcast_to(
                    composition.L[:, None, :],
                    (batch_size, n, composition.L.shape[-1]),
                )
            )
        h = jnp.concatenate(node_features, axis=-1)

        atom_mask = batch.get(ATOM_MASK)
        edge_weights = self._edge_weights(composition, atom_mask)

        h = nn.Dense(cfg.node_hidden_dimensions_size, name="embedding_in")(h)
        z = z0
        for layer in range(cfg.n_layers):
            h, z = _DenseEGCL(cfg, name=f"egcl_{layer}")(h, z, edge_weights)

        logits = nn.Dense(cfg.num_classes, name="node_classification")(h)

        # Project the uplifted output back to fractional-coordinate scores:
        # S^alpha = z0 . Gamma^alpha . z_out with block-antisymmetric Gamma;
        # per Bloch wave b the block contributes sin_b*zc_b - cos_b*zs_b
        # scaled by K_b^alpha (algebraically identical to the reference's
        # block_diag Gamma contraction, egnn_score_network.py:276).
        zc0, zs0 = z0[..., 0::2], z0[..., 1::2]
        zc, zs = z[..., 0::2], z[..., 1::2]
        wave_amplitude = zs0 * zc - zc0 * zs  # [B, N, K]
        scores = jnp.einsum("bnk,kd->bnd", wave_amplitude, bloch)

        if cfg.predict_lattice_parameter_scores:
            if atom_mask is None:
                mask = jnp.ones((batch_size, n), jnp.float32)
            else:
                mask = atom_mask.astype(jnp.float32)
            denom = jnp.clip(jnp.sum(mask, axis=1, keepdims=True), min=1.0)
            pooled = jnp.sum(
                h.astype(jnp.float32) * mask[..., None], axis=1
            ) / denom  # [B, F]
            lattice_features = jnp.concatenate(
                [pooled, sigma, composition.L], axis=-1
            )
            for i in range(cfg.lattice_head_n_hidden_dimensions):
                lattice_features = nn.silu(
                    nn.Dense(
                        cfg.lattice_head_hidden_dimensions_size,
                        name=f"lattice_head_{i}",
                    )(lattice_features)
                )
            l_scores = nn.Dense(
                composition.L.shape[-1], name="lattice_head_out"
            )(lattice_features)
        else:
            # Reference parity: the reference EGNN predicts zeros for L
            # (egnn_score_network.py:300 there).
            l_scores = jnp.zeros_like(composition.L)

        output = AXL(A=logits, X=scores, L=l_scores)
        return impose_non_mask_atomic_type_prediction(output)
