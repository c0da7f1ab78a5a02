r"""Higher-order equivariant score network (the "diffusion_mace" capability slot).

The reference's DiffusionMACE rebuilds MACE (e3nn higher-order message
passing) for diffusion (src/diffusion_for_multi_scale_molecular_dynamics/models/
{diffusion_mace,diffusion_mace_score_network}.py): sigma-conditioned node
attributes, equivariant interactions over a periodic radial graph, a vector
readout for the cartesian score converted to fractional coordinates through
the cell, and a scalar readout for atom-type logits.

TPU-first redesign: instead of the e3nn irreps machinery (large dependency
surface, gather/scatter-heavy), this network carries scalar + vector node
features with PaiNN-style interactions (Schutt et al., ICML 2021) over the
same dense minimum-image pair geometry as the EGNN:

  * messages: filters W(rbf(r_ij)) * smooth-cutoff gate both scalar channels
    and two vector paths (neighbor vectors and unit displacements);
  * updates: channel-mixing U/V maps on vectors, gated by scalars — exact
    O(3) equivariance with pure dense tensor ops (MXU-friendly, no scatter);
  * readouts: gated linear combination of vector channels -> cartesian score
    -> fractional conversion s_frac = cell @ s_cart (same contraction as the
    reference, diffusion_mace_score_network.py:160-165); scalar MLP -> atom
    logits; L head zeros.

Sigma/time conditioning enters the initial scalar features exactly where the
reference mixes sigma into MACE's node attributes.
"""

from dataclasses import dataclass
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..namespace import ATOM_MASK, AXL, NOISE, NOISY_AXL_COMPOSITION, TIME
from ..ops.geometry import map_lattice_parameters_to_unit_cell_vectors
from ..ops.neighbors import get_orthogonal_min_image_displacements
from .score_network import ScoreNetworkConfig, impose_non_mask_atomic_type_prediction

_EXACT = jax.lax.Precision.HIGHEST


@dataclass(frozen=True, kw_only=True)
class EquivariantScoreNetworkConfig(ScoreNetworkConfig):
    """Hyperparameters of the scalar+vector equivariant score network."""

    architecture: str = "diffusion_mace"
    num_features: int = 64  # channels for scalar and vector features
    number_of_interactions: int = 3
    number_of_radial_basis: int = 16
    radial_cutoff: float = 5.0
    # bfloat16 for the channel-mixing matmuls; geometry stays float32.
    compute_dtype: str = "float32"
    # Score prediction head: "equivariant" (gated vector combination) or
    # "mlp" (plain MLP on invariant features — like the reference's MLP
    # MaceScorePredictionHead, score_prediction_head.py:61, it trades exact
    # equivariance for flexibility).
    prediction_head: str = "equivariant"
    # The reference's "mace" architecture can load pretrained MACE
    # checkpoints (mace_utils.py:133); torch checkpoints are not portable to
    # this framework, so only fresh weights are supported.
    use_pretrained: Any = None

    def __post_init__(self):
        assert self.prediction_head in ("equivariant", "mlp")
        if self.use_pretrained:
            raise NotImplementedError(
                "pretrained torch MACE checkpoints cannot be loaded into the "
                "TPU-native equivariant network; train from fresh weights"
            )


def _radial_basis(r, cutoff: float, n_basis: int):
    """Sine (Bessel-like) radial basis with a smooth cosine cutoff envelope."""
    safe_r = jnp.where(r > 1e-8, r, 1.0)
    n = jnp.arange(1, n_basis + 1, dtype=r.dtype)
    basis = jnp.sin(jnp.pi * n * r[..., None] / cutoff) / safe_r[..., None]
    envelope = 0.5 * (jnp.cos(jnp.pi * jnp.clip(r / cutoff, max=1.0)) + 1.0)
    return basis * envelope[..., None], envelope


class EquivariantScoreNetwork(nn.Module):
    """Periodic PaiNN-style diffusion score network."""

    config: EquivariantScoreNetworkConfig

    @nn.compact
    def __call__(self, batch: Dict[str, Any], conditional: bool = False) -> AXL:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        composition = batch[NOISY_AXL_COMPOSITION]
        x = composition.X
        batch_size, n, d = x.shape
        channels = cfg.num_features

        # Periodic geometry on the (collapse-guarded) cell, like the
        # reference's r_max clip (diffusion_mace_score_network.py:144).
        lattice = jnp.clip(composition.L, min=2.2 * cfg.radial_cutoff)
        lattice = lattice.at[:, d:].set(0.0)
        cell = map_lattice_parameters_to_unit_cell_vectors(lattice)

        # Minimum-image displacements, directly in fractional space (the box
        # exceeds 2 x cutoff by construction; no 3^d image expansion).
        disp = get_orthogonal_min_image_displacements(x, cell)  # [B, N, N, d]
        r2 = jnp.sum(disp**2, axis=-1)
        nonzero = r2 > 1e-12
        r_ij = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, r2, 1.0)), 0.0)

        within = (r_ij <= cfg.radial_cutoff) & nonzero
        atom_mask = batch.get(ATOM_MASK)
        if atom_mask is not None:
            within = within & atom_mask[:, :, None] & atom_mask[:, None, :]
        edge_mask = within.astype(jnp.float32)

        safe_r = jnp.where(r_ij > 1e-8, r_ij, 1.0)
        unit = disp / safe_r[..., None]
        rbf, envelope = _radial_basis(
            r_ij, cfg.radial_cutoff, cfg.number_of_radial_basis
        )

        # Initial features: species one-hot + sigma + time, like the
        # reference's sigma-mixed node attributes.
        onehot = jax.nn.one_hot(composition.A, cfg.num_classes, dtype=jnp.float32)
        sigma = jnp.broadcast_to(batch[NOISE][:, None, :], (batch_size, n, 1))
        time = jnp.broadcast_to(batch[TIME][:, None, :], (batch_size, n, 1))
        s = nn.Dense(channels, name="embedding")(
            jnp.concatenate([onehot, sigma, time], axis=-1)
        )
        v = jnp.zeros((batch_size, n, d, channels), jnp.float32)

        for block in range(cfg.number_of_interactions):
            s, v = self._interaction(
                s, v, rbf, unit, edge_mask, f"interaction_{block}", dtype
            )
            s, v = self._update(s, v, f"update_{block}", dtype)

        # Readouts.
        logits = nn.Dense(cfg.num_classes, name="atom_readout")(
            nn.silu(nn.Dense(channels, name="atom_hidden")(s))
        )
        if cfg.prediction_head == "equivariant":
            gates = nn.Dense(channels, use_bias=False, name="vector_readout")(s)
            cartesian_scores = jnp.sum(v * gates[:, :, None, :], axis=-1)
        else:  # "mlp": invariant features -> per-node score components.
            invariants = jnp.concatenate(
                [s, jnp.sqrt(jnp.sum(v**2, axis=2) + 1e-8)], axis=-1
            )
            hidden = nn.silu(nn.Dense(channels, name="mlp_head_hidden")(invariants))
            cartesian_scores = nn.Dense(d, name="mlp_head_out")(hidden)

        # Covector conversion to fractional coordinates: s_frac = cell @ s_cart.
        coordinates_scores = jnp.einsum(
            "bia,bna->bni", cell, cartesian_scores, precision=_EXACT
        )

        output = AXL(
            A=logits,
            X=coordinates_scores,
            L=jnp.zeros_like(composition.L),
        )
        return impose_non_mask_atomic_type_prediction(output)

    def _interaction(self, s, v, rbf, unit, edge_mask, name, dtype):
        """PaiNN message block over the dense pair tensor."""
        cfg = self.config
        channels = cfg.num_features

        h = nn.Dense(channels, dtype=dtype, name=f"{name}_phi0")(s.astype(dtype))
        h = nn.silu(h)
        h = nn.Dense(3 * channels, dtype=dtype, name=f"{name}_phi1")(h)
        filters = nn.Dense(
            3 * channels, dtype=dtype, name=f"{name}_filter"
        )(rbf.astype(dtype))

        # Per-pair gated source features: [B, N(target), N(source), 3C].
        pair = (h[:, None, :, :] * filters).astype(jnp.float32)
        pair = pair * edge_mask[..., None]
        gate_s, gate_vv, gate_vs = jnp.split(pair, 3, axis=-1)

        ds = jnp.sum(gate_s, axis=2)
        # Vector message: neighbor vectors + radial direction, both gated.
        dv = jnp.einsum("bjdc,bijc->bidc", v, gate_vv) + jnp.einsum(
            "bijd,bijc->bidc", unit, gate_vs
        )
        return s + ds.astype(s.dtype), v + dv

    def _update(self, s, v, name, dtype):
        """Node-local scalar/vector mixing (exact equivariance)."""
        cfg = self.config
        channels = cfg.num_features

        u_v = nn.Dense(channels, use_bias=False, dtype=dtype, name=f"{name}_U")(
            v.astype(dtype)
        ).astype(jnp.float32)
        v_v = nn.Dense(channels, use_bias=False, dtype=dtype, name=f"{name}_V")(
            v.astype(dtype)
        ).astype(jnp.float32)

        v_norm = jnp.sqrt(jnp.sum(v_v**2, axis=2) + 1e-8)  # [B, N, C]
        a = nn.Dense(channels, dtype=dtype, name=f"{name}_a0")(
            jnp.concatenate([s.astype(dtype), v_norm.astype(dtype)], axis=-1)
        )
        a = nn.silu(a)
        a = nn.Dense(3 * channels, dtype=dtype, name=f"{name}_a1")(a).astype(
            jnp.float32
        )
        a_ss, a_sv, a_vv = jnp.split(a, 3, axis=-1)

        scalar_update = a_ss + a_sv * jnp.sum(u_v * v_v, axis=2)
        vector_update = a_vv[:, :, None, :] * u_v
        return s + scalar_update.astype(s.dtype), v + vector_update
