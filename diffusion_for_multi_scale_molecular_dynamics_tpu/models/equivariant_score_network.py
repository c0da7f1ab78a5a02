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
from ..ops.geometry import (
    image_coverage_nan_guard,
    map_lattice_parameters_to_unit_cell_vectors,
)
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
    # Maximum feature rank: 1 = scalars+vectors (PaiNN), 2 adds rank-2
    # traceless-symmetric Cartesian tensors with l2<->l1<->l0 product paths
    # (the higher-order message passing of the reference's DiffusionMACE,
    # diffusion_mace.py:131-465 with max_ell=2, rebuilt with Cartesian-tensor
    # contractions instead of e3nn tensor products — every op is a dense
    # matmul/einsum, no Clebsch-Gordan gathers).
    max_ell: int = 1
    # bfloat16 for the channel-mixing matmuls; geometry stays float32.
    compute_dtype: str = "float32"
    # Periodic-image shells for the pair grid (offsets in {-s..s}^d). s=1 is
    # exact whenever radial_cutoff < box length; s=0 = single min-image pair
    # per atom pair, (2s+1)^d cheaper, exact only when box > 2 x cutoff.
    image_shells: int = 1
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
        assert self.max_ell in (1, 2), "max_ell must be 1 or 2"
        if self.use_pretrained:
            raise NotImplementedError(
                "the Cartesian equivariant network trains from fresh weights "
                "only. For pretrained torch MACE checkpoints use "
                "architecture 'mace' (models/mace_score_network.py: "
                "use_pretrained=<local state-dict path>, freeze_trunk); "
                "reference-trained EGNN checkpoints import via "
                "models/egnn_import.py."
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

        # True-geometry pair grid over (2s+1)^d periodic images, flattened
        # into the source axis (J = N * K, source atom = pair index // K).
        # The reference instead clips the box to 2.2 x r_max
        # (diffusion_mace_score_network.py:144), which distorts any smaller
        # cell — for Si 1x1x1 it pushes the first shell to the edge of the
        # cutoff envelope and blinds the network. image_shells=0 recovers
        # the cheap single min-image path (exact when box > 2 x cutoff).
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
            delta = x[:, None, :, :] - x[:, :, None, :]
            delta = delta - jnp.round(delta)
            frac = delta[:, :, :, None, :] + offsets[None, None, None, :, :]
            disp = frac * lengths[:, None, None, None, :]
            disp = disp.reshape(batch_size, n, n * n_images, d)
        else:
            disp = get_orthogonal_min_image_displacements(x, cell)  # [B,N,N,d]
        r2 = jnp.sum(disp**2, axis=-1)
        nonzero = r2 > 1e-12
        r_ij = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, r2, 1.0)), 0.0)

        within = (r_ij <= cfg.radial_cutoff) & nonzero
        atom_mask = batch.get(ATOM_MASK)
        if atom_mask is not None:
            source_mask = atom_mask[:, None, :]
            if shells > 0:
                source_mask = jnp.repeat(source_mask, n_images, axis=2)
            within = within & atom_mask[:, :, None] & source_mask
        edge_mask = within.astype(jnp.float32)
        # A diffusing cell below grid coverage must fail loudly, not drop
        # images silently (ops/geometry.py::image_coverage_nan_guard).
        edge_mask = image_coverage_nan_guard(
            edge_mask, lengths, cfg.radial_cutoff, shells
        )

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
        if cfg.max_ell >= 2:
            # Rank-2 traceless symmetric Cartesian tensor features, and the
            # edge l=2 basis Y2(r_ij) = r^ (x) r^ - I/3.
            t = jnp.zeros((batch_size, n, d, d, channels), jnp.float32)
            y2 = unit[..., :, None] * unit[..., None, :] - (
                jnp.eye(d, dtype=unit.dtype) / d
            )
        else:
            t, y2 = None, None

        for block in range(cfg.number_of_interactions):
            s, v, t = self._interaction(
                s, v, t, rbf, unit, y2, edge_mask, f"interaction_{block}", dtype
            )
            s, v, t = self._update(s, v, t, f"update_{block}", dtype)

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

    def _interaction(self, s, v, t, rbf, unit, y2, edge_mask, name, dtype):
        """Message block over the dense pair tensor.

        Rank-1 paths (always): s <- s, v <- v_j, v <- r^.
        Rank-2 paths (max_ell=2): t <- t_j, t <- Y2(r^), v <- t_j . r^,
        s <- r^T t_j r^ — the l2->l1 and l2->l0 product channels.
        All gates are invariant functions of source scalars and distances.
        """
        cfg = self.config
        channels = cfg.num_features
        n_gates = 3 if cfg.max_ell == 1 else 7

        # Pair (source) axis J = N * K with K periodic images per source
        # atom; source tensors repeat K times along it (see __call__).
        n_atoms = s.shape[1]
        k_images = rbf.shape[2] // n_atoms

        def per_source(a):
            return jnp.repeat(a, k_images, axis=1) if k_images > 1 else a

        h = nn.Dense(channels, dtype=dtype, name=f"{name}_phi0")(s.astype(dtype))
        h = nn.silu(h)
        h = nn.Dense(n_gates * channels, dtype=dtype, name=f"{name}_phi1")(h)
        filters = nn.Dense(
            n_gates * channels, dtype=dtype, name=f"{name}_filter"
        )(rbf.astype(dtype))

        # Per-pair gated source features: [B, N(target), J(source), GC].
        pair = (per_source(h)[:, None, :, :] * filters).astype(jnp.float32)
        pair = pair * edge_mask[..., None]
        gates = jnp.split(pair, n_gates, axis=-1)
        gate_s, gate_vv, gate_vs = gates[:3]

        ds = jnp.sum(gate_s, axis=2)
        # Vector message: neighbor vectors + radial direction, both gated.
        dv = jnp.einsum("bjdc,bijc->bidc", per_source(v), gate_vv) + jnp.einsum(
            "bijd,bijc->bidc", unit, gate_vs
        )
        dt = None
        if cfg.max_ell >= 2:
            gate_tt, gate_ty, gate_vt, gate_st = gates[3:]
            # t <- neighbor tensors and the edge l=2 basis.
            dt = jnp.einsum(
                "bjpqc,bijc->bipqc", per_source(t), gate_tt
            ) + jnp.einsum("bijpq,bijc->bipqc", y2, gate_ty)
            # v <- (t_j . r^): rank-2 x rank-1 -> rank-1.
            tensor_dot_unit = jnp.einsum(
                "bjpqc,bijq->bijpc", per_source(t), unit
            )
            dv = dv + jnp.einsum("bijpc,bijc->bipc", tensor_dot_unit, gate_vt)
            # s <- r^T t_j r^: full contraction -> invariant.
            quadrupole_projection = jnp.einsum(
                "bijpc,bijp->bijc", tensor_dot_unit, unit
            )
            ds = ds + jnp.sum(quadrupole_projection * gate_st, axis=2)

        s = s + ds.astype(s.dtype)
        v = v + dv
        if t is not None:
            t = t + dt
        return s, v, t

    def _update(self, s, v, t, name, dtype):
        """Node-local mixing across ranks (exact equivariance).

        Invariant gates computed from s, |V v| and |Q t|_F weight the
        equivariant products: v (x) v -> s, t . v -> v (max_ell=2),
        sym-traceless(u (x) v) -> t, tr(t t) -> s.
        """
        cfg = self.config
        channels = cfg.num_features

        u_v = nn.Dense(channels, use_bias=False, dtype=dtype, name=f"{name}_U")(
            v.astype(dtype)
        ).astype(jnp.float32)
        v_v = nn.Dense(channels, use_bias=False, dtype=dtype, name=f"{name}_V")(
            v.astype(dtype)
        ).astype(jnp.float32)

        v_norm = jnp.sqrt(jnp.sum(v_v**2, axis=2) + 1e-8)  # [B, N, C]
        invariants = [s.astype(dtype), v_norm.astype(dtype)]

        if cfg.max_ell >= 2:
            t_p = nn.Dense(
                channels, use_bias=False, dtype=dtype, name=f"{name}_P"
            )(t.astype(dtype)).astype(jnp.float32)
            t_q = nn.Dense(
                channels, use_bias=False, dtype=dtype, name=f"{name}_Q"
            )(t.astype(dtype)).astype(jnp.float32)
            t_norm = jnp.sqrt(jnp.sum(t_q**2, axis=(2, 3)) + 1e-8)
            invariants.append(t_norm.astype(dtype))
            n_gates = 7
        else:
            n_gates = 3

        a = nn.Dense(channels, dtype=dtype, name=f"{name}_a0")(
            jnp.concatenate(invariants, axis=-1)
        )
        a = nn.silu(a)
        a = nn.Dense(n_gates * channels, dtype=dtype, name=f"{name}_a1")(a).astype(
            jnp.float32
        )
        gates = jnp.split(a, n_gates, axis=-1)
        a_ss, a_sv, a_vv = gates[:3]

        scalar_update = a_ss + a_sv * jnp.sum(u_v * v_v, axis=2)
        vector_update = a_vv[:, :, None, :] * u_v
        tensor_update = None
        if cfg.max_ell >= 2:
            a_st, a_vt, a_tt, a_to = gates[3:]
            # s <- tr(t_p t_q) (both symmetric: elementwise Frobenius product).
            scalar_update = scalar_update + a_st * jnp.einsum(
                "bnpqc,bnqpc->bnc", t_p, t_q
            )
            # v <- t_p . v_v (rank-2 x rank-1 -> rank-1).
            vector_update = vector_update + a_vt[:, :, None, :] * jnp.einsum(
                "bnpqc,bnqc->bnpc", t_p, v_v
            )
            # t <- sym-traceless(u_v (x) v_v) and a channel remix of t_p.
            outer = 0.5 * (
                u_v[:, :, :, None, :] * v_v[:, :, None, :, :]
                + v_v[:, :, :, None, :] * u_v[:, :, None, :, :]
            )
            trace = jnp.einsum("bnppc->bnc", outer)
            d = v.shape[2]
            outer = outer - (trace / d)[:, :, None, None, :] * jnp.eye(
                d, dtype=outer.dtype
            )[None, None, :, :, None]
            tensor_update = (
                a_tt[:, :, None, None, :] * outer
                + a_to[:, :, None, None, :] * t_p
            )

        s = s + scalar_update.astype(s.dtype)
        v = v + vector_update
        if t is not None:
            t = t + tensor_update
        return s, v, t
