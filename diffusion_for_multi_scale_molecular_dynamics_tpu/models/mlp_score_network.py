"""MLP score network (fixed atom count).

Simple baseline: each coordinate is embedded on the unit circle
(cos, sin)(2 pi x) to respect periodicity, concatenated with sigma / time /
atom-type / lattice embeddings, pushed through a SiLU trunk with optional
additive force-conditioning layers, and read out by three heads (A, X, L).
Optional exact permutation averaging over all n! permutations and an optional
time-only multiplicative prefactor on the X head.

Capability parity with the reference MLP
(src/diffusion_for_multi_scale_molecular_dynamics/models/score_networks/mlp_score_network.py:18-370),
re-built in flax.linen. The permutation average unrolls into one fused XLA
computation with shared parameters (the reference loops permutations in
Python on the host).
"""

from dataclasses import dataclass
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..namespace import AXL, CARTESIAN_FORCES, NOISE, NOISY_AXL_COMPOSITION, TIME
from ..ops.symmetry import get_all_permutation_indices
from .score_network import ScoreNetworkConfig, impose_non_mask_atomic_type_prediction


@dataclass(frozen=True, kw_only=True)
class MLPScoreNetworkConfig(ScoreNetworkConfig):
    """Hyperparameters of the MLP score network."""

    architecture: str = "mlp"
    number_of_atoms: int
    n_hidden_dimensions: int
    hidden_dimensions_size: int
    noise_embedding_dimensions_size: int
    relative_coordinates_embedding_dimensions_size: int
    time_embedding_dimensions_size: int
    atom_type_embedding_dimensions_size: int
    lattice_parameters_embedding_dimensions_size: int
    condition_embedding_size: int = 64
    use_time_dependent_prefactor: bool = False
    use_permutation_invariance: bool = False


class _MLPCore(nn.Module):
    """One un-symmetrized forward; called repeatedly with shared parameters."""

    config: MLPScoreNetworkConfig

    @nn.compact
    def __call__(self, batch: Dict[str, Any], conditional: bool) -> AXL:
        cfg = self.config
        composition = batch[NOISY_AXL_COMPOSITION]
        x = composition.X
        batch_size, natoms, d = x.shape

        angles = 2.0 * jnp.pi * x
        circle = jnp.concatenate(
            [jnp.cos(angles), jnp.sin(angles)], axis=-1
        ).reshape(batch_size, -1)
        coord_emb = nn.Dense(
            cfg.relative_coordinates_embedding_dimensions_size,
            name="relative_coordinates_embedding",
        )(circle)

        noise_emb = nn.Dense(
            cfg.noise_embedding_dimensions_size, name="noise_embedding"
        )(batch[NOISE])
        time_emb = nn.Dense(
            cfg.time_embedding_dimensions_size, name="time_embedding"
        )(batch[TIME])

        onehot = jax.nn.one_hot(composition.A, cfg.num_classes, dtype=x.dtype)
        atom_emb = nn.Dense(
            cfg.atom_type_embedding_dimensions_size, name="atom_type_embedding"
        )(onehot).reshape(batch_size, -1)

        lattice_emb = nn.Dense(
            cfg.lattice_parameters_embedding_dimensions_size,
            name="lattice_parameters_embedding",
        )(composition.L)

        h = jnp.concatenate(
            [coord_emb, noise_emb, time_emb, atom_emb, lattice_emb], axis=-1
        )

        # Condition parameters must exist regardless of the static
        # `conditional` flag so init/apply signatures agree; the contribution
        # is gated by a constant XLA folds away when unconditional.
        use_condition_path = cfg.conditional_prob > 0
        if use_condition_path:
            forces = batch[CARTESIAN_FORCES].reshape(batch_size, -1)
            force_emb = nn.Dense(
                cfg.condition_embedding_size, name="condition_embedding"
            )(forces)
            gate = 1.0 if conditional else 0.0

        for i in range(cfg.n_hidden_dimensions):
            if i != 0:
                h = nn.silu(h)
            h = nn.Dense(cfg.hidden_dimensions_size, name=f"trunk_{i}")(h)
            if use_condition_path:
                h = h + gate * nn.Dense(
                    cfg.hidden_dimensions_size, name=f"condition_{i}"
                )(force_emb)

        x_out = nn.Dense(natoms * d, name="output_X")(h).reshape(x.shape)
        if cfg.use_time_dependent_prefactor:
            p = jnp.concatenate([noise_emb, time_emb], axis=-1)
            for i in range(cfg.n_hidden_dimensions + 1):
                if i != 0:
                    p = nn.silu(p)
                width = (
                    1 if i == cfg.n_hidden_dimensions else cfg.hidden_dimensions_size
                )
                p = nn.Dense(width, name=f"prefactor_{i}")(p)
            x_out = p[:, :, None] * x_out

        a_out = nn.Dense(natoms * cfg.num_classes, name="output_A")(h).reshape(
            batch_size, natoms, cfg.num_classes
        )
        l_out = nn.Dense(cfg.num_lattice_parameters, name="output_L")(h)

        return AXL(A=a_out, X=x_out, L=l_out)


class MLPScoreNetwork(nn.Module):
    """Flat MLP over the whole configuration (optionally perm-symmetrized)."""

    config: MLPScoreNetworkConfig

    @nn.compact
    def __call__(self, batch: Dict[str, Any], conditional: bool = False) -> AXL:
        cfg = self.config
        core = _MLPCore(cfg, name="core")

        if not cfg.use_permutation_invariance:
            return impose_non_mask_atomic_type_prediction(core(batch, conditional))

        # Exact symmetrization: s_sym(x) = 1/|G| sum_g g^{-1} . s(g . x).
        # Atom logits are per-node scalars so they are inverse-permuted too.
        perms, inv_perms = get_all_permutation_indices(cfg.number_of_atoms)
        composition = batch[NOISY_AXL_COMPOSITION]
        outputs = []
        for perm, inv_perm in zip(perms, inv_perms):
            permuted = dict(batch)
            permuted[NOISY_AXL_COMPOSITION] = composition._replace(
                A=composition.A[:, perm], X=composition.X[:, perm]
            )
            out = core(permuted, conditional)
            outputs.append(
                AXL(A=out.A[:, inv_perm], X=out.X[:, inv_perm], L=out.L)
            )
        mean = AXL(
            A=jnp.mean(jnp.stack([o.A for o in outputs]), axis=0),
            X=jnp.mean(jnp.stack([o.X for o in outputs]), axis=0),
            L=jnp.mean(jnp.stack([o.L for o in outputs]), axis=0),
        )
        return impose_non_mask_atomic_type_prediction(mean)
