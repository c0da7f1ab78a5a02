"""RePaint-constrained Langevin generator (excise-and-repaint inpainting).

After every predictor step the known sub-structure is forward-noised to the
current time index and overwritten onto the constrained atom slots, so the
free atoms denoise *around* the fixed environment (RePaint, Lugmayr et al.).

(reference: src/diffusion_for_multi_scale_molecular_dynamics/generators/constrained_langevin_generator.py:24-182)

TPU-first: the repaint (fresh forward noising of the known composition at the
step's time index + masked scatter) happens inside the same lax.scan body as
the predictor/corrector updates — the constrained trajectory remains a single
compiled program. The index-0 "do not noise" special case is a jnp.where.
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..namespace import AXL
from ..noisers import (
    get_noisy_atom_types_sample,
    get_noisy_relative_coordinates_sample,
)
from ..ops.d3pm import class_index_to_onehot
from ..ops.geometry import map_relative_coordinates_to_unit_cell
from .langevin_generator import LangevinGenerator
from .predictor_corrector_axl_generator import PredictorCorrectorSamplingParameters
from .sampling_constraint import SamplingConstraint
from .trajectory_initializer import TrajectoryInitializer


class ConstrainedLangevinGenerator(LangevinGenerator):
    """Langevin PC generator with RePaint constraints."""

    def __init__(
        self,
        noise_parameters,
        sampling_parameters: PredictorCorrectorSamplingParameters,
        axl_network: Callable,
        sampling_constraints: SamplingConstraint,
        trajectory_initializer: Optional[TrajectoryInitializer] = None,
    ):
        super().__init__(
            noise_parameters=noise_parameters,
            sampling_parameters=sampling_parameters,
            axl_network=axl_network,
            trajectory_initializer=trajectory_initializer,
        )
        self.sampling_constraints = sampling_constraints
        self._coherent_renoising = getattr(
            sampling_parameters, "repaint_coherent_renoising", False
        )
        # Trace-time stash of the frozen trajectory noise (see _scan_chunk).
        self._frozen_noise = None

        n_constraints, d = (
            sampling_constraints.constrained_relative_coordinates.shape
        )
        assert len(sampling_constraints.elements) == sampling_parameters.num_atom_types, (
            "Inconsistent number of atom types vs. elements list"
        )
        assert n_constraints <= self.number_of_atoms, (
            "There are more constrained positions than atoms!"
        )
        assert d == self.spatial_dimension, (
            "The constrained coordinates' spatial dimension is inconsistent"
        )

        if sampling_constraints.constrained_indices is None:
            # Constrain the first slots: immaterial for permutation-equivariant
            # models (same convention as the reference).
            indices = np.arange(n_constraints)
        else:
            indices = sampling_constraints.constrained_indices
        self.constraint_indices = jnp.asarray(indices, dtype=jnp.int32)
        self._known_x = jnp.asarray(
            sampling_constraints.constrained_relative_coordinates
        )
        self._known_a = jnp.asarray(
            sampling_constraints.constrained_atom_types, dtype=jnp.int32
        )

    def _apply_constraint(self, composition: AXL) -> AXL:
        """Overwrite the constrained slots with the exact known values."""
        batch = composition.X.shape[0]
        x = composition.X.at[:, self.constraint_indices].set(
            jnp.broadcast_to(
                self._known_x, (batch,) + self._known_x.shape
            )
        )
        a = composition.A.at[:, self.constraint_indices].set(
            jnp.broadcast_to(self._known_a, (batch,) + self._known_a.shape)
        )
        return composition._replace(A=a, X=x)

    def _prepare_scan_key(self, key):
        """Pair the scan key with a trajectory-constant frozen-noise key.

        The pair flows opaquely through the base class's chunk chain (jit
        sees a two-leaf pytree); ``_scan_chunk`` consumes the frozen leaf —
        which it passes through unchanged — so the frozen constraint noise
        is ONE draw for the entire trajectory, across every
        ``max_steps_per_call`` chunk boundary.
        """
        if not self._coherent_renoising:
            return key
        return {"scan": key, "frozen": jax.random.fold_in(key, 0xC0E)}

    def _scan_chunk(self, composition: AXL, key, indices, record: bool):
        """Create the frozen per-trajectory constraint noise for coherent mode.

        The frozen draws must be (a) constant across every time step of the
        whole trajectory and (b) a function of a *traced* key argument so
        repeated calls of the compiled chunk with different keys stay
        independent. They are created here — inside the trace, from the
        chain-constant ``frozen`` leaf of the key pair (``_prepare_scan_key``)
        — and stashed on ``self`` only for the duration of the trace;
        ``_noise_known_composition`` (called from the substep while tracing
        the scan body) picks them up. The stash is cleared afterwards, and is
        never consulted at execution time (the compiled artifact closed over
        the traced values). Single-raw-key callers
        (``sample_from_noisy_composition``) get the pair wrapped here, so a
        standalone window is coherent too.
        """
        if not self._coherent_renoising:
            return super()._scan_chunk(composition, key, indices, record)
        if not isinstance(key, dict):
            key = self._prepare_scan_key(key)
        key_scan, key_frozen = key["scan"], key["frozen"]
        batch_size = composition.X.shape[0]
        key_z, key_u = jax.random.split(key_frozen)
        self._frozen_noise = (
            jax.random.normal(
                key_z,
                (batch_size,) + self._known_x.shape,
                composition.X.dtype,
            ),
            jax.random.uniform(
                key_u,
                (batch_size,) + self._known_a.shape,
                composition.X.dtype,
            ),
        )
        try:
            composition, key_scan, records = super()._scan_chunk(
                composition, key_scan, indices, record
            )
        finally:
            self._frozen_noise = None
        return composition, {"scan": key_scan, "frozen": key_frozen}, records

    def _noise_known_composition(
        self, key, batch_size: int, idx
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward-noise the known constrained atoms to zero-based index idx-1.

        At idx == 0 (the final denoising step) the clean values are returned
        unchanged. With ``repaint_coherent_renoising`` the noise is the
        trajectory's frozen draw (x0 + sigma * z_frozen; atom i masked while
        u_frozen_i < p_mask(idx), a monotone — hence valid — absorbing-chain
        forward trajectory) instead of a fresh sample per level.
        """
        noise_idx = jnp.maximum(idx - 1, 0)
        noise = self.schedule.noise
        sigma = noise.sigma[noise_idx]

        x0 = jnp.broadcast_to(self._known_x, (batch_size,) + self._known_x.shape)
        a0 = jnp.broadcast_to(self._known_a, (batch_size,) + self._known_a.shape)

        if self._frozen_noise is not None:
            z_frozen, u_frozen = self._frozen_noise
            xt = map_relative_coordinates_to_unit_cell(
                x0 + sigma * z_frozen
            )
            # P(an initially-clean atom of type a0 is MASK at this level).
            p_mask = noise.q_bar_matrix[noise_idx][a0, self.masked_atom_type_index]
            at = jnp.where(u_frozen < p_mask, self.masked_atom_type_index, a0)
        else:
            key_x, key_a = jax.random.split(key)
            xt = get_noisy_relative_coordinates_sample(
                key_x, x0, jnp.full_like(x0, sigma)
            )
            a0_onehot = class_index_to_onehot(a0, self.num_classes)
            at = get_noisy_atom_types_sample(
                key_a, a0_onehot, noise.q_bar_matrix[noise_idx]
            )

        is_final = idx == 0
        x_known = jnp.where(is_final, x0, xt)
        a_known = jnp.where(is_final, a0, at)
        return x_known, a_known

    def _post_predictor_update(self, key, composition: AXL, idx) -> AXL:
        """RePaint overwrite after each predictor substep at index idx."""
        batch_size = composition.X.shape[0]
        x_known, a_known = self._noise_known_composition(key, batch_size, idx)
        x = composition.X.at[:, self.constraint_indices].set(x_known)
        a = composition.A.at[:, self.constraint_indices].set(a_known)
        return composition._replace(A=a, X=x)

    def sample(self, key, number_of_samples: int) -> AXL:
        composition = super().sample(key, number_of_samples)
        return self._apply_constraint(composition)
