r"""Annealed-Langevin predictor-corrector generator as a single lax.scan.

Song & Ermon's annealed Langevin dynamics, with D3PM ancestral updates for
atom types: for i = N-1 .. 0, one predictor step (at time index i+1) followed
by M corrector steps (at index i).

TPU-first redesign of the reference generator
(src/diffusion_for_multi_scale_molecular_dynamics/generators/{predictor_corrector_axl_generator,
langevin_generator}.py): the reference drives 3000 sequential network forwards
from a Python loop with per-step host work; here the *entire trajectory* is
one ``lax.scan`` whose body does predictor + correctors, so sampling is a
single compiled program resident on device. Per-step quantities are gathers
from the precomputed noise tables; the i = 0 corrector special case
(sigma -> sigma_min, t -> 0; reference langevin_generator.py:719-726) is a
pre-shifted table instead of a branch. Trajectory recording uses the scan's
stacked outputs, gated by a static flag so the production path carries
nothing.

Updates:
  * X: x <- wrap(x + w_s * (sigma*score)/sigma + w_n * z), with
    (w_s, w_n) = (g^2_i, g_i) in the predictor and (eps_i, sqrt(2 eps_i)) in
    the corrector;
  * L: same, unwrapped, with sigma scaled by n^(1/d);
  * A (predictor, optionally corrector): sample from the D3PM posterior
    p(a_{t-1}|a_t) by Gumbel-argmax, with optional greedy unmasking and an
    optional one-transition-per-step restriction (lifted at the final step so
    every atom unmasks).
"""

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..namespace import (
    AXL,
    CARTESIAN_FORCES,
    NOISE,
    NOISY_AXL_COMPOSITION,
    TIME,
)
from ..noise_schedulers import NoiseParameters, build_noise_schedule
from ..ops.d3pm import class_index_to_onehot, get_probability_at_previous_time_step
from ..ops.gaussian_score import scale_sigma_by_number_of_atoms
from ..ops.geometry import map_relative_coordinates_to_unit_cell
from ..utils.sample_trajectory import SampleTrajectory
from .axl_generator import AXLGenerator
from .predictor_corrector_axl_generator import PredictorCorrectorSamplingParameters
from .trajectory_initializer import (
    FullRandomTrajectoryInitializer,
    TrajectoryInitializer,
    TrajectoryInitializerParameters,
)


class _StepRecord(NamedTuple):
    """Per-step trajectory record (scan stacked output)."""

    time_step_index: jnp.ndarray
    composition_i: AXL
    composition_im1: AXL
    model_predictions_i: AXL


class LangevinGenerator(AXLGenerator):
    """Annealed Langevin predictor-corrector AXL generator."""

    def __init__(
        self,
        noise_parameters: NoiseParameters,
        sampling_parameters: PredictorCorrectorSamplingParameters,
        axl_network: Callable,
        trajectory_initializer: Optional[TrajectoryInitializer] = None,
    ):
        """Args:
        noise_parameters: the noise schedule hyperparameters.
        sampling_parameters: PC sampling hyperparameters.
        axl_network: bound score network: batch dict -> AXL model outputs
            (e.g. functools.partial(net.apply, params)).
        trajectory_initializer: start-state provider (full random default).
        """
        self.noise_parameters = noise_parameters
        self.sampling_parameters = sampling_parameters
        self.axl_network = axl_network
        self.num_classes = sampling_parameters.num_classes
        self.masked_atom_type_index = self.num_classes - 1
        self.small_epsilon = sampling_parameters.small_epsilon
        self.number_of_atoms = sampling_parameters.number_of_atoms
        self.spatial_dimension = sampling_parameters.spatial_dimension
        # (sigma_n / sigma) = n^(-1/d): the lattice-vs-coordinate noise-scale
        # ratio used when lattice_consistent_step_scaling is on (see
        # SamplingParameters for why the reference's unscaled updates are
        # linearly unstable).
        if sampling_parameters.lattice_consistent_step_scaling:
            self._lattice_step_scale = float(
                self.number_of_atoms ** (-1.0 / self.spatial_dimension)
            )
        else:
            self._lattice_step_scale = 1.0

        self.schedule = build_noise_schedule(noise_parameters, self.num_classes)
        noise = self.schedule.noise
        # Corrector-side tables, pre-shifted so index i reads sigma_{i} with
        # the i=0 extrapolation to (sigma_min, t=0) baked in.
        self._corrector_sigma = jnp.concatenate(
            [jnp.array([noise_parameters.sigma_min]), noise.sigma[:-1]]
        )
        self._corrector_time = jnp.concatenate([jnp.array([0.0]), noise.time[:-1]])
        # Q-table index for the corrector's atom-type update: max(i - 1, 0).
        self._corrector_q_index = jnp.maximum(
            jnp.arange(self.schedule.total_time_steps) - 1, 0
        )

        if trajectory_initializer is None:
            trajectory_initializer = FullRandomTrajectoryInitializer(
                TrajectoryInitializerParameters(
                    spatial_dimension=sampling_parameters.spatial_dimension,
                    num_atom_types=sampling_parameters.num_atom_types,
                    number_of_atoms=sampling_parameters.number_of_atoms,
                    use_fixed_lattice_parameters=(
                        sampling_parameters.use_fixed_lattice_parameters
                    ),
                    fixed_lattice_parameters=(
                        sampling_parameters.fixed_lattice_parameters
                    ),
                    lattice_parameters_prior_mean=(
                        sampling_parameters.lattice_parameters_prior_mean
                    ),
                    lattice_parameters_prior_std=(
                        sampling_parameters.lattice_parameters_prior_std
                    ),
                )
            )
        self.trajectory_initializer = trajectory_initializer

        # One compiled scan covers up to this many time steps; longer
        # trajectories chain several calls of the same compiled chunk
        # (compile once, run many) carrying the composition on device. This
        # bounds single-call execution time (remote-TPU RPC limits) without
        # touching the math.
        self.max_steps_per_call = self._resolve_max_steps_per_call(
            sampling_parameters
        )

        self.record = sampling_parameters.record_samples
        self.sample_trajectory_recorder = SampleTrajectory()
        if self.record:
            self.sample_trajectory_recorder.record("noise", self.schedule.noise)
            self.sample_trajectory_recorder.record(
                "noise_parameters", dataclasses.asdict(noise_parameters)
            )
            self.sample_trajectory_recorder.record(
                "sampling_parameters", dataclasses.asdict(sampling_parameters)
            )

        # Network parameters must enter the compiled program as *arguments*,
        # never as closure constants: a partial-bound network bakes every
        # weight into the HLO as literals (38 MB of text for the production
        # EGNN), and client-side lowering/serialization of that program took
        # 5-20 minutes per variant on this host — the round-2 "slow remote
        # compile" in full. With parameters as arguments the chunk lowers in
        # ~1 s and compiles remotely in ~30 s.
        self._apply_fn = None
        self._network_params = None
        if (
            isinstance(axl_network, functools.partial)
            and len(axl_network.args) == 1
            and not axl_network.keywords
        ):
            self._apply_fn = axl_network.func
            self._network_params = axl_network.args[0]

        self._compiled_scan_chunk = jax.jit(self._scan_chunk, static_argnums=(3,))
        self._compiled_scan_chunk_with_params = jax.jit(
            self._scan_chunk_with_params, static_argnums=(4,)
        )

    @staticmethod
    def _resolve_max_steps_per_call(sampling_parameters) -> int:
        """Scan-chunk length: explicit value, or auto from the corrector count.

        Auto bounds the network applications per compiled program at the
        hardware-validated budget of 1750 (= 250 steps x (1 predictor + 6
        correctors)). Root cause, established by the round-5 bisection
        (experiments/repro_c8_fault.py + c8_bisection_r5.json): the remote
        TPU kills any single device call running longer than ~60 s
        (`UNAVAILABLE`) — the same 2250-application program faults at batch
        16 (~64 s/call) but runs clean at batch 8 (34.6 s/call), so the
        limit is per-call *execution time*, not program size. The
        application bound is a proxy that keeps per-call time inside the
        proven <=50 s envelope at the production shapes (batch <= 16,
        n = 216); larger batches are separately capped by the eval scripts'
        VMEM guard. Shortening the chunk keeps the same math — chunk
        boundaries only split the compiled scan, carrying the composition
        (and PRNG chain) on device, bit-exactly
        (tests/test_langevin_generator.py::test_chunked_sampling_matches_single_chunk).
        """
        explicit = getattr(sampling_parameters, "max_steps_per_call", 0)
        if explicit and explicit > 0:
            return int(explicit)
        applications_per_step = 1 + max(
            0, getattr(sampling_parameters, "number_of_corrector_steps", 0)
        ) + max(0, getattr(sampling_parameters, "repaint_resample_steps", 0))
        return max(25, min(250, 1750 // applications_per_step))

    def _prepare_scan_key(self, key):
        """Hook: wrap the scan key before the chunk chain (identity here)."""
        return key

    # ------------------------------------------------------------- primitives

    def initialize(self, key, number_of_samples: int) -> AXL:
        return self.trajectory_initializer.initialize(key, number_of_samples)

    def _get_model_predictions(self, composition: AXL, time, sigma) -> AXL:
        """One network forward at scalar (time, sigma)."""
        number_of_samples = composition.X.shape[0]
        ones = jnp.ones((number_of_samples, 1), composition.X.dtype)
        batch = {
            NOISY_AXL_COMPOSITION: composition,
            TIME: time * ones,
            NOISE: sigma * ones,
            CARTESIAN_FORCES: jnp.zeros_like(composition.X),
        }
        return self.axl_network(batch)

    def _relative_coordinates_update(
        self, x, sigma_normalized_scores, sigma_i, score_weight, noise_weight, z
    ):
        updated = x + score_weight * sigma_normalized_scores / sigma_i + noise_weight * z
        return map_relative_coordinates_to_unit_cell(updated)

    def _lattice_parameters_update(
        self, lattice, sigma_normalized_scores, sigma_n_i, score_weight, noise_weight, z
    ):
        if self.sampling_parameters.use_fixed_lattice_parameters:
            return lattice
        return lattice + score_weight * sigma_normalized_scores / sigma_n_i + noise_weight * z

    def _atom_types_update(
        self,
        key,
        predicted_logits,
        atom_types_i,
        q_matrices_i,
        q_bar_matrices_i,
        q_bar_tm1_matrices_i,
        one_atom_type_transition_per_step,
    ):
        """Sample a_{i-1} from the D3PM posterior (Gumbel-argmax).

        ``one_atom_type_transition_per_step`` is a traced boolean so the last
        scan step can lift the restriction without a separate program.
        """
        key_gumbel, key_binary = jax.random.split(key)
        number_of_samples, natoms = atom_types_i.shape

        one_hot_at = class_index_to_onehot(atom_types_i, self.num_classes)
        probs = get_probability_at_previous_time_step(
            probability_at_zeroth_timestep=predicted_logits,
            one_hot_probability_at_current_timestep=one_hot_at,
            q_matrices=q_matrices_i,
            q_bar_matrices=q_bar_matrices_i,
            q_bar_tm1_matrices=q_bar_tm1_matrices_i,
            small_epsilon=self.small_epsilon,
            probability_at_zeroth_timestep_are_logits=True,
        )  # [samples, natoms, classes]

        gumbel = jax.random.gumbel(
            key_gumbel, (number_of_samples, natoms, self.num_classes), probs.dtype
        )

        if self.sampling_parameters.atom_type_greedy_sampling:
            probs, gumbel = self._adjust_for_greedy_sampling(
                key_binary, probs, atom_types_i, gumbel
            )

        values = jnp.log(probs + self.small_epsilon) + gumbel
        max_gumbel_values = jnp.max(values, axis=-1)
        sampled_atom_types = jnp.argmax(values, axis=-1)

        restricted = self._restrict_to_one_transition(
            atom_types_i, max_gumbel_values, sampled_atom_types
        )
        return jnp.where(
            one_atom_type_transition_per_step, restricted, sampled_atom_types
        )

    def _restrict_to_one_transition(
        self, current_atom_types, max_gumbel_values, sampled_atom_types
    ):
        """Keep only the most likely proposed transition per sample."""
        changed = sampled_atom_types != current_atom_types
        candidate_values = jnp.where(changed, max_gumbel_values, -jnp.inf)
        best_atom = jnp.argmax(candidate_values, axis=-1)  # [samples]
        natoms = current_atom_types.shape[-1]
        is_best = jax.nn.one_hot(best_atom, natoms, dtype=bool)
        return jnp.where(is_best, sampled_atom_types, current_atom_types)

    def _adjust_for_greedy_sampling(
        self, key, one_step_transition_probs, atom_types_i, gumbel
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Greedy unmasking: once any atom is real, decide mask-vs-unmask with
        a Bernoulli draw and pick the unmasked type deterministically.

        (reference: langevin_generator.py:382-439)
        """
        all_masked = jnp.all(
            atom_types_i == self.masked_atom_type_index, axis=-1
        )  # [samples]
        atom_is_masked = atom_types_i == self.masked_atom_type_index

        binary_sample = jax.random.uniform(key, atom_types_i.shape)
        unmask_this_atom = binary_sample > one_step_transition_probs[..., -1]
        do_greedy = (~all_masked[:, None]) & unmask_this_atom & atom_is_masked

        mask_probs = jnp.where(do_greedy, 0.0, one_step_transition_probs[..., -1])
        one_step_transition_probs = one_step_transition_probs.at[..., -1].set(
            mask_probs
        )
        # Zero Gumbel noise = deterministic argmax for samples already seeded
        # with a real atom type.
        gumbel = jnp.where(all_masked[:, None, None], gumbel, 0.0)
        return one_step_transition_probs, gumbel

    # ------------------------------------------------------------------ steps

    def _sigma_n(self, sigma):
        return scale_sigma_by_number_of_atoms(
            sigma, self.number_of_atoms, self.spatial_dimension
        )

    def _windowed_temperature(self, sigma_i):
        """noise_temperature inside the sigma <= temperature_sigma_max window."""
        params = self.sampling_parameters
        if params.noise_temperature == 1.0:
            return 1.0
        return jnp.where(
            sigma_i <= params.temperature_sigma_max,
            params.noise_temperature,
            1.0,
        )

    def _coordinates_corrector_step_size(self, idx, sigma_i, scores, z):
        """eps_i from the tabulated Langevin dynamics (index 0..N-1)."""
        return self.schedule.langevin.epsilon[idx]

    def _lattice_corrector_step_size(self, idx, sigma_n_i, scores, z):
        # The table is in coordinate units (eps ~ sigma^2); rescale to the
        # lattice noise scale sigma_n^2 when consistent scaling is on.
        return self.schedule.langevin.epsilon[idx] * self._lattice_step_scale**2

    def _substep_xl_weights(
        self, is_predictor, idx, sigma_i, sigma_n_i, predictions, z_x, z_l, tau
    ):
        """(score_weight, noise_weight) pairs for the X and L updates.

        Predictor: (g^2_i, tau * g_i); corrector: (eps_i, T tau sqrt(2 eps_i)).
        ``is_predictor`` may be traced (shared scan program) or a Python bool
        (the standalone step methods); subclasses override to reshape the
        predictor/corrector split (e.g. the adaptive corrector zeroes the
        predictor's X/L motion).
        """
        noise = self.schedule.noise
        g_i = noise.g[idx]
        g2_i = noise.g_squared[idx]
        corrector_temperature = self.sampling_parameters.corrector_temperature * tau
        eps_x = self._coordinates_corrector_step_size(idx, sigma_i, predictions.X, z_x)
        eps_l = self._lattice_corrector_step_size(idx, sigma_n_i, predictions.L, z_l)
        w_score_x = jnp.where(is_predictor, g2_i, eps_x)
        w_noise_x = jnp.where(
            is_predictor, tau * g_i, corrector_temperature * jnp.sqrt(2.0 * eps_x)
        )
        # Predictor L weights scale to the lattice process (g_n^2, g_n) under
        # lattice_consistent_step_scaling; the corrector branch inherits its
        # scaling from eps_l (tabulated: rescaled in
        # _lattice_corrector_step_size; adaptive: already score-derived).
        c_l = self._lattice_step_scale
        w_score_l = jnp.where(is_predictor, g2_i * c_l**2, eps_l)
        w_noise_l = jnp.where(
            is_predictor,
            tau * g_i * c_l,
            corrector_temperature * jnp.sqrt(2.0 * eps_l),
        )
        return w_score_x, w_noise_x, w_score_l, w_noise_l

    def _post_predictor_update(self, key, composition: AXL, idx) -> AXL:
        """Hook applied after each predictor substep (identity by default).

        Subclasses (e.g. RePaint constraints) override; the shared substep
        program applies it under a ``jnp.where(is_predictor, ...)`` select so
        predictor and corrector stay one compiled program.
        """
        return composition

    def _renoise_one_step(self, key, composition: AXL, idx) -> AXL:
        """Forward-noise one level up, t_idx -> t_{idx+1} (RePaint jump).

        X gains sqrt(sigma_{i}^2 - sigma_{i-1}^2) = sqrt(g^2_idx) of fresh
        noise (the exact one-step forward kernel of the VE process); A takes
        one step of the D3PM forward chain (q_matrix[idx]); L mirrors X with
        the per-atom-count sigma scaling unless the lattice is fixed.
        """
        from ..noisers import (
            get_noisy_atom_types_sample,
            get_noisy_relative_coordinates_sample,
        )

        noise = self.schedule.noise
        key_x, key_a, key_l = jax.random.split(key, 3)
        dsigma = jnp.sqrt(noise.g_squared[idx])
        x = get_noisy_relative_coordinates_sample(
            key_x, composition.X, jnp.full_like(composition.X, dsigma)
        )
        a_onehot = class_index_to_onehot(composition.A, self.num_classes)
        a = get_noisy_atom_types_sample(key_a, a_onehot, noise.q_matrix[idx])
        if self.sampling_parameters.use_fixed_lattice_parameters:
            lattice = composition.L
        else:
            z_l = jax.random.normal(
                key_l, composition.L.shape, composition.L.dtype
            )
            lattice = composition.L + self._sigma_n(dsigma) * z_l
        return AXL(A=a, X=x, L=lattice)

    def _substep(
        self, key, composition: AXL, idx, is_predictor, do_renoise=False
    ) -> Tuple[AXL, AXL]:
        """One predictor-or-corrector update as a single shared program.

        The predictor/corrector distinction is a *value* (``is_predictor``),
        not a program: per-substep scalars (sigma, t, update weights, Q-table
        rows) are gathered/selected by the flag, so the network — by far the
        dominant cost — appears exactly once in the compiled HLO. The scan
        body then iterates this substep (1 + n_correctors) times, cutting
        compile time ~(1 + n_correctors)x vs inlining separate predictor and
        corrector programs (reference runs them as distinct module calls:
        predictor_corrector_axl_generator.py:112-147).
        """
        noise = self.schedule.noise
        if not (isinstance(do_renoise, bool) and do_renoise is False):
            # RePaint resampling: jump back one level (fresh forward noise),
            # then run this (predictor) substep again. Selected by value so
            # the substep stays one shared compiled program.
            key, key_renoise = jax.random.split(key)
            renoised = self._renoise_one_step(key_renoise, composition, idx)
            composition = jax.tree_util.tree_map(
                lambda r, c: jnp.where(do_renoise, r, c), renoised, composition
            )
        sigma_i = jnp.where(is_predictor, noise.sigma[idx], self._corrector_sigma[idx])
        t_i = jnp.where(is_predictor, noise.time[idx], self._corrector_time[idx])
        sigma_n_i = self._sigma_n(sigma_i)

        predictions = self._get_model_predictions(composition, t_i, sigma_i)

        key_a, key_x, key_l = jax.random.split(key, 3)
        tau = self._windowed_temperature(sigma_i)

        # Atom types: D3PM posterior sample. The predictor always applies it;
        # the corrector only when atom_type_transition_in_corrector (static).
        # The one-transition restriction must not apply at the predictor's
        # final step: every remaining MASK has to resolve
        # (reference: langevin_generator.py:597-604).
        q_idx = jnp.where(is_predictor, idx, self._corrector_q_index[idx])
        one_transition = jnp.logical_and(
            self.sampling_parameters.one_atom_type_transition_per_step,
            jnp.logical_or(jnp.logical_not(is_predictor), idx != 0),
        )
        a_updated = self._atom_types_update(
            key_a,
            predictions.A,
            composition.A,
            noise.q_matrix[q_idx],
            noise.q_bar_matrix[q_idx],
            noise.q_bar_tm1_matrix[q_idx],
            one_atom_type_transition_per_step=one_transition,
        )
        do_atom_update = jnp.logical_or(
            is_predictor, self.sampling_parameters.atom_type_transition_in_corrector
        )
        a_new = jnp.where(do_atom_update, a_updated, composition.A)

        z_x = jax.random.normal(key_x, composition.X.shape, composition.X.dtype)
        z_l = jax.random.normal(key_l, composition.L.shape, composition.L.dtype)
        w_score_x, w_noise_x, w_score_l, w_noise_l = self._substep_xl_weights(
            is_predictor, idx, sigma_i, sigma_n_i, predictions, z_x, z_l, tau
        )
        x_new = self._relative_coordinates_update(
            composition.X, predictions.X, sigma_i, w_score_x, w_noise_x, z_x
        )
        l_new = self._lattice_parameters_update(
            composition.L, predictions.L, sigma_n_i, w_score_l, w_noise_l, z_l
        )

        new_composition = AXL(A=a_new, X=x_new, L=l_new)

        if type(self)._post_predictor_update is not LangevinGenerator._post_predictor_update:
            key_post = jax.random.fold_in(key, 0x5e9)
            post = self._post_predictor_update(key_post, new_composition, idx)
            new_composition = jax.tree_util.tree_map(
                lambda p, c: jnp.where(is_predictor, p, c), post, new_composition
            )

        return new_composition, predictions

    def predictor_step(self, key, composition: AXL, idx) -> Tuple[AXL, AXL]:
        """One predictor step at zero-based table index ``idx`` (time i+1 -> i)."""
        return self._substep(key, composition, idx, is_predictor=True)

    def corrector_step(self, key, composition: AXL, idx) -> Tuple[AXL, AXL]:
        """One corrector step at zero-based index ``idx`` (0 extrapolates to sigma_min)."""
        return self._substep(key, composition, idx, is_predictor=False)

    # ------------------------------------------------------------------- scan

    def _scan_chunk(self, composition: AXL, key, indices, record: bool):
        """Scan the PC update over one chunk of descending time indices.

        Production path (record=False): each time step is an *inner* scan of
        the shared ``_substep`` program over the (1 + n_correctors) substep
        flags, so the network is compiled once per chunk instead of
        (1 + n_correctors) times — the dominant compile-time cost.
        """
        n_corr = self.sampling_parameters.number_of_corrector_steps
        n_resample = getattr(
            self.sampling_parameters, "repaint_resample_steps", 0
        )

        if not record:
            # Flatten (time step, substep) into ONE scan over (idx, flag,
            # renoise) triples: [(i, pred, F), (i, pred, T) x n_resample,
            # (i, corr, F) x n_corr, (i-1, pred, F), ...]. The body is a
            # single shared substep program — the network appears once in
            # the compiled HLO, with no nested-loop structure.
            n_steps = indices.shape[0]
            per_step = 1 + n_resample + n_corr
            flat_indices = jnp.repeat(indices, per_step)
            flags = jnp.tile(
                jnp.concatenate(
                    [jnp.ones((1 + n_resample,), bool), jnp.zeros((n_corr,), bool)]
                ),
                n_steps,
            )
            renoise_flags = jnp.tile(
                jnp.concatenate(
                    [
                        jnp.zeros((1,), bool),
                        jnp.ones((n_resample,), bool),
                        jnp.zeros((n_corr,), bool),
                    ]
                ),
                n_steps,
            )

            def body(carry, step):
                # Without resampling the renoise flag is a static False, so
                # the compiled substep is bit-identical to the pre-resample
                # program (no dead renoise computation).
                if n_resample:
                    idx, is_predictor, do_renoise = step
                else:
                    (idx, is_predictor), do_renoise = step, False
                composition, key = carry
                key, key_sub = jax.random.split(key)
                composition, _ = self._substep(
                    key_sub, composition, idx, is_predictor, do_renoise
                )
                return (composition, key), None

            xs = (
                (flat_indices, flags, renoise_flags)
                if n_resample
                else (flat_indices, flags)
            )
            (composition, key), records = jax.lax.scan(
                body, (composition, key), xs
            )
            return composition, key, records

        def body(carry, idx):
            composition, key = carry
            key, key_pred = jax.random.split(key)
            composition_i = composition
            composition, predictions = self.predictor_step(
                key_pred, composition, idx
            )
            for _ in range(n_resample):
                key, key_re = jax.random.split(key)
                composition, _ = self._substep(
                    key_re, composition, idx, is_predictor=True,
                    do_renoise=jnp.asarray(True),
                )
            composition_pred = composition
            for _ in range(n_corr):
                key, key_corr = jax.random.split(key)
                composition, _ = self.corrector_step(key_corr, composition, idx)
            ys = _StepRecord(
                time_step_index=idx + 1,
                composition_i=composition_i,
                composition_im1=composition_pred,
                model_predictions_i=predictions,
            )
            return (composition, key), ys

        (composition, key), records = jax.lax.scan(
            body, (composition, key), indices
        )
        return composition, key, records

    def _scan_chunk_with_params(self, params, composition: AXL, key, indices, record: bool):
        """_scan_chunk with the network parameters as a traced argument.

        The swap happens at trace time (jit retraces per cache entry), so the
        compiled program reads weights from its inputs instead of embedding
        them as constants.
        """
        previous = self.axl_network
        self.axl_network = functools.partial(self._apply_fn, params)
        try:
            return self._scan_chunk(composition, key, indices, record)
        finally:
            self.axl_network = previous

    def sample_from_noisy_composition(
        self,
        key,
        starting_noisy_composition: AXL,
        starting_step_index: int,
        ending_step_index: int = 0,
    ) -> AXL:
        """Run the PC reverse trajectory from one-based index start down to end.

        Fully traceable (one lax.scan over the fixed index window), so it can
        be embedded in larger jitted computations (e.g. the consistency
        regularizer); for standalone use, indices must be static ints.
        (reference: predictor_corrector_axl_generator.py:112-147)
        """
        indices = jnp.arange(starting_step_index - 1, ending_step_index - 1, -1)
        composition, _, _ = self._scan_chunk(
            starting_noisy_composition, key, indices, False
        )
        return composition

    def _chained_scan(self, composition: AXL, key_scan, all_indices):
        """Run the index window as chained compiled scans of at most
        ``max_steps_per_call`` steps, carrying composition + PRNG chain on
        device (bit-exact vs one whole-window scan). Returns the final
        composition and the evolved key."""
        chunk = self.max_steps_per_call
        all_records = []
        for offset in range(0, all_indices.shape[0], chunk):
            indices = all_indices[offset : offset + chunk]
            if self._apply_fn is not None:
                composition, key_scan, records = (
                    self._compiled_scan_chunk_with_params(
                        self._network_params, composition, key_scan, indices,
                        self.record,
                    )
                )
            else:
                composition, key_scan, records = self._compiled_scan_chunk(
                    composition, key_scan, indices, self.record
                )
            if self.record and records is not None:
                all_records.append(records)
        if self.record and all_records:
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *all_records
            )
            self.sample_trajectory_recorder.record("predictor_step", stacked)
        return composition, key_scan

    def sample_window(
        self,
        key,
        composition: AXL,
        starting_step_index: int,
        ending_step_index: int = 0,
    ) -> AXL:
        """Denoise ``composition`` from one-based ``starting_step_index`` down
        to ``ending_step_index``, chunked like :meth:`sample` (so arbitrarily
        long windows stay under the per-call execution budget).

        The two-phase corrector schedule builds on this: run one generator at
        a cheap corrector count to the freeze-out window, then a second
        generator (sharing the network) with a large corrector budget below
        it — each phase a separately-chunked chain over the same schedule.
        """
        key_scan = self._prepare_scan_key(key)
        indices = jnp.arange(starting_step_index - 1, ending_step_index - 1, -1)
        composition, _ = self._chained_scan(composition, key_scan, indices)
        return composition

    def sample(self, key, number_of_samples: int) -> AXL:
        """Generate ``number_of_samples`` compositions.

        The whole reverse trajectory runs on device as chained compiled scans
        of at most ``max_steps_per_call`` steps each.
        """
        key_init, key_scan = jax.random.split(key)
        composition = self.initialize(key_init, number_of_samples)
        # Subclass hook: ConstrainedLangevinGenerator's coherent-renoising
        # mode pairs the scan key with a trajectory-constant frozen key here,
        # so the frozen constraint noise survives chunk boundaries.
        key_scan = self._prepare_scan_key(key_scan)
        start = self.trajectory_initializer.create_start_time_step_index(
            self.schedule.total_time_steps
        )
        end = self.trajectory_initializer.create_end_time_step_index()
        all_indices = jnp.arange(start - 1, end - 1, -1)
        composition, _ = self._chained_scan(composition, key_scan, all_indices)
        return composition
