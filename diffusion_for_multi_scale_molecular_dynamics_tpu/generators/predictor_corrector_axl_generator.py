"""Predictor-corrector sampling hyperparameters.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/generators/predictor_corrector_axl_generator.py:21-204;
the reference's python-loop skeleton becomes a lax.scan in langevin_generator.py)
"""

from dataclasses import dataclass

from .axl_generator import SamplingParameters


@dataclass(kw_only=True)
class PredictorCorrectorSamplingParameters(SamplingParameters):
    """Hyperparameters for predictor-corrector AXL generators."""

    algorithm: str = "predictor_corrector"
    number_of_corrector_steps: int = 1
    small_epsilon: float = 1e-8
    one_atom_type_transition_per_step: bool = True
    atom_type_greedy_sampling: bool = True
    atom_type_transition_in_corrector: bool = False
    # RePaint resampling (Lugmayr et al. 2022, Alg. 2): after each predictor
    # step, jump back (renoise one step up) and re-predict this many extra
    # times. Harmonizes inpainted regions with constraints — the constrained
    # generator's repaint overwrite runs after every re-prediction. The
    # reference's ConstrainedLangevinGenerator has no resampling (its
    # predictor_step:94 overwrites once per level); 0 reproduces it exactly.
    # Cost: predictor network calls x (1 + repaint_resample_steps).
    repaint_resample_steps: int = 0
    # Coherent RePaint renoising (beyond-reference): overwrite constrained
    # slots with x0 + sigma_i * z using ONE frozen z per (sample, atom) for
    # the whole trajectory (and a frozen uniform per atom for the monotone
    # D3PM masking time) instead of fresh noise at every level. The fresh
    # draw is the image-RePaint convention, but for a translation-invariant
    # atomistic model it makes the constrained environment jitter
    # incoherently by ~sigma_i * box each step — the r4f ladder shows free
    # slots walked off even a pure-healing start. A frozen z is a valid
    # forward trajectory at every marginal, and the environment then
    # converges smoothly onto the constraint (round-4 results, "Repaint").
    # Default ON (beyond-reference): at production scale the frozen draw cuts
    # healed-region run-to-run E/atom std 25x (0.0403 -> 0.0016,
    # experiments/repaint_si_2x2x2_{tpu,coherent}_r4g.json) at identical
    # median; False restores the fresh-per-level image-RePaint convention.
    repaint_coherent_renoising: bool = True
    # Scale on the corrector noise: the corrector samples p(x)^(1/T) with
    # T = corrector_temperature^2 relative to the learned score. 1.0 is the
    # reference's (implicit) value; repeated correctors tend to quench the
    # sampled ensemble below the thermal width (round-1/2 Si studies), and a
    # slightly hotter corrector (e.g. 1.01-1.1) reheats it. Beyond-reference
    # knob; leave at 1.0 for strict parity.
    corrector_temperature: float = 1.0
    # Sigma-windowed noise temperature (beyond-reference): multiply the
    # predictor AND corrector noise by noise_temperature only at steps with
    # sigma_i <= temperature_sigma_max. The sampled ensemble freezes out at
    # sigma comparable to the thermal displacement width, so reheating only
    # that window warms the final ensemble (p -> p^(1/tau^2)) without
    # seeding hot outliers at large sigma. Defaults are inert.
    noise_temperature: float = 1.0
    temperature_sigma_max: float = float("inf")
    # Adaptive-corrector guard (beyond-reference): the adaptive step size
    # eps = 2 (r |z| / |s|)^2 diverges when the learned score norm |s| is
    # tiny (large sigma, near-uniform phase) — the documented failure mode of
    # the reference-default r on the production system (+3.5 eV/atom,
    # experiments/roofline.md). The guard caps the score-derived length
    # |z|/|s| at adaptive_corrector_max_length_over_sigma * sqrt(sigma^2 +
    # adaptive_corrector_mode_std^2): with mode_std set to the data's thermal
    # displacement scale (sampling/reheat_calibration.measured_mode_std) the
    # cap sits a factor above the exact-score value sqrt(s^2 + sigma^2) and
    # only fires on pathological predictions. The guard engages only when
    # BOTH knobs are positive — mode_std = 0 (default) or cap <= 0 keeps
    # strict reference behavior, so defaults are inert.
    adaptive_corrector_max_length_over_sigma: float = 4.0
    adaptive_corrector_mode_std: float = 0.0
    # Length cap for one compiled scan call. The reverse trajectory chains
    # compiled chunks of at most this many time *steps* (each step = 1
    # predictor + number_of_corrector_steps corrector network applications,
    # unrolled inside the scan body); chunk boundaries carry the composition
    # on device and do not change the math. 0 (default) = auto: bound the
    # per-program network-application count at the hardware-validated budget
    # (see LangevinGenerator._resolve_max_steps_per_call) — high corrector
    # counts get shorter chunks, keeping each device call under the remote
    # TPU's ~60 s execution watchdog (the round-5-bisected root cause of the
    # reproducible c8/n=216 `UNAVAILABLE` fault,
    # experiments/repro_c8_fault.py + c8_bisection_r5.json).
    max_steps_per_call: int = 0
