"""Noise-schedule hyperparameters.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/noise_schedulers/noise_parameters.py:5)
"""

from dataclasses import dataclass

_VALID_SCHEDULE_TYPES = ("exponential", "linear")


@dataclass(frozen=True)
class NoiseParameters:
    """Hyperparameters of the exploding-variance noise process."""

    total_time_steps: int

    schedule_type: str = "exponential"

    # Time grid covers [time_delta, 1]; t = 0 is excluded because sigma(t)
    # is ill-defined there (Song et al., appendix C).
    time_delta: float = 1e-5

    # Defaults follow "Torsional Diffusion for Molecular Conformer
    # Generation" rescaled to the unit torus (original: 0.01*pi .. pi on
    # [0, 2 pi)).
    sigma_min: float = 0.005
    sigma_max: float = 0.5

    # Langevin corrector step scale (Song & Ermon). The reference ships the
    # fixed constant 2e-5 (noise_parameters.py:5 there), calibrated for its
    # sigma_min=0.005; with the production sigma_min=1e-4 that constant is
    # ~500x the overdamped-Langevin stability bound eps_i < 2 sigma_i^2 and
    # every corrector substep scrambles instead of equilibrating (the
    # round-4 repaint-collapse root cause). "auto" (default) derives the
    # value from the schedule at build time: eps = 2.5 * sigma_min^2, i.e.
    # a stability ratio eps_i ~ 1.2 sigma_i^2 — inside the bound, at the
    # mixing-optimal scale, and exactly reproducing the hand-calibrated
    # production value 2.5e-8 at sigma_min=1e-4. Explicit floats are kept
    # for reference-exact runs (the divergent-regime warning still fires).
    corrector_step_epsilon: "float | str" = "auto"

    # Adaptive-corrector step-size ratio r (score_sde celeba default, kept
    # for reference parity). CAUTION: this image-model default is badly
    # mis-scaled for dense crystals — on Si 2x2x2 with the production linear
    # schedule (sigma in [1e-4, 0.2]) it produces +3.5 eV/atom structures
    # (experiments/si_2x2x2_round1_results.md). The step size grows as r^2
    # and the equilibrium score norm scales like 1/sigma_min, so shrink r
    # roughly with sigma_min: r ~ 0.015-0.02 is stable on the Si systems
    # here. Sweep with experiments/eval_checkpoint.py before trusting a
    # new system.
    corrector_r: float = 0.17

    def __post_init__(self):
        assert self.schedule_type in _VALID_SCHEDULE_TYPES, (
            f"The schedule type {self.schedule_type} is not supported."
        )
        eps = self.corrector_step_epsilon
        assert (isinstance(eps, str) and eps == "auto") or (
            isinstance(eps, (int, float)) and eps > 0
        ), f"corrector_step_epsilon must be 'auto' or a positive float, got {eps!r}"

    def resolve_corrector_step_epsilon(self) -> float:
        """The corrector step scale as a float, deriving 'auto' from sigma_min."""
        if self.corrector_step_epsilon == "auto":
            return 2.5 * self.sigma_min**2
        return float(self.corrector_step_epsilon)
