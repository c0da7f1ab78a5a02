r"""Score Fokker-Planck regularizer.

A true time-dependent score field obeys the "score Fokker-Planck" PDE; its
residual is used as an auxiliary loss:

    R = d S / dt - sigma sigma_dot (2 (S . nabla) S + nabla^2 S),
    loss = mean(R^2),

evaluated at uniformly random coordinates so the network sees the whole torus
at all times.

TPU-first redesign of the reference implementation
(src/diffusion_for_multi_scale_molecular_dynamics/regularizers/fokker_planck_regularizer.py:20-383):
the reference builds full Jacobian/Hessian tensors with torch.func.jacrev and
batch-sum tricks; here every derivative is a forward-mode ``jax.jvp`` on the
*batched* score function — cross-sample independence makes the batched jvp
equal the per-sample derivative, so nothing quadratic in (natoms x d) is ever
materialized except the exact Laplacian's basis loop:

  * dS/dt:            jvp over the time argument with a ones tangent;
  * (S . nabla) S:    jvp over coordinates with tangent S;
  * exact nabla^2 S:  sum over the (natoms*d) canonical basis vectors of
                      second-order jvp (nested forward-over-forward);
  * HTE nabla^2 S:    Hutchinson estimate with Rademacher tangents.
"""

from dataclasses import dataclass
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..namespace import AXL, CARTESIAN_FORCES, NOISE, NOISY_AXL_COMPOSITION, TIME
from ..noise_schedulers.sigma_calculator import get_sigma_functions
from .regularizer import Regularizer, RegularizerParameters


@dataclass(kw_only=True)
class FokkerPlanckRegularizerParameters(RegularizerParameters):
    """Fokker-Planck regularization hyperparameters."""

    type: str = "fokker_planck"
    batch_size: int  # how many batch elements feed the residual
    use_hte_approximation: bool = False
    number_of_hte_terms: int = 0
    sigma_min: float
    sigma_max: float
    schedule_type: str = "exponential"

    def __post_init__(self):
        super().__post_init__()
        if self.use_hte_approximation:
            assert self.number_of_hte_terms > 0, (
                "the number of HTE terms must be positive"
            )
        else:
            assert self.number_of_hte_terms == 0, (
                "the exact Laplacian is computed; number_of_hte_terms must be 0"
            )


class FokkerPlanckRegularizer(Regularizer):
    """Penalizes the score-FP PDE residual."""

    def __init__(self, regularizer_parameters: FokkerPlanckRegularizerParameters):
        super().__init__(regularizer_parameters)
        self.sigma_fn, self.sigma_dot_fn, _ = get_sigma_functions(
            regularizer_parameters.schedule_type,
            regularizer_parameters.sigma_min,
            regularizer_parameters.sigma_max,
        )

    def _create_score_function(
        self, score_fn: Callable, atom_types, lattice_parameters
    ) -> Callable:
        """(x [b,n,d], t [b,1]) -> true score S = (sigma-normalized)/sigma."""

        def score(relative_coordinates, times):
            sigmas_t = self.sigma_fn(times)  # [b, 1]
            batch = {
                NOISY_AXL_COMPOSITION: AXL(
                    A=atom_types, X=relative_coordinates, L=lattice_parameters
                ),
                NOISE: sigmas_t,
                TIME: times,
                CARTESIAN_FORCES: jnp.zeros_like(relative_coordinates),
            }
            return score_fn(batch).X / sigmas_t[:, :, None]

        return score

    @staticmethod
    def get_exact_laplacian(score_x: Callable, x: jnp.ndarray) -> jnp.ndarray:
        """nabla^2 S by summing second-order jvps over the canonical basis."""
        batch, natoms, d = x.shape
        eye = jnp.eye(natoms * d).reshape(natoms * d, natoms, d)

        def second_derivative(e):
            tangent = jnp.broadcast_to(e, x.shape)

            def first_derivative(y):
                return jax.jvp(score_x, (y,), (tangent,))[1]

            return jax.jvp(first_derivative, (x,), (tangent,))[1]

        # [natoms*d, batch, natoms, d] -> sum over basis directions
        return jnp.sum(jax.vmap(second_derivative)(eye), axis=0)

    def get_hte_laplacian(self, key, score_x: Callable, x: jnp.ndarray) -> jnp.ndarray:
        """Hutchinson trace estimate of nabla^2 S with Rademacher tangents."""
        n_terms = self.parameters.number_of_hte_terms
        z = 2.0 * jax.random.randint(key, (n_terms,) + x.shape, 0, 2) - 1.0

        def one_term(tangent):
            def first_derivative(y):
                return jax.jvp(score_x, (y,), (tangent,))[1]

            return jax.jvp(first_derivative, (x,), (tangent,))[1]

        return jnp.mean(jax.vmap(one_term)(z.astype(x.dtype)), axis=0)

    def compute_score_fokker_planck_residuals(
        self, score_fn: Callable, batch: Dict[str, Any], key
    ) -> jnp.ndarray:
        """The FP residual R at the batch's coordinates/times, [b, n, d]."""
        composition = batch[NOISY_AXL_COMPOSITION]
        x = composition.X
        times = batch[TIME]

        score = self._create_score_function(score_fn, composition.A, composition.L)
        scores = score(x, times)

        # dS/dt: each sample depends only on its own time entry.
        scores_time_derivative = jax.jvp(
            lambda t: score(x, t), (times,), (jnp.ones_like(times),)
        )[1]

        def score_x(y):
            return score(y, times)

        scores_divergence_scores = jax.jvp(score_x, (x,), (scores,))[1]

        if self.parameters.use_hte_approximation:
            scores_laplacian = self.get_hte_laplacian(key, score_x, x)
        else:
            scores_laplacian = self.get_exact_laplacian(score_x, x)

        sigma = self.sigma_fn(times)
        sigma_dot = self.sigma_dot_fn(times)
        sigma_term = (sigma * sigma_dot)[:, :, None]

        return scores_time_derivative - sigma_term * (
            2.0 * scores_divergence_scores + scores_laplacian
        )

    def compute_regularizer_loss(
        self, score_fn: Callable, augmented_batch: Dict[str, Any], key
    ) -> jnp.ndarray:
        key_x, key_hte = jax.random.split(key)
        composition = augmented_batch[NOISY_AXL_COMPOSITION]
        external_batch_size = composition.X.shape[0]
        batch_size = min(self.parameters.batch_size, external_batch_size)

        times = augmented_batch[TIME][:batch_size]
        atom_types = composition.A[:batch_size]
        lattice_parameters = composition.L[:batch_size]
        # Random coordinates: the PDE must hold everywhere, not just on data.
        x = jax.random.uniform(key_x, composition.X[:batch_size].shape)

        batch = {
            NOISY_AXL_COMPOSITION: AXL(A=atom_types, X=x, L=lattice_parameters),
            TIME: times,
            NOISE: self.sigma_fn(times),
            CARTESIAN_FORCES: jnp.zeros_like(x),
        }
        residuals = self.compute_score_fokker_planck_residuals(
            score_fn, batch, key_hte
        )
        return jnp.mean(residuals**2)
