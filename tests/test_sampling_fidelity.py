"""Statistical fidelity of the PC sampler with an exact (analytical) score.

If the score is exact, annealed-Langevin PC sampling must reproduce the data
distribution: a narrow Gaussian of width sigma_d around the equilibrium
coordinates. This validates the sampler end-to-end (schedule conventions,
update rules, key plumbing) independently of training.
"""

import jax
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
    LangevinGenerator,
    PredictorCorrectorSamplingParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
    AnalyticalScoreNetwork,
    AnalyticalScoreNetworkConfig,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
)

NATOMS, D = 2, 3
SIGMA_D = 0.04
EQUILIBRIUM = [[0.3, 0.4, 0.5], [0.8, 0.9, 0.1]]


@pytest.mark.slow
def test_pc_sampler_reproduces_gaussian_data_distribution():
    config = AnalyticalScoreNetworkConfig(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        kmax=4,
        equilibrium_relative_coordinates=EQUILIBRIUM,
        sigma_d=SIGMA_D,
        use_permutation_invariance=True,
    )
    network = AnalyticalScoreNetwork(config)

    generator = LangevinGenerator(
        NoiseParameters(total_time_steps=100, sigma_min=0.001, sigma_max=0.5),
        PredictorCorrectorSamplingParameters(
            num_atom_types=1,
            number_of_atoms=NATOMS,
            number_of_samples=128,
            number_of_corrector_steps=2,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[1.0] * D,
        ),
        lambda batch: network.apply({}, batch, False),
    )
    samples = generator.sample(jax.random.PRNGKey(0), 128)
    x = np.asarray(samples.X)  # [128, 2, 3]

    equilibrium = np.asarray(EQUILIBRIUM)
    # Assign each sampled atom to its closest equilibrium site (the data
    # distribution is permutation symmetrized).
    displacements = []
    for sample in x:
        for atom in sample:
            delta = np.mod(atom - equilibrium, 1.0)
            delta = np.where(delta > 0.5, delta - 1.0, delta)
            distances = np.linalg.norm(delta, axis=-1)
            displacements.append(delta[np.argmin(distances)])
    displacements = np.asarray(displacements)

    # Every atom should sit near one of the two modes...
    assert np.abs(displacements).max() < 5 * SIGMA_D
    # ...with near-zero mean displacement and the right spread per axis.
    np.testing.assert_allclose(
        displacements.mean(axis=0), 0.0, atol=4 * SIGMA_D / np.sqrt(len(displacements))
    )
    measured_std = displacements.std(axis=0)
    np.testing.assert_allclose(measured_std, SIGMA_D, rtol=0.25)

    # Both modes must actually be occupied in (nearly) every sample.
    occupied_both = 0
    for sample in x:
        assigned = set()
        for atom in sample:
            delta = np.mod(atom - equilibrium, 1.0)
            delta = np.where(delta > 0.5, delta - 1.0, delta)
            assigned.add(int(np.argmin(np.linalg.norm(delta, axis=-1))))
        if assigned == {0, 1}:
            occupied_both += 1
    assert occupied_both / len(x) > 0.95


@pytest.mark.slow
def test_adaptive_corrector_reproduces_data_distribution_with_exact_score():
    """The adaptive corrector (reference default r=0.17) is statistically
    correct *given enough corrector steps per noise level*: with an exact
    score and 5 correctors it reproduces the data distribution to the same
    tolerance as the PC sampler. At the reference default of 2 correctors
    only ~60% of atoms converge even with the exact score — corrector-only
    transport needs more substeps than predictor+corrector — so the
    production failure of this sampler is (a) the default corrector count
    and (b) the learned score's vanishing large-sigma norm (fenced by the
    harmonic step-length cap); the update rule itself is sound.

    (reference: src/.../generators/adaptive_corrector.py:17; VERDICT
    round-3 #7)
    """
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        AdaptiveCorrectorGenerator,
    )

    config = AnalyticalScoreNetworkConfig(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        kmax=4,
        equilibrium_relative_coordinates=EQUILIBRIUM,
        sigma_d=SIGMA_D,
        use_permutation_invariance=True,
    )
    network = AnalyticalScoreNetwork(config)

    def sample_displacements(n_correctors, key):
        generator = AdaptiveCorrectorGenerator(
            NoiseParameters(
                total_time_steps=100, sigma_min=0.001, sigma_max=0.5,
                corrector_r=0.17,
            ),
            PredictorCorrectorSamplingParameters(
                algorithm="adaptive_corrector",
                num_atom_types=1,
                number_of_atoms=NATOMS,
                number_of_samples=128,
                number_of_corrector_steps=n_correctors,
                adaptive_corrector_mode_std=SIGMA_D,
                use_fixed_lattice_parameters=True,
                cell_dimensions=[1.0] * D,
            ),
            lambda batch: network.apply({}, batch, False),
        )
        samples = generator.sample(key, 128)
        equilibrium = np.asarray(EQUILIBRIUM)
        displacements = []
        for sample in np.asarray(samples.X):
            for atom in sample:
                delta = np.mod(atom - equilibrium, 1.0)
                delta = np.where(delta > 0.5, delta - 1.0, delta)
                displacements.append(
                    delta[np.argmin(np.linalg.norm(delta, axis=-1))]
                )
        return np.asarray(displacements)

    converged = sample_displacements(5, jax.random.PRNGKey(2))
    assert np.abs(converged).max() < 5 * SIGMA_D
    np.testing.assert_allclose(converged.std(axis=0), SIGMA_D, rtol=0.3)

    # The reference default (2 correctors) under-transports even with the
    # exact score: a sizable fraction of atoms never reach a mode.
    default = sample_displacements(2, jax.random.PRNGKey(3))
    stray_fraction = (np.abs(default).max(axis=-1) > 5 * SIGMA_D).mean()
    assert stray_fraction > 0.1, (
        "reference-default corrector count unexpectedly converged; "
        "revisit the sampler guidance in the factory docs"
    )


@pytest.mark.slow
def test_ode_sampler_reproduces_data_distribution_with_exact_score():
    """The probability-flow ODE sampler is statistically exact given an
    exact score (every atom reaches a mode; ensemble width matches sigma_d)
    — its production failure on learned scores is the score, not the
    integrator. (reference: ode_position_generator.py:43; VERDICT #7)
    """
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.ode_position_generator import (
        ExplodingVarianceODEAXLGenerator,
        ODESamplingParameters,
    )

    config = AnalyticalScoreNetworkConfig(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        kmax=4,
        equilibrium_relative_coordinates=EQUILIBRIUM,
        sigma_d=SIGMA_D,
        use_permutation_invariance=True,
    )
    network = AnalyticalScoreNetwork(config)
    generator = ExplodingVarianceODEAXLGenerator(
        NoiseParameters(total_time_steps=100, sigma_min=0.001, sigma_max=0.5),
        ODESamplingParameters(
            algorithm="ode",
            num_atom_types=1,
            number_of_atoms=NATOMS,
            number_of_samples=128,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[1.0] * D,
        ),
        lambda batch: network.apply({}, batch, False),
    )
    samples = generator.sample(jax.random.PRNGKey(4), 128)

    equilibrium = np.asarray(EQUILIBRIUM)
    displacements = []
    for sample in np.asarray(samples.X):
        for atom in sample:
            delta = np.mod(atom - equilibrium, 1.0)
            delta = np.where(delta > 0.5, delta - 1.0, delta)
            displacements.append(delta[np.argmin(np.linalg.norm(delta, axis=-1))])
    displacements = np.asarray(displacements)

    assert np.abs(displacements).max() < 5 * SIGMA_D
    np.testing.assert_allclose(displacements.std(axis=0), SIGMA_D, rtol=0.3)


@pytest.mark.slow
def test_sde_sampler_reproduces_data_distribution_with_exact_score():
    """The reverse-SDE sampler is statistically exact given an exact score
    (every atom reaches a mode; ensemble width matches sigma_d).
    (reference: sde_position_generator.py; VERDICT #7)
    """
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.sde_position_generator import (
        ExplodingVarianceSDEPositionGenerator,
        SDESamplingParameters,
    )

    config = AnalyticalScoreNetworkConfig(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        kmax=4,
        equilibrium_relative_coordinates=EQUILIBRIUM,
        sigma_d=SIGMA_D,
        use_permutation_invariance=True,
    )
    network = AnalyticalScoreNetwork(config)
    generator = ExplodingVarianceSDEPositionGenerator(
        NoiseParameters(total_time_steps=100, sigma_min=0.001, sigma_max=0.5),
        SDESamplingParameters(
            algorithm="sde",
            num_atom_types=1,
            number_of_atoms=NATOMS,
            number_of_samples=128,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[1.0] * D,
        ),
        lambda batch: network.apply({}, batch, False),
    )
    samples = generator.sample(jax.random.PRNGKey(5), 128)

    equilibrium = np.asarray(EQUILIBRIUM)
    displacements = []
    for sample in np.asarray(samples.X):
        for atom in sample:
            delta = np.mod(atom - equilibrium, 1.0)
            delta = np.where(delta > 0.5, delta - 1.0, delta)
            displacements.append(delta[np.argmin(np.linalg.norm(delta, axis=-1))])
    displacements = np.asarray(displacements)

    assert np.abs(displacements).max() < 5 * SIGMA_D
    np.testing.assert_allclose(displacements.std(axis=0), SIGMA_D, rtol=0.3)
