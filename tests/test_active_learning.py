"""Active-learning subsystem tests with fakes/mocks for external binaries.

(mirrors the reference's strategy: tests/active_learning_loop/* use fixtures
and fakes; FLARE/ARTn/LAMMPS are never invoked for real)
"""

import os
import pickle

import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.atom_selector import (
    ThresholdAtomSelector,
    ThresholdAtomSelectorArguments,
    TopKAtomSelector,
    TopKAtomSelectorArguments,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.excisor import (
    NearestNeighborsExcision,
    NearestNeighborsExcisionArguments,
    SphericalExcision,
    SphericalExcisionArguments,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.sample_maker import (
    BaseExciseSampleMaker,
    ExciseAndNoOpSampleMaker,
    ExciseAndNoOpSampleMakerArguments,
    ExciseAndRandomSampleMaker,
    ExciseAndRandomSampleMakerArguments,
    ExciseAndRepaintSampleMaker,
    ExciseAndRepaintSampleMakerArguments,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.single_point_calculators import (
    StillingerWeberSinglePointCalculator,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.structure import (
    Structure,
    StructureConverter,
    get_distances_from_reference_point,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.lammps_io import (
    extract_all_fields_from_dump,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.energy_oracle_factory import (
    resolve_sw_coefficients_path,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.reference_configurations import (
    get_silicon_supercell,
)


def test_atom_selectors():
    uncertainty = np.array([0.1, 0.9, 0.5, 0.05, 0.7])
    threshold = ThresholdAtomSelector(
        ThresholdAtomSelectorArguments(uncertainty_threshold=0.4)
    )
    np.testing.assert_array_equal(
        threshold.select_central_atoms(uncertainty), [1, 4, 2]
    )
    top2 = TopKAtomSelector(TopKAtomSelectorArguments(top_k_environment=2))
    np.testing.assert_array_equal(top2.select_central_atoms(uncertainty), [1, 4])


@pytest.fixture
def si_structure_axl():
    coords, cell = get_silicon_supercell(1, 5.43)
    lattice = np.concatenate([np.diag(cell), np.zeros(3)])
    return AXL(A=np.zeros(8, dtype=np.int64), X=coords, L=lattice)


def test_spherical_excision(si_structure_axl):
    excisor = SphericalExcision(SphericalExcisionArguments(radial_cutoff=2.5))
    environments, central_indices = excisor.excise_environments(
        si_structure_axl, np.array([4]), center_atoms=True
    )
    env = environments[0]
    # Diamond: 4 nearest neighbors at ~2.35 A + the central atom itself.
    assert len(env.X) == 5
    assert central_indices[0] == 0
    # centered: central atom at (0.5, 0.5, 0.5)
    np.testing.assert_allclose(env.X[0], 0.5, atol=1e-8)
    # all other atoms within the cutoff of the center
    distances = get_distances_from_reference_point(env.X, env.X[0], env.L)
    assert (distances[1:] < 2.5).all()


def test_nearest_neighbors_excision(si_structure_axl):
    excisor = NearestNeighborsExcision(
        NearestNeighborsExcisionArguments(number_of_neighbors=4)
    )
    environments, _ = excisor.excise_environments(
        si_structure_axl, np.array([0]), center_atoms=False
    )
    assert len(environments[0].X) == 5


def test_embed_structure_in_new_box():
    structure = AXL(
        A=np.array([0, 0]),
        X=np.array([[0.5, 0.5, 0.5], [0.6, 0.5, 0.5]]),
        L=np.array([10.0, 10.0, 10.0, 0, 0, 0]),
    )
    new = BaseExciseSampleMaker.embed_structure_in_new_box(
        structure, np.array([5.0, 5.0, 5.0, 0, 0, 0])
    )
    # Center maps to center; the 1 A cartesian offset is preserved.
    np.testing.assert_allclose(new.X[0], 0.5, atol=1e-8)
    np.testing.assert_allclose(new.X[1], [0.7, 0.5, 0.5], atol=1e-8)
    # Atoms escaping the smaller box must raise.
    far = structure._replace(X=np.array([[0.5, 0.5, 0.5], [0.9, 0.5, 0.5]]))
    with pytest.raises(AssertionError):
        BaseExciseSampleMaker.embed_structure_in_new_box(
            far, np.array([5.0, 5.0, 5.0, 0, 0, 0])
        )


def _make_selector():
    return TopKAtomSelector(TopKAtomSelectorArguments(top_k_environment=1))


def _make_excisor():
    return SphericalExcision(SphericalExcisionArguments(radial_cutoff=2.5))


def test_excise_and_noop_sample_maker(si_structure_axl):
    maker = ExciseAndNoOpSampleMaker(
        sample_maker_arguments=ExciseAndNoOpSampleMakerArguments(
            element_list=["Si"], sample_box_size=[8.0, 8.0, 8.0]
        ),
        atom_selector=_make_selector(),
        environment_excisor=_make_excisor(),
    )
    uncertainty = np.zeros(8)
    uncertainty[3] = 1.0
    samples, actives, infos = maker.make_samples(si_structure_axl, uncertainty)
    assert len(samples) == 1
    assert len(samples[0].X) == 5
    np.testing.assert_allclose(samples[0].L[:3], 8.0)
    assert actives[0][0] == 0
    assert infos[0]["constrained_atom_indices"] == [0, 1, 2, 3, 4]
    assert "axl_structure_in_new_box" in infos[0]


def test_excise_and_random_sample_maker(si_structure_axl):
    maker = ExciseAndRandomSampleMaker(
        sample_maker_arguments=ExciseAndRandomSampleMakerArguments(
            element_list=["Si"],
            sample_box_size=[8.0, 8.0, 8.0],
            total_number_of_atoms=10,
            minimal_interatomic_distance=1.0,
        ),
        atom_selector=_make_selector(),
        environment_excisor=_make_excisor(),
    )
    uncertainty = np.zeros(8)
    uncertainty[2] = 1.0
    samples, actives, _ = maker.make_samples(si_structure_axl, uncertainty)
    sample = samples[0]
    assert len(sample.X) == 10
    # overlap rejection: every pair farther than the minimal distance
    for i in range(len(sample.X)):
        d = get_distances_from_reference_point(sample.X, sample.X[i], sample.L)
        d[i] = np.inf
        assert (d > 0.99).all()


def test_excise_and_repaint_sample_maker(si_structure_axl):
    """Repaint with a mocked score network; constrained atoms must survive."""
    import jax.numpy as jnp

    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        NOISY_AXL_COMPOSITION,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )

    def mock_network(batch):
        composition = batch[NOISY_AXL_COMPOSITION]
        b, n = composition.A.shape
        logits = jnp.zeros((b, n, 2)).at[..., -1].set(-jnp.inf)
        return AXL(
            A=logits, X=jnp.zeros_like(composition.X), L=jnp.zeros_like(composition.L)
        )

    sampling_parameters = PredictorCorrectorSamplingParameters(
        num_atom_types=1,
        number_of_atoms=10,
        number_of_samples=2,
        number_of_corrector_steps=0,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[8.0, 8.0, 8.0],
    )
    maker = ExciseAndRepaintSampleMaker(
        sample_maker_arguments=ExciseAndRepaintSampleMakerArguments(
            element_list=["Si"],
            sample_box_size=[8.0, 8.0, 8.0],
            number_of_samples_per_substructure=2,
        ),
        atom_selector=_make_selector(),
        environment_excisor=_make_excisor(),
        noise_parameters=NoiseParameters(total_time_steps=5),
        sampling_parameters=sampling_parameters,
        axl_network=mock_network,
    )
    uncertainty = np.zeros(8)
    uncertainty[1] = 1.0
    samples, actives, infos = maker.make_samples(si_structure_axl, uncertainty)
    assert len(samples) == 2
    constrained = infos[0]["constrained_atom_indices"]
    reboxed = infos[0]["axl_structure_in_new_box"]
    for sample in samples:
        assert len(sample.X) == 10
        # The constrained slots carry the excised environment exactly.
        np.testing.assert_allclose(
            sample.X[constrained], np.asarray(reboxed.X), atol=1e-6
        )
        np.testing.assert_array_equal(sample.A[constrained], reboxed.A)
        assert (sample.A != 1).all()  # no MASK anywhere


def test_sw_single_point_calculator_matches_oracle():
    coords, cell = get_silicon_supercell(1, 5.431)
    structure = Structure(species=["Si"] * 8, frac_coords=coords, cell=cell)
    calculator = StillingerWeberSinglePointCalculator(
        sw_coeff_filename=resolve_sw_coefficients_path("Si.sw"), elements=["Si"]
    )
    result = calculator.calculate(structure)
    assert result.energy / 8 == pytest.approx(-2 * 2.1683, abs=2e-3)
    np.testing.assert_allclose(result.forces, 0.0, atol=2e-4)


def test_structure_converter_round_trip(si_structure_axl):
    converter = StructureConverter(["Si"])
    structure = converter.convert_axl_to_structure(si_structure_axl)
    assert structure.species == ["Si"] * 8
    back = converter.convert_structure_to_axl(structure)
    np.testing.assert_allclose(back.X, si_structure_axl.X)
    np.testing.assert_array_equal(back.A, si_structure_axl.A)
    np.testing.assert_allclose(back.L, si_structure_axl.L)


def test_extract_dump_with_uncertainty_column(tmp_path):
    dump = tmp_path / "uncertain_dump.yaml"
    dump.write_text(
        "\n".join(
            [
                "---",
                "creator: LAMMPS",
                "timestep: 3",
                "natoms: 2",
                "box:",
                "- [ 0, 5.0 ]",
                "- [ 0, 5.0 ]",
                "- [ 0, 5.0 ]",
                "keywords: [ id, element, x, y, z, fx, fy, fz, c_unc ]",
                "data:",
                "- [ 2, Si, 2.5, 2.5, 2.5, 0.0, 0.0, 0.0, 0.9 ]",
                "- [ 1, Si, 0.5, 0.5, 0.5, 0.1, 0.0, 0.0, 0.2 ]",
                "...",
            ]
        )
    )
    structures, forces, _, uncertainties = extract_all_fields_from_dump(str(dump))
    assert len(structures) == 1
    np.testing.assert_allclose(structures[0].frac_coords[0], 0.1)  # sorted by id
    np.testing.assert_allclose(uncertainties[0], [0.2, 0.9])
    np.testing.assert_allclose(forces[0][0], [0.1, 0.0, 0.0])


def test_repaint_config_force_field_wrapping(tmp_path, monkeypatch):
    """repaint_generator.force_field wraps the checkpoint network with the
    repulsive pseudo-force while preserving the params-as-arguments fast
    path (round 5: the AL ladder produced overlapping candidates without
    it)."""
    import functools

    import jax.numpy as jnp

    from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning import (
        configuration_parsing,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        NOISY_AXL_COMPOSITION, NOISE, TIME, CARTESIAN_FORCES,
    )

    def fake_apply(params, batch):
        composition = batch[NOISY_AXL_COMPOSITION]
        b, n = composition.A.shape
        logits = jnp.zeros((b, n, 2)).at[..., -1].set(-jnp.inf)
        return AXL(
            A=logits,
            X=jnp.zeros_like(composition.X),
            L=jnp.zeros_like(composition.L),
        )

    monkeypatch.setattr(
        "diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore."
        "load_axl_network_from_checkpoint",
        lambda path, prefer="best": functools.partial(fake_apply, {"w": 1.0}),
    )
    config = {
        "noise": {
            "total_time_steps": 5, "sigma_min": 1e-3, "sigma_max": 0.3,
            "schedule_type": "linear",
        },
        "force_field": [1.5, 20.0],
        "sampling": {
            "algorithm": "predictor_corrector",
            "num_atom_types": 1,
            "number_of_atoms": 4,
            "number_of_samples": 2,
            "number_of_corrector_steps": 0,
            "use_fixed_lattice_parameters": True,
            "cell_dimensions": [6.0, 6.0, 6.0],
        },
    }
    _, _, network = configuration_parsing.get_repaint_generation_pieces(
        config, "fake_checkpoint"
    )
    # Fast path preserved: still a bare (fn, params) partial.
    assert isinstance(network, functools.partial)
    assert len(network.args) == 1 and not network.keywords

    # Two overlapping atoms: the pseudo-force must push a nonzero X score.
    x = jnp.asarray([[[0.50, 0.5, 0.5], [0.52, 0.5, 0.5],
                      [0.10, 0.1, 0.1], [0.90, 0.9, 0.9]]])
    batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((1, 4), jnp.int32), X=x,
            L=jnp.asarray([[6.0, 6.0, 6.0, 0.0, 0.0, 0.0]]),
        ),
        NOISE: jnp.full((1, 1), 0.1),
        TIME: jnp.full((1, 1), 0.5),
        CARTESIAN_FORCES: jnp.zeros((1, 4, 3)),
    }
    out = network(batch)
    assert float(jnp.abs(out.X).max()) > 0.0
