"""End-to-end campaign test with fake ARTn and FLARE components."""

import os
import pickle

import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.active_learning import (
    ActiveLearning,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.artn import (
    ArtnDriver,
    CalculationState,
    get_calculation_state_from_artn_output,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.atom_selector import (
    TopKAtomSelector,
    TopKAtomSelectorArguments,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.excisor import (
    SphericalExcision,
    SphericalExcisionArguments,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.sample_maker import (
    ExciseAndNoOpSampleMaker,
    ExciseAndNoOpSampleMakerArguments,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.single_point_calculators import (
    StillingerWeberSinglePointCalculator,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.energy_oracle_factory import (
    resolve_sw_coefficients_path,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.reference_configurations import (
    get_silicon_supercell,
)


class FakeArtnDriver:
    """Interrupts with an uncertain structure N times, then succeeds."""

    UNCERTAIN_DUMP_FILENAME = ArtnDriver.UNCERTAIN_DUMP_FILENAME

    def __init__(self, interruptions: int):
        self.remaining_interruptions = interruptions
        self.calls = 0

    def run(self, working_directory, uncertainty_threshold, pair_coeff_file_path,
            mapped_uncertainty_file_path):
        self.calls += 1
        os.makedirs(working_directory, exist_ok=True)
        if self.remaining_interruptions == 0:
            return CalculationState.SUCCESS
        self.remaining_interruptions -= 1

        coords, cell = get_silicon_supercell(1, 5.43)
        positions = coords @ cell
        rng = np.random.RandomState(self.calls)
        uncertainty = rng.uniform(0, 0.5, size=8)
        uncertainty[3] = 0.95
        lines = [
            "---", "creator: LAMMPS", "timestep: 1", "natoms: 8",
            "box:", "- [ 0, 5.43 ]", "- [ 0, 5.43 ]", "- [ 0, 5.43 ]",
            "keywords: [ id, element, x, y, z, fx, fy, fz, c_unc ]", "data:",
        ]
        for i in range(8):
            p = positions[i]
            lines.append(
                f"- [ {i+1}, Si, {p[0]}, {p[1]}, {p[2]}, 0.0, 0.0, 0.0, "
                f"{uncertainty[i]} ]"
            )
        lines.append("...")
        with open(os.path.join(working_directory, self.UNCERTAIN_DUMP_FILENAME), "w") as fh:
            fh.write("\n".join(lines))
        return CalculationState.INTERRUPTION


class FakeFlareTrainer:
    def __init__(self):
        self.labelled = []
        self.checkpoints = []

    def write_mapped_model_to_disk(self, directory, version=0):
        os.makedirs(directory, exist_ok=True)
        pair = os.path.join(directory, f"lmp{version}.flare")
        unc = os.path.join(directory, f"map_unc_lmp{version}.flare")
        open(pair, "w").write("fake")
        open(unc, "w").write("fake")
        return pair, unc

    def add_labelled_structure(self, calculation, active_environment_indices=None):
        self.labelled.append((calculation, active_environment_indices))

    def write_checkpoint_to_disk(self, path):
        self.checkpoints.append(path)
        open(path, "w").write("{}")


class InactiveOptimizer:
    is_inactive = True


def test_campaign_runs_until_success(tmp_path):
    sample_maker = ExciseAndNoOpSampleMaker(
        sample_maker_arguments=ExciseAndNoOpSampleMakerArguments(
            element_list=["Si"], sample_box_size=[8.0, 8.0, 8.0]
        ),
        atom_selector=TopKAtomSelector(TopKAtomSelectorArguments(top_k_environment=1)),
        environment_excisor=SphericalExcision(
            SphericalExcisionArguments(radial_cutoff=2.5)
        ),
    )
    oracle = StillingerWeberSinglePointCalculator(
        sw_coeff_filename=resolve_sw_coefficients_path("Si.sw"), elements=["Si"]
    )
    artn = FakeArtnDriver(interruptions=2)
    flare = FakeFlareTrainer()

    campaign = ActiveLearning(
        oracle_single_point_calculator=oracle,
        sample_maker=sample_maker,
        artn_driver=artn,
        flare_hyperparameters_optimizer=InactiveOptimizer(),
    )
    details = campaign.run_campaign(
        uncertainty_threshold=0.8,
        flare_trainer=flare,
        working_directory=str(tmp_path / "campaign"),
        maximum_number_of_rounds=10,
    )

    assert artn.calls == 3  # two interruptions + one success
    assert details["final_round"] == 3
    assert "SUCCESS" in details["final_state"]
    # two rounds added one labelled structure each
    assert len(flare.labelled) == 2
    assert len(flare.checkpoints) == 1
    # artifacts on disk
    base = tmp_path / "campaign"
    assert (base / "campaign_details.yaml").exists()
    assert (base / "campaign.log").exists()
    with open(base / "round_1" / "oracle" / "oracle_single_point_calculations.pkl", "rb") as fh:
        rows = pickle.load(fh)
    assert rows[0]["calculation_type"] == "stillinger_weber"
    assert np.isfinite(rows[0]["energy"])
    assert "constrained" in rows[0]["structure"].site_properties


def test_artn_output_classification(tmp_path):
    success = tmp_path / "artn_success.out"
    success.write_text("ARTn search converged to a saddle point\n")
    assert get_calculation_state_from_artn_output(str(success)) == CalculationState.SUCCESS

    interrupted = tmp_path / "artn_interrupted.out"
    interrupted.write_text("fix halt triggered: uncertain environment\n")
    assert (
        get_calculation_state_from_artn_output(str(interrupted))
        == CalculationState.INTERRUPTION
    )

    garbage = tmp_path / "artn_garbage.out"
    garbage.write_text("nothing meaningful here\n")
    with pytest.raises(ValueError):
        get_calculation_state_from_artn_output(str(garbage))
