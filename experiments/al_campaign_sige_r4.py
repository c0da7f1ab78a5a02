"""Active-learning campaign rehearsal on SiGe with real components (VERDICT r3 #5).

Runs ``ActiveLearning.run_campaign`` with the REAL production pieces:

* the trained SiGe diffusion checkpoint (``sige_1x1x1_r3_checkpoint``,
  energy-KS 0.099 at its probe-calibrated tau = 0.919) driving a real
  ``ExciseAndRepaintSampleMaker`` (top-k selector -> spherical excision ->
  RePaint-constrained Langevin generation on the accelerator);
* the native vectorized Stillinger-Weber single-point calculator labelling
  every candidate on device (SiGe.sw).

Faked — exactly the subprocess boundaries the reference's own tests fake
(tests/active_learning_loop/, mocked LAMMPS+ARTn and FLARE C++):

* ARTn: emits an "uncertain" SiGe 2x2x2 MD-like structure with an
  anti-site + displacement defect on the highest-uncertainty atom, twice,
  then reports SUCCESS (reference flow: active_learning.py:178);
* FLARE: records labelled structures instead of updating a C++ sparse GP.

Artifacts land in experiments/al_campaign_sige_r4/: the campaign log,
per-round oracle labels (pickles with structures/forces/energies), the
campaign_details.yaml, and a machine-readable summary
(al_campaign_sige_r4.json) with per-round energies, constraint checks and
species statistics of the repainted candidates.
"""

import json
import os
import pickle
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.active_learning import (  # noqa: E402
    ActiveLearning,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.artn import (  # noqa: E402
    ArtnDriver,
    CalculationState,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.configuration_parsing import (  # noqa: E402
    get_sample_maker_from_configuration,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.single_point_calculators import (  # noqa: E402
    StillingerWeberSinglePointCalculator,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.energy_oracle_factory import (  # noqa: E402
    resolve_sw_coefficients_path,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compilation_cache,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.reference_configurations import (  # noqa: E402
    create_equilibrium_sige_structure,
)

CHECKPOINT = "experiments/sige_1x1x1_r3_checkpoint"
OUTPUT = "experiments/al_campaign_sige_r4"
ELEMENTS = ["Ge", "Si"]  # ElementTypes sorted convention: Ge=0, Si=1
TAU = 0.9193645531163086  # probe-calibrated (reheat_probe_sige_r3c.json)
WINDOW = 0.021942831848728347


class FakeArtnDriver:
    """SiGe 2x2x2 saddle search: interrupts with a defect structure, then succeeds.

    Stands in for the mpirun LAMMPS+ARTn subprocess only (the reference's
    tests fake the same boundary); the dump format and interruption protocol
    are the real ones (active_learning/artn.py).
    """

    UNCERTAIN_DUMP_FILENAME = ArtnDriver.UNCERTAIN_DUMP_FILENAME

    def __init__(self, interruptions: int):
        self.remaining_interruptions = interruptions
        self.calls = 0

    def run(self, working_directory, uncertainty_threshold,
            pair_coeff_file_path, mapped_uncertainty_file_path):
        self.calls += 1
        os.makedirs(working_directory, exist_ok=True)
        if self.remaining_interruptions == 0:
            return CalculationState.SUCCESS
        self.remaining_interruptions -= 1

        coords, types, cell = create_equilibrium_sige_structure(2, 5.543)
        rng = np.random.RandomState(100 + self.calls)
        n = len(coords)
        # Thermal jitter + a displaced defect atom carrying the uncertainty.
        coords = (coords + rng.normal(0.0, 0.004, coords.shape)) % 1.0
        defect = 13
        coords[defect] = (coords[defect] + np.array([0.05, 0.04, 0.03])) % 1.0
        uncertainty = rng.uniform(0.0, 0.3, n)
        uncertainty[defect] = 0.95

        positions = coords @ cell
        box = np.diag(cell)
        symbols = [ELEMENTS[t] for t in types]
        lines = [
            "---", "creator: LAMMPS", "timestep: 1", f"natoms: {n}", "box:",
            f"- [ 0, {box[0]} ]", f"- [ 0, {box[1]} ]", f"- [ 0, {box[2]} ]",
            "keywords: [ id, element, x, y, z, fx, fy, fz, c_unc ]", "data:",
        ]
        for i in range(n):
            p = positions[i]
            lines.append(
                f"- [ {i + 1}, {symbols[i]}, {p[0]}, {p[1]}, {p[2]}, "
                f"0.0, 0.0, 0.0, {uncertainty[i]} ]"
            )
        lines.append("...")
        with open(
            os.path.join(working_directory, self.UNCERTAIN_DUMP_FILENAME), "w"
        ) as fh:
            fh.write("\n".join(lines))
        return CalculationState.INTERRUPTION


class FakeFlareTrainer:
    """Records labelled structures (stands in for the FLARE C++ SGP only)."""

    def __init__(self):
        self.labelled = []

    def write_mapped_model_to_disk(self, directory, version=0):
        os.makedirs(directory, exist_ok=True)
        pair = os.path.join(directory, f"lmp{version}.flare")
        unc = os.path.join(directory, f"map_unc_lmp{version}.flare")
        open(pair, "w").write("fake mapped coefficients")
        open(unc, "w").write("fake mapped uncertainties")
        return pair, unc

    def add_labelled_structure(self, calculation, active_environment_indices=None):
        self.labelled.append((calculation, active_environment_indices))

    def write_checkpoint_to_disk(self, path):
        with open(path, "w") as fh:
            json.dump({"labelled_structures": len(self.labelled)}, fh)


class InactiveOptimizer:
    is_inactive = True


def main():
    enable_persistent_compilation_cache()
    if os.path.isdir(OUTPUT):
        shutil.rmtree(OUTPUT)
    os.makedirs(OUTPUT, exist_ok=True)

    sample_maker_config = {
        "algorithm": "excise_and_repaint",
        "sample_box_strategy": "fixed",
        "sample_box_size": [5.543, 5.543, 5.543],
        "number_of_samples_per_substructure": 4,
        "atom_selector": {"algorithm": "top_k", "top_k_environment": 1},
        "excisor": {"algorithm": "spherical_cutoff", "radial_cutoff": 2.9},
        "repaint_generator": {
            "noise": {
                "total_time_steps": 500,
                "sigma_min": 1.0e-4,
                "sigma_max": 0.2,
                "schedule_type": "linear",
                "corrector_step_epsilon": 2.5e-8,
            },
            "sampling": {
                "algorithm": "predictor_corrector",
                "num_atom_types": 2,
                "number_of_atoms": 8,
                "number_of_samples": 4,
                "number_of_corrector_steps": 3,
                "noise_temperature": TAU,
                "temperature_sigma_max": WINDOW,
                "use_fixed_lattice_parameters": True,
                "cell_dimensions": [5.543, 5.543, 5.543],
            },
        },
    }
    sample_maker = get_sample_maker_from_configuration(
        sample_maker_config, ELEMENTS, score_network_checkpoint=CHECKPOINT
    )
    oracle = StillingerWeberSinglePointCalculator(
        sw_coeff_filename=resolve_sw_coefficients_path("SiGe.sw"),
        elements=ELEMENTS,
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
        uncertainty_threshold=0.5,
        flare_trainer=flare,
        working_directory=OUTPUT,
        maximum_number_of_rounds=10,
    )

    # --- summarize the campaign artifacts ---
    rounds = []
    for round_dir in sorted(
        d for d in os.listdir(OUTPUT) if d.startswith("round_")
    ):
        labels_path = os.path.join(
            OUTPUT, round_dir, "oracle", "oracle_single_point_calculations.pkl"
        )
        if not os.path.isfile(labels_path):
            rounds.append({"round": round_dir, "labelled": 0})
            continue
        with open(labels_path, "rb") as fh:
            rows = pickle.load(fh)
        entries = []
        for row in rows:
            structure = row["structure"]
            symbols = list(structure.species)
            constrained = np.asarray(structure.site_properties["constrained"])
            forces = np.asarray(structure.site_properties["forces"])
            delta = (
                structure.frac_coords[:, None, :]
                - structure.frac_coords[None, :, :]
            )
            delta -= np.round(delta)
            distances = np.linalg.norm(
                delta @ structure.cell, axis=-1
            )
            off_diagonal = ~np.eye(len(structure), dtype=bool)
            dmin = (
                float(distances[off_diagonal].min())
                if len(structure) > 1
                else None
            )
            entries.append(
                {
                    "natoms": len(structure),
                    "n_constrained": int(constrained.sum()),
                    "n_repainted": int((1 - constrained).sum()),
                    "composition": {
                        s: symbols.count(s) for s in sorted(set(symbols))
                    },
                    "energy_ev": float(row["energy"]),
                    "energy_per_atom": float(row["energy"]) / len(structure),
                    "max_force_ev_a": float(np.abs(forces).max()),
                    "min_distance_angstrom": dmin,
                }
            )
        rounds.append(
            {"round": round_dir, "labelled": len(rows), "samples": entries}
        )

    summary = {
        "campaign_details": details,
        "flare_labelled_structures": len(flare.labelled),
        "artn_calls": artn.calls,
        "checkpoint": CHECKPOINT,
        "noise_temperature": TAU,
        "rounds": rounds,
    }
    out_path = "experiments/al_campaign_sige_r4.json"
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1), flush=True)

    assert details["final_state"].endswith("SUCCESS"), details
    assert len(flare.labelled) == 8, "expected 2 rounds x 4 labelled samples"


if __name__ == "__main__":
    main()
