"""Active-learning campaign with a threshold LADDER on SiGe 2x2x2 (VERDICT r4 #8).

Extends the round-4 rehearsal (al_campaign_sige_r4.py: 1 threshold x 2
interruption rounds at n=8 boxes) to the reference's multi-threshold
campaign semantics — its train_active_learning.py:104 loops
``uncertainty_thresholds``, one full campaign per threshold — driven by the
round-5 SiGe 2x2x2 checkpoint with excise-and-repaint at n=64 boxes, where
the registry problem is real (round-4 results: the n=8 box was "much
weaker" on that axis).

Real components: the trained 64-atom two-species EGNN checkpoint behind
``ExciseAndRepaintSampleMaker`` (top-k selector -> spherical excision ->
RePaint-constrained Langevin, coherent renoising on by default), and the
native SW single-point calculator labelling on device. Faked at exactly the
subprocess boundaries the reference's tests fake: ARTn (emits uncertain
SiGe 2x2x2 defect structures, then SUCCESS) and the FLARE C++ SGP.

Usage (TPU):
    python experiments/al_campaign_sige_2x2x2_r5.py \
        --checkpoint experiments/sige_2x2x2_r5_checkpoint
"""

import argparse
import json
import os
import pickle
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from al_campaign_sige_r4 import (  # noqa: E402 — the round-4 fakes, reused
    FakeArtnDriver,
    FakeFlareTrainer,
    InactiveOptimizer,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.active_learning import (  # noqa: E402
    ActiveLearning,
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

ELEMENTS = ["Ge", "Si"]  # ElementTypes sorted convention: Ge=0, Si=1
BOX = 11.086  # 2 x 5.543 A


def summarize_round_labels(output, round_dir):
    """Per-candidate stats from one round's oracle pickle."""
    labels_path = os.path.join(
        output, round_dir, "oracle", "oracle_single_point_calculations.pkl"
    )
    if not os.path.isfile(labels_path):
        return {"round": round_dir, "labelled": 0}
    with open(labels_path, "rb") as fh:
        rows = pickle.load(fh)
    entries = []
    for row in rows:
        structure = row["structure"]
        symbols = list(structure.species)
        constrained = np.asarray(structure.site_properties["constrained"])
        delta = (
            structure.frac_coords[:, None, :] - structure.frac_coords[None, :, :]
        )
        delta -= np.round(delta)
        distances = np.linalg.norm(delta @ structure.cell, axis=-1)
        off_diag = ~np.eye(len(structure), dtype=bool)
        entries.append(
            {
                "natoms": len(structure),
                "n_constrained": int(constrained.sum()),
                "n_si": int(sum(s == "Si" for s in symbols)),
                "n_ge": int(sum(s == "Ge" for s in symbols)),
                "energy_per_atom": float(row["energy"]) / len(structure),
                "min_pair_distance": float(distances[off_diag].min()),
            }
        )
    return {"round": round_dir, "labelled": len(rows), "candidates": entries}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--checkpoint", default="experiments/sige_2x2x2_r5_checkpoint"
    )
    parser.add_argument(
        "--thresholds", type=float, nargs="+", default=[0.9, 0.6, 0.3]
    )
    parser.add_argument("--interruptions", type=int, default=2)
    parser.add_argument("--max_rounds", type=int, default=8)
    parser.add_argument("--samples_per_substructure", type=int, default=4)
    parser.add_argument("--noise_temperature", type=float, default=1.22)
    parser.add_argument("--sigma_window", type=float, default=0.022)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument(
        "--output", default="experiments/al_campaign_sige_2x2x2_r5"
    )
    args = parser.parse_args(argv)

    enable_persistent_compilation_cache()
    if os.path.isdir(args.output):
        shutil.rmtree(args.output)
    os.makedirs(args.output, exist_ok=True)

    # n=64 repaint boxes: the excised cluster (~5 atoms at r=2.9 A) is
    # repainted inside a full 2x2x2 cell, so the generator must solve the
    # real registry problem (59 free atoms around 5 constrained ones).
    sample_maker_config = {
        "algorithm": "excise_and_repaint",
        "sample_box_strategy": "fixed",
        "sample_box_size": [BOX, BOX, BOX],
        "number_of_samples_per_substructure": args.samples_per_substructure,
        "atom_selector": {"algorithm": "top_k", "top_k_environment": 1},
        "excisor": {"algorithm": "spherical_cutoff", "radial_cutoff": 2.9},
        "repaint_generator": {
            "noise": {
                "total_time_steps": args.steps,
                "sigma_min": 1.0e-4,
                "sigma_max": 0.2,
                "schedule_type": "linear",
                "corrector_step_epsilon": "auto",
            },
            # Production repulsive pseudo-force: without it the r5 ladder
            # produced 5/24 overlapping candidates at n=64.
            "force_field": [1.5, 20.0],
            "sampling": {
                "algorithm": "predictor_corrector",
                "num_atom_types": 2,
                "number_of_atoms": 64,
                "number_of_samples": args.samples_per_substructure,
                "number_of_corrector_steps": 3,
                "noise_temperature": args.noise_temperature,
                "temperature_sigma_max": args.sigma_window,
                "use_fixed_lattice_parameters": True,
                "cell_dimensions": [BOX, BOX, BOX],
            },
        },
    }
    sample_maker = get_sample_maker_from_configuration(
        sample_maker_config, ELEMENTS, score_network_checkpoint=args.checkpoint
    )
    oracle = StillingerWeberSinglePointCalculator(
        sw_coeff_filename=resolve_sw_coefficients_path("SiGe.sw"),
        elements=ELEMENTS,
    )

    # The reference's threshold ladder (train_active_learning.py:104): one
    # fresh campaign per threshold, each from the initial (here: empty)
    # FLARE state.
    ladder = []
    for threshold in args.thresholds:
        campaign_dir = os.path.join(
            args.output, f"campaign_threshold_{threshold}"
        )
        artn = FakeArtnDriver(interruptions=args.interruptions)
        flare = FakeFlareTrainer()
        campaign = ActiveLearning(
            oracle_single_point_calculator=oracle,
            sample_maker=sample_maker,
            artn_driver=artn,
            flare_hyperparameters_optimizer=InactiveOptimizer(),
        )
        details = campaign.run_campaign(
            uncertainty_threshold=threshold,
            flare_trainer=flare,
            working_directory=campaign_dir,
            maximum_number_of_rounds=args.max_rounds,
        )
        rounds = [
            summarize_round_labels(campaign_dir, d)
            for d in sorted(
                x for x in os.listdir(campaign_dir) if x.startswith("round_")
            )
        ]
        ladder.append(
            {
                "uncertainty_threshold": threshold,
                "artn_calls": artn.calls,
                "labelled_structures": len(flare.labelled),
                "campaign_details": str(details),
                "rounds": rounds,
            }
        )
        print(json.dumps(ladder[-1])[:2000], flush=True)

    summary_path = args.output + ".json"
    with open(summary_path, "w") as fh:
        json.dump(
            {
                "checkpoint": args.checkpoint,
                "box": BOX,
                "natoms": 64,
                "thresholds": args.thresholds,
                "ladder": ladder,
            },
            fh,
            indent=1,
        )
    print(f"wrote {summary_path}")


if __name__ == "__main__":
    main()
