"""Record and dissect a constrained (RePaint) trajectory on the trained model.

The r4 repaint experiments leave generated atoms near-uniform while the
exact-score control converges — so the failure lives in the learned
EGNN's response to the constrained state. This probe records the full
predictor trajectory (composition + model predictions per step) for a
constrained run and a free run with identical settings, then reports per
phase (sigma decade):

  * mean |sigma-normalized X-score| for free vs constrained slots — a
    near-zero free-slot score mid-trajectory means the model sees nothing
    to fix (transport never starts);
  * per-step drift of the free slots (are they moving at all?);
  * MASK fraction per slot group.

Output: experiments/repaint_trajectory_probe.json (+ compact printout).
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--checkpoint", default="experiments/si_2x2x2_round2_checkpoint"
    )
    parser.add_argument("--data", default="data/si_diffusion_2x2x2")
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--correctors", type=int, default=3)
    parser.add_argument("--noise_temperature", type=float, default=1.21)
    parser.add_argument("--sigma_window", type=float, default=0.02)
    parser.add_argument("--repaint_atoms", type=int, default=8)
    parser.add_argument("--samples", type=int, default=2)
    parser.add_argument("--force_field", type=float, nargs=2, default=[1.5, 20.0])
    parser.add_argument("--out",
                        default="experiments/repaint_trajectory_probe.json")
    args = parser.parse_args(argv)

    import jax
    import pandas as pd

    from _ff_partial import wrap_force_field
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.constrained_langevin_generator import (
        ConstrainedLangevinGenerator,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.sampling_constraint import (
        SamplingConstraint,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    enable_persistent_compilation_cache()

    table = pd.read_parquet(
        sorted(glob.glob(os.path.join(args.data, "valid_run_*.parquet")))[0]
    )
    frame = np.asarray(table["relative_coordinates"].iloc[0]).reshape(-1, 3)
    natoms = frame.shape[0]
    center = int(np.argmin(np.linalg.norm(
        (frame - 0.5) - np.round(frame - 0.5), axis=-1)))
    d_center = np.linalg.norm(
        ((frame - frame[center]) - np.round(frame - frame[center])) * 10.86,
        axis=-1,
    )
    region = np.argsort(d_center)[: args.repaint_atoms]
    keep = np.setdiff1d(np.arange(natoms), region)

    axl_network = load_axl_network_from_checkpoint(args.checkpoint, prefer="last")
    axl_network = wrap_force_field(
        axl_network, args.force_field[0], args.force_field[1]
    )

    noise_parameters = NoiseParameters(
        total_time_steps=args.steps, schedule_type="linear",
        sigma_min=1e-4, sigma_max=0.2,
        corrector_step_epsilon=2.5e-8,
    )

    def build(constrained):
        sampling_parameters = PredictorCorrectorSamplingParameters(
            num_atom_types=1,
            number_of_atoms=natoms,
            number_of_samples=args.samples,
            number_of_corrector_steps=args.correctors,
            noise_temperature=args.noise_temperature,
            temperature_sigma_max=args.sigma_window,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[10.86] * 3,
            record_samples=True,
        )
        if not constrained:
            return LangevinGenerator(
                noise_parameters, sampling_parameters, axl_network
            )
        constraint = SamplingConstraint(
            elements=["Si"],
            constrained_relative_coordinates=frame[keep].astype(np.float32),
            constrained_atom_types=np.zeros(len(keep), np.int32),
            constrained_indices=keep.astype(np.int32),
        )
        return ConstrainedLangevinGenerator(
            noise_parameters, sampling_parameters, axl_network, constraint
        )

    report = {"region": region.tolist(), "phases": {}}
    for name, constrained in (("free", False), ("constrained", True)):
        generator = build(constrained)
        samples = generator.sample(jax.random.PRNGKey(7), args.samples)
        jax.block_until_ready(samples.X)
        records = generator.sample_trajectory_recorder.data["predictor_step"][-1]
        scores = np.asarray(records.model_predictions_i.X)  # [T, B, N, 3]
        comps = np.asarray(records.composition_im1.X)
        masks = np.asarray(records.composition_im1.A)  # [T, B, N]
        T = scores.shape[0]
        phases = {}
        for lo, hi, label in ((0, T // 4, "early"),
                              (T // 4, 3 * T // 4, "mid"),
                              (3 * T // 4, T, "late")):
            sl = slice(lo, hi)
            free_norm = float(
                np.linalg.norm(scores[sl][:, :, region], axis=-1).mean()
            ) if len(region) else None
            kept_norm = float(
                np.linalg.norm(scores[sl][:, :, keep], axis=-1).mean()
            )
            drift = comps[sl][1:, :, region] - comps[sl][:-1, :, region]
            drift -= np.round(drift)
            free_drift = float(
                np.abs(drift).mean()
            ) if len(region) else None
            phases[label] = {
                "free_slot_score_norm": free_norm,
                "constrained_slot_score_norm": kept_norm,
                "free_slot_step_drift": free_drift,
                "mask_fraction": float((masks[sl] == 1).mean()),
            }
        report["phases"][name] = phases
        print(name, json.dumps(phases, indent=1), flush=True)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
