"""Validate the schedule-derived reheat calibration against a checkpoint.

Measures the trained network's score gain alpha(sigma) on noised validation
frames, feeds it through the harmonic variance recursion
(sampling/reheat_calibration.py), and prints the predicted windowed
noise_temperature — to be compared against the per-system temperature sweep
optimum (Si 2x2x2 round 2: tau ~ 1.21-1.22 in a 0.02 window).

Usage:
    python experiments/calibrate_reheat.py \
        --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
        --data data/si_diffusion_2x2x2 --correctors 3 --out experiments/reheat_si.json
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--prefer", default="last")
    parser.add_argument("--data", required=True)
    parser.add_argument("--correctors", type=int, default=3)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--epsilon", type=float, default=2.5e-8)
    parser.add_argument("--frames", type=int, default=128)
    parser.add_argument("--cell", type=float, nargs="+", default=[10.86] * 3)
    parser.add_argument("--num_atom_types", type=int, default=1)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
        build_noise_schedule,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.sampling.reheat_calibration import (
        calibrate_reheat,
        measured_mode_std,
        measured_score_gain,
        terminal_std_ratio,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    enable_persistent_compilation_cache()

    # --- data: one validation run, consistent atom ordering ---
    paths = sorted(glob.glob(os.path.join(args.data, "valid_run_*.parquet")))
    frame_table = pd.read_parquet(paths[0]).head(args.frames)
    coordinates = np.stack(
        [np.asarray(row).reshape(-1, 3) for row in frame_table["relative_coordinates"]]
    )
    elements = frame_table["element"].iloc[0]
    unique = sorted(set(elements))
    atom_types = np.asarray([unique.index(e) for e in elements], np.int32)
    natoms = coordinates.shape[1]
    mode_std = measured_mode_std(coordinates)
    print(f"mode_std = {mode_std:.5f} ({natoms} atoms)", flush=True)

    axl_network = load_axl_network_from_checkpoint(args.checkpoint, prefer=args.prefer)

    noise_parameters = NoiseParameters(
        total_time_steps=args.steps,
        schedule_type="linear",
        sigma_min=1e-4,
        sigma_max=0.2,
        corrector_step_epsilon=args.epsilon,
    )
    schedule = build_noise_schedule(noise_parameters, num_classes=2)
    sigma_table = np.asarray(schedule.noise.sigma)
    time_table = np.asarray(schedule.noise.time)

    lattice = np.asarray(list(args.cell) + [0.0] * len(args.cell), np.float32)

    # --- measure alpha at sigmas spanning the freeze-out window ---
    probe_sigmas = sorted(
        {
            float(s)
            for s in (
                0.25 * mode_std, 0.5 * mode_std, mode_std, 2 * mode_std,
                3.5 * mode_std, 6 * mode_std, 12 * mode_std,
            )
        }
    )
    key = jax.random.PRNGKey(0)
    points = []
    for target in probe_sigmas:
        index = int(np.abs(sigma_table - target).argmin())
        sigma = float(sigma_table[index])
        t = float(time_table[index])
        key, sub = jax.random.split(key)
        alpha = measured_score_gain(
            axl_network,
            coordinates,
            atom_types=atom_types,
            lattice_parameters=lattice,
            sigma=sigma,
            time=t,
            mode_std=mode_std,
            key=sub,
        )
        points.append({"sigma": sigma, "alpha": float(alpha)})
        print(f"alpha({sigma:.5f}) = {alpha:.4f}", flush=True)

    sig = np.array([p["sigma"] for p in points])
    alp = np.array([p["alpha"] for p in points])

    def score_gain(s):
        return float(np.interp(s, sig, alp))

    quench = terminal_std_ratio(
        noise_parameters, args.correctors, mode_std, score_gain=score_gain
    )
    calibration = calibrate_reheat(
        noise_parameters, args.correctors, mode_std, score_gain=score_gain
    )
    result = {
        "checkpoint": args.checkpoint,
        "prefer": args.prefer,
        "correctors": args.correctors,
        "mode_std": mode_std,
        "alpha_points": points,
        "predicted_quench_std_ratio": quench,
        "predicted_effective_T_over_Tdata": quench**2,
        "predicted_noise_temperature": calibration.noise_temperature,
        "predicted_temperature_sigma_max": calibration.temperature_sigma_max,
    }
    print(json.dumps(result, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
