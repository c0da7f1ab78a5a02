"""Alternative samplers (adaptive corrector, ODE, SDE) on the Si 2x2x2 system.

VERDICT round-3 #7: at the reference-default corrector r=0.17 the adaptive
corrector used to teleport atoms whenever the learned score norm vanished
(the near-uniform large-sigma phase) and produced +3.5 eV/atom garbage on
the production system; the ODE sampler integrated through the same
ill-conditioned region. Round 3 added a harmonic step-length cap
(generators/adaptive_corrector.py) parameterized by the data's thermal
mode_std. This script demonstrates the guarded samplers end to end on the
shipped Si 2x2x2 checkpoint: SW energies of n samples per algorithm,
reported next to the PC baseline from the same checkpoint.

Reference counterparts: src/.../generators/adaptive_corrector.py:17,
ode_position_generator.py:43.

Usage:
    python experiments/eval_alt_samplers.py \
        --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
        --data data/si_diffusion_2x2x2 --samples 32 \
        --out experiments/alt_samplers_si_2x2x2.json
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
    parser.add_argument("--data", default="data/si_diffusion_2x2x2")
    parser.add_argument("--elements", nargs="+", default=["Si"])
    parser.add_argument("--sw", default="Si.sw")
    parser.add_argument("--cell", type=float, nargs="+", default=[10.86] * 3)
    parser.add_argument("--natoms", type=int, default=64)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--samples", type=int, default=32)
    parser.add_argument("--corrector_r", type=float, default=0.17)
    parser.add_argument("--seed", type=int, default=11)
    parser.add_argument("--algorithms", nargs="+",
                        default=["adaptive_corrector", "ode", "sde"])
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    import jax
    import pandas as pd

    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.instantiate_generator import (
        instantiate_generator,
        load_sampling_parameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.energy_oracle_factory import (
        resolve_sw_coefficients_path,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.stillinger_weber import (
        StillingerWeberOracle,
        StillingerWeberParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.sampling.reheat_calibration import (
        measured_mode_std,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    enable_persistent_compilation_cache()

    # Data-side statistics: reference energies and the thermal mode width
    # that parameterizes the adaptive cap.
    paths = sorted(glob.glob(os.path.join(args.data, "valid_run_*.parquet")))
    tables = [pd.read_parquet(p) for p in paths]
    data_energies = np.concatenate(
        [t["potential_energy"].to_numpy() for t in tables]
    )
    coordinates = np.stack(
        [np.asarray(row).reshape(-1, 3)
         for row in tables[0]["relative_coordinates"]]
    )
    mode_std = float(measured_mode_std(coordinates))

    # Sorted to match the ElementTypes atom-type id convention.
    oracle = StillingerWeberOracle(
        StillingerWeberParameters(
            name="stillinger_weber",
            sw_coeff_filename=resolve_sw_coefficients_path(args.sw),
            elements=sorted(args.elements),
        )
    )
    axl_network = load_axl_network_from_checkpoint(
        args.checkpoint, prefer=args.prefer
    )

    noise_parameters = NoiseParameters(
        total_time_steps=args.steps,
        schedule_type="linear",
        sigma_min=1e-4,
        sigma_max=0.2,
        corrector_step_epsilon=2.5e-8,
        corrector_r=args.corrector_r,
    )

    base = dict(
        num_atom_types=len(args.elements),
        number_of_atoms=args.natoms,
        number_of_samples=args.samples,
        use_fixed_lattice_parameters=True,
        cell_dimensions=list(args.cell),
    )
    per_algorithm = {
        "predictor_corrector": dict(number_of_corrector_steps=3),
        "adaptive_corrector": dict(
            number_of_corrector_steps=3,
            adaptive_corrector_mode_std=mode_std,
        ),
        "ode": {},
        "sde": {},
    }

    key = jax.random.PRNGKey(args.seed)
    results = {
        "checkpoint": args.checkpoint,
        "prefer": args.prefer,
        "corrector_r": args.corrector_r,
        "mode_std": mode_std,
        "samples": args.samples,
        "data_energy_per_atom_mean": float(data_energies.mean()) / args.natoms,
        "algorithms": {},
    }
    for algorithm in args.algorithms:
        cfg = dict(algorithm=algorithm, **base, **per_algorithm[algorithm])
        sampling_parameters = load_sampling_parameters(cfg)
        generator = instantiate_generator(
            sampling_parameters, noise_parameters, axl_network
        )
        key, sub = jax.random.split(key)
        samples = generator.sample(sub, args.samples)
        energies = np.asarray(
            oracle.compute_oracle_energies_and_forces(samples)[0]
        ) / args.natoms
        finite = np.isfinite(energies)
        sane = finite & (energies < results["data_energy_per_atom_mean"] + 1.0)
        entry = {
            "energy_per_atom_mean": float(np.mean(energies[finite]))
            if finite.any() else None,
            "energy_per_atom_median": float(np.median(energies[finite]))
            if finite.any() else None,
            "energy_per_atom_std": float(np.std(energies[finite]))
            if finite.any() else None,
            "finite_fraction": float(finite.mean()),
            "within_1eV_of_data_fraction": float(sane.mean()),
        }
        results["algorithms"][algorithm] = entry
        print(algorithm, json.dumps(entry), flush=True)

    print(json.dumps(results, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
