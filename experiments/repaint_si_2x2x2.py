"""Repaint fidelity gate on the trained Si 2x2x2 production checkpoint.

BASELINE's fidelity gates include "repaint constraint satisfaction (tutorial
notebooks 02/03 scenarios)". The reference demonstrates RePaint with an
*analytical* score on a 2D toy grid (/root/reference/tutorials/repaint_02.ipynb,
excise_and_repaint_03.ipynb); this experiment runs the stronger production
version VERDICT r3 asks for: an excise-and-repaint scenario on the trained
Si 2x2x2 checkpoint, scored with the native Stillinger-Weber oracle.

Scenario (per sample):
  1. Take a thermalized validation frame (64 atoms, 300 K MD data).
  2. Carve the repaint region: a chosen atom plus its (k-1) nearest periodic
     neighbors (default k=8) — these slots are *generated*; the remaining
     56 atoms become the SamplingConstraint (reference flow:
     src/.../generators/constrained_langevin_generator.py:94-165, excisors
     in src/.../active_learning_loop/excisor/).
  3. ConstrainedLangevinGenerator with the production sampling settings
     (1000 steps x 3 correctors, force field (1.5, 20.0), probed
     tau = 1.21 / window 0.02 — experiments/si_2x2x2_round2_eval_final.json).
  4. Score the repainted structures with the SW oracle.

Gates checked (written to experiments/repaint_si_2x2x2.json):
  * exact constraint satisfaction — constrained coordinates and types in
    the output equal the constraint bit-for-bit;
  * energy parity — per-atom SW energies of repainted structures vs the
    validation data distribution (KS + median);
  * structural health — pair-distance KS vs data, plus the minimum
    distance between any repainted atom and any other atom (no overlap /
    void pathology in the healed region).
"""

import argparse
import functools
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CELL = np.asarray([10.86, 10.86, 10.86], np.float64)


def periodic_distances(x, y, cell):
    """Min-image distances between [n,3] and [m,3] fractional coords."""
    delta = x[:, None, :] - y[None, :, :]
    delta -= np.round(delta)
    return np.linalg.norm(delta * cell, axis=-1)


def pair_distances(batch_x, cell, max_distance=5.0):
    delta = batch_x[:, :, None, :] - batch_x[:, None, :, :]
    delta -= np.round(delta)
    d = np.linalg.norm(delta * cell, axis=-1)
    n = batch_x.shape[1]
    mask = ~np.eye(n, dtype=bool)
    values = d[:, mask].ravel()
    return values[values < max_distance]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--checkpoint", default="experiments/si_2x2x2_round2_checkpoint"
    )
    parser.add_argument("--prefer", default="last")
    parser.add_argument("--data", default="data/si_diffusion_2x2x2")
    parser.add_argument("--samples", type=int, default=64)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--repaint_atoms", type=int, default=8,
                        help="region size: central atom + (k-1) neighbors")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--correctors", type=int, default=3)
    parser.add_argument("--noise_temperature", type=float, default=1.21)
    parser.add_argument("--sigma_window", type=float, default=0.02)
    parser.add_argument("--force_field", type=float, nargs=2,
                        default=[1.5, 20.0])
    parser.add_argument("--seed", type=int, default=11)
    parser.add_argument(
        "--resample_steps", type=int, default=0,
        help="RePaint resampling jumps per level (Lugmayr et al. Alg. 2); "
        "0 = the reference's single-overwrite behaviour",
    )
    parser.add_argument(
        "--start_sigma", type=float, default=None,
        help="partial denoising: start from the constraint frame noised to "
        "this sigma instead of full noise — anchors the global registry "
        "the translation-invariant model cannot infer from heavily-noised "
        "constraints",
    )
    parser.add_argument(
        "--region_init", choices=["uniform", "hole", "sites"],
        default="uniform",
        help="with --start_sigma: where the generated slots start. The "
        "VE schedule's sigma_max=0.2 never erases positions, so a "
        "low-sigma score has no information about atoms far from any "
        "site (the r4 score-field probe: cos(score, to-site) is random "
        "at sigma<=0.05). 'hole' seeds them uniformly inside the carved "
        "sphere; 'sites' at the carved sites themselves (pure healing).",
    )
    parser.add_argument("--epsilon", type=float, default=2.5e-8)
    parser.add_argument(
        "--coherent", action="store_true",
        help="repaint_coherent_renoising: one frozen constraint-noise draw "
        "per scan chunk instead of fresh noise every substep (the r4f "
        "ladder's leading suspect is per-step incoherent ~sigma*box jitter "
        "of the 56 constrained neighbors)",
    )
    parser.add_argument("--out", default="experiments/repaint_si_2x2x2.json")
    args = parser.parse_args(argv)

    import jax
    import pandas as pd

    from _ff_partial import wrap_force_field
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.constrained_langevin_generator import (
        ConstrainedLangevinGenerator,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.sampling_constraint import (
        SamplingConstraint,
        write_sampling_constraint,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
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
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    enable_persistent_compilation_cache()

    # --- data: one thermalized frame to carve, full set for distributions ---
    paths = sorted(glob.glob(os.path.join(args.data, "valid_run_*.parquet")))
    tables = [pd.read_parquet(p) for p in paths]
    data_energies = np.concatenate(
        [t["potential_energy"].to_numpy() for t in tables]
    )
    frame_table = tables[0]
    frame = np.asarray(frame_table["relative_coordinates"].iloc[0]).reshape(-1, 3)
    natoms = frame.shape[0]
    data_coordinates = np.stack(
        [np.asarray(r).reshape(-1, 3)
         for r in frame_table["relative_coordinates"].head(256)]
    )
    reference_distances = pair_distances(data_coordinates, CELL)

    # --- carve the repaint region: central atom + nearest neighbors ---
    center_index = int(
        np.argmin(periodic_distances(frame, np.full((1, 3), 0.5), CELL)[:, 0])
    )
    d_center = periodic_distances(frame, frame[center_index][None], CELL)[:, 0]
    region = np.argsort(d_center)[: args.repaint_atoms]  # includes center (d=0)
    keep = np.setdiff1d(np.arange(natoms), region)
    region_radius = float(d_center[region].max()) if len(region) else 0.0
    print(
        f"repaint region: {len(region)} atoms around atom {center_index} "
        f"(max region radius {region_radius:.2f} A); "
        f"{len(keep)} constrained atoms",
        flush=True,
    )

    constraint = SamplingConstraint(
        elements=["Si"],
        constrained_relative_coordinates=frame[keep],
        constrained_atom_types=np.zeros(len(keep), np.int32),
        constrained_indices=keep.astype(np.int32),
    )
    write_sampling_constraint(
        constraint, os.path.splitext(args.out)[0] + "_constraint.pkl"
    )

    axl_network = load_axl_network_from_checkpoint(
        args.checkpoint, prefer=args.prefer
    )
    axl_network = wrap_force_field(
        axl_network, args.force_field[0], args.force_field[1]
    )

    noise_parameters = NoiseParameters(
        total_time_steps=args.steps,
        schedule_type="linear",
        sigma_min=1e-4,
        sigma_max=0.2,
        # Production value (eval_checkpoint.py). The NoiseParameters default
        # 2e-5 is calibrated for the reference's sigma_min=0.005; with
        # sigma_min=1e-4 it tabulates eps ~ 1000 sigma^2 — a divergently
        # unstable corrector that silently wrecked every round-4 repaint
        # run while the k=0 all-constrained control stayed clean (overwritten
        # slots don't feel the dynamics).
        corrector_step_epsilon=args.epsilon,
    )

    def make_generator(chunk_size, chunk_seed):
        sampling_parameters = PredictorCorrectorSamplingParameters(
            num_atom_types=1,
            number_of_atoms=natoms,
            number_of_samples=chunk_size,
            number_of_corrector_steps=args.correctors,
            noise_temperature=args.noise_temperature,
            temperature_sigma_max=args.sigma_window,
            use_fixed_lattice_parameters=True,
            cell_dimensions=CELL.tolist(),
            repaint_resample_steps=args.resample_steps,
            repaint_coherent_renoising=args.coherent,
        )
        trajectory_initializer = None
        if args.start_sigma is not None:
            import tempfile

            from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.trajectory_initializer import (
                StartFromGivenConfigurationTrajectoryInitializer,
                TrajectoryInitializerParameters,
                write_starting_configuration,
            )
            from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
                build_noise_schedule,
            )

            schedule = build_noise_schedule(noise_parameters, 2)
            sigmas = np.asarray(schedule.noise.sigma)
            start_index = int(np.searchsorted(sigmas, args.start_sigma)) + 1
            rng = np.random.RandomState(chunk_seed)
            x0 = np.broadcast_to(frame, (chunk_size, natoms, 3)).copy()
            if args.region_init == "sites":
                pass  # carved sites already in the frame copy
            elif args.region_init == "hole":
                direction = rng.normal(size=(chunk_size, len(region), 3))
                direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
                radius = (
                    region_radius * rng.uniform(
                        size=(chunk_size, len(region), 1)
                    ) ** (1.0 / 3.0)
                )
                x0[:, region] = (
                    frame[center_index][None, None]
                    + direction * radius / CELL[None, None]
                ) % 1.0
            else:
                x0[:, region] = rng.uniform(
                    size=(chunk_size, len(region), 3)
                )
            sigma_eff = sigmas[start_index - 1]
            x_start = (
                x0 + sigma_eff * rng.normal(size=x0.shape)
            ) % 1.0
            start = AXL(
                A=np.zeros((chunk_size, natoms), np.int32),
                X=x_start.astype(np.float32),
                L=np.broadcast_to(
                    np.asarray(CELL.tolist() + [0.0] * 3, np.float32),
                    (chunk_size, 6),
                ),
            )
            with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as fh:
                write_starting_configuration(fh.name, start, start_index)
                path = fh.name
            trajectory_initializer = (
                StartFromGivenConfigurationTrajectoryInitializer(
                    TrajectoryInitializerParameters(
                        num_atom_types=1,
                        number_of_atoms=natoms,
                        use_fixed_lattice_parameters=True,
                        fixed_lattice_parameters=CELL.tolist() + [0.0] * 3,
                        path_to_starting_configuration_data_pickle=path,
                    )
                )
            )
        return ConstrainedLangevinGenerator(
            noise_parameters,
            sampling_parameters,
            axl_network,
            constraint,
            trajectory_initializer=trajectory_initializer,
        )

    oracle = StillingerWeberOracle(
        StillingerWeberParameters(
            name="stillinger_weber",
            sw_coeff_filename=resolve_sw_coefficients_path("Si.sw"),
            elements=["Si"],
        )
    )

    key = jax.random.PRNGKey(args.seed)
    xs, energies = [], []
    t0 = time.perf_counter()
    remaining = args.samples
    chunk_seed = args.seed
    while remaining > 0:
        key, sub = jax.random.split(key)
        n = min(args.batch, remaining)
        chunk_seed += 1
        generator = make_generator(n, chunk_seed)
        samples = generator.sample(sub, n)
        x = np.asarray(samples.X)
        a = np.asarray(samples.A)
        assert (a == 0).all(), "repaint left MASK or wrong atom types"
        xs.append(x)
        energies.append(
            np.asarray(oracle.compute_oracle_energies_and_forces(samples)[0])
        )
        remaining -= n
    seconds = time.perf_counter() - t0
    x = np.concatenate(xs)
    energies = np.concatenate(energies)

    # --- gate 1: exact constraint satisfaction ---
    if len(keep):
        constraint_error = float(
            np.abs(
                x[:, keep, :] - constraint.constrained_relative_coordinates[None]
            ).max()
        )
        assert constraint_error == 0.0, (
            f"constrained coordinates moved by up to {constraint_error}"
        )
    else:  # all-free control (--repaint_atoms == natoms): nothing pinned
        constraint_error = float("nan")

    # --- gate 2: energy parity ---
    from scipy.stats import ks_2samp

    e_atom = energies / natoms
    data_atom = data_energies / natoms
    ks_energy = ks_2samp(e_atom, data_atom)

    # --- gate 3: structural health of the healed region ---
    sample_distances = pair_distances(x, CELL)
    ks_structure = ks_2samp(sample_distances, reference_distances)
    min_repaint_distance = None
    repaint_neighbor_distances = np.asarray([np.nan])
    if len(region):
        min_repaint_distance = np.inf
        repaint_neighbor_distances = []
        for s in range(x.shape[0]):
            d = periodic_distances(x[s, region], x[s], CELL)
            d[np.arange(len(region)), region] = np.inf  # self
            min_repaint_distance = min(min_repaint_distance, float(d.min()))
            repaint_neighbor_distances.append(d.min(axis=1))
        repaint_neighbor_distances = np.concatenate(repaint_neighbor_distances)

    result = {
        "checkpoint": args.checkpoint,
        "prefer": args.prefer,
        "samples": int(args.samples),
        "steps": args.steps,
        "correctors": args.correctors,
        "noise_temperature": args.noise_temperature,
        "sigma_window": args.sigma_window,
        "force_field": list(args.force_field),
        "resample_steps": args.resample_steps,
        "coherent": args.coherent,
        "start_sigma": args.start_sigma,
        "region_init": args.region_init,
        "repaint_region_atoms": int(len(region)),
        "constrained_atoms": int(len(keep)),
        "region_radius_angstrom": region_radius,
        "seconds": round(seconds, 1),
        "constraint_max_abs_error": constraint_error,
        "energy_per_atom_median": float(np.median(e_atom)),
        "energy_per_atom_mean": float(e_atom.mean()),
        "energy_per_atom_std": float(e_atom.std()),
        "data_energy_per_atom_median": float(np.median(data_atom)),
        "ks_energy": float(ks_energy.statistic),
        "ks_energy_pvalue": float(ks_energy.pvalue),
        "ks_structure": float(ks_structure.statistic),
        "min_repaint_distance_angstrom": (
            None if min_repaint_distance is None
            else float(min_repaint_distance)
        ),
        "repaint_nn_distance_median": float(
            np.median(repaint_neighbor_distances)
        ),
        "data_nn_bond_angstrom": 2.35,
    }
    print(json.dumps(result, indent=1), flush=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    np.savez_compressed(
        os.path.splitext(args.out)[0] + "_samples.npz",
        relative_coordinates=x[:8],
        region=region,
        keep=keep,
        frame=frame,
        energies=energies,
    )


if __name__ == "__main__":
    main()
