"""Evaluate the two-species SiGe checkpoint: D3PM atom-type quality.

Measures what the atom-type diffusion actually has to get right on
zincblende SiGe: per-sample stoichiometry (4 Si + 4 Ge), chemical ordering
(every nearest-neighbor bond is Si-Ge in the zincblende ground state), and
the SW energy distribution vs the MD data.

Usage: python experiments/eval_sige.py --checkpoint out/sige_1x1x1 [--samples 64]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELL = [5.543, 5.543, 5.543]
NATOMS = 8


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--data", default="data/sige_diffusion_1x1x1")
    parser.add_argument("--samples", type=int, default=64)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--seed", type=int, default=3)
    parser.add_argument("--prefer", default="last")
    parser.add_argument("--correctors", type=int, default=3)
    parser.add_argument("--noise_temperature", type=float, default=1.22,
                        help="calibrate per system with experiments/probe_reheat.py")
    parser.add_argument("--temperature_sigma_max", type=float, default=0.02)
    parser.add_argument("--natoms", type=int, default=8,
                        help="atoms per sample (8 = 1x1x1, 64 = 2x2x2)")
    parser.add_argument("--cell", type=float, nargs=3,
                        default=[5.543, 5.543, 5.543])
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    global NATOMS, CELL
    NATOMS = args.natoms
    CELL = list(args.cell)

    import jax
    import pandas as pd
    from scipy.stats import ks_2samp

    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
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
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    axl_network = load_axl_network_from_checkpoint(args.checkpoint, prefer=args.prefer)
    # Chunk at 64 samples: reuses one compiled program per chunk (the same
    # shape the reheat probe and training validation compile) instead of a
    # fresh batch-256 compile.
    chunk = min(64, args.samples)
    generator = LangevinGenerator(
        NoiseParameters(
            total_time_steps=args.steps,
            schedule_type="linear",
            sigma_min=1e-4,
            sigma_max=0.2,
            corrector_step_epsilon=2.5e-8,
        ),
        PredictorCorrectorSamplingParameters(
            num_atom_types=2,
            number_of_atoms=NATOMS,
            number_of_samples=chunk,
            number_of_corrector_steps=args.correctors,
            noise_temperature=args.noise_temperature,
            temperature_sigma_max=args.temperature_sigma_max,
            use_fixed_lattice_parameters=True,
            cell_dimensions=CELL,
        ),
        axl_network,
    )
    key = jax.random.PRNGKey(args.seed)
    pieces = []
    remaining = args.samples
    while remaining > 0:
        key, sub = jax.random.split(key)
        pieces.append(generator.sample(sub, chunk))
        remaining -= chunk
    samples = pieces[0]._replace(
        A=np.concatenate([np.asarray(p.A) for p in pieces])[: args.samples],
        X=np.concatenate([np.asarray(p.X) for p in pieces])[: args.samples],
        L=np.concatenate([np.asarray(p.L) for p in pieces])[: args.samples],
    )
    types = np.asarray(samples.A)
    x = np.asarray(samples.X)

    # Stoichiometry: ids are Ge=0, Si=1 (sorted-element convention).
    si_counts = types.sum(axis=1)
    # Chemical ordering: fraction of nearest-neighbor (< 2.8 A) bonds that
    # are unlike-species; 1.0 in perfect zincblende.
    delta = x[:, :, None, :] - x[:, None, :, :]
    delta -= np.round(delta)
    dist = np.linalg.norm(delta * np.asarray(CELL), axis=-1)
    near = (dist > 1e-6) & (dist < 2.8)
    unlike = types[:, :, None] != types[:, None, :]
    ordering = (near & unlike).sum() / max(near.sum(), 1)

    # Oracle species follow the list order; ids are ElementTypes-sorted
    # (Ge = 0, Si = 1) so the list must be sorted too.
    oracle = StillingerWeberOracle(
        StillingerWeberParameters(
            name="stillinger_weber",
            sw_coeff_filename=resolve_sw_coefficients_path("SiGe.sw"),
            elements=["Ge", "Si"],
        )
    )
    energies, _ = oracle.compute_oracle_energies_and_forces(samples)
    energies = np.asarray(energies)

    reference = pd.concat(
        [pd.read_parquet(p) for p in sorted(
            glob.glob(os.path.join(args.data, "valid_run_*.parquet"))
        )]
    )["potential_energy"].to_numpy()

    ks = ks_2samp(energies, reference)
    result = {
        "samples": args.samples,
        "natoms": NATOMS,
        "noise_temperature": args.noise_temperature,
        "temperature_sigma_max": args.temperature_sigma_max,
        "fraction_correct_stoichiometry": float(np.mean(si_counts == NATOMS // 2)),
        "mean_si_count": float(si_counts.mean()),
        "nearest_neighbor_unlike_fraction": float(ordering),
        "energy_per_atom_median": float(np.median(energies) / NATOMS),
        "energy_per_atom_data": float(reference.mean() / NATOMS),
        "ks_energy": float(ks.statistic),
        "ks_energy_pvalue": float(ks.pvalue),
    }
    print(json.dumps(result))
    out = args.out or os.path.join(args.checkpoint, "eval_sige.json")
    json.dump(result, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
