"""Evaluate a trained checkpoint: sampler sweep + SW-energy/structure KS.

For each sweep entry, generates samples with the requested sampler settings,
scores them with the native Stillinger-Weber oracle, and computes the
two-sample KS distance against the reference (validation) energy and
pair-distance distributions — the exact metrics of the reference's
validation loop (axl_diffusion_lightning_model.py:599-651). Results append
to a JSON file for the round write-up.

Usage:
    python experiments/eval_checkpoint.py --checkpoint out/si_2x2x2_round2 \
        --data data/si_diffusion_2x2x2 --samples 64 --sweep default
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELL = [10.86, 10.86, 10.86]
NATOMS = 64


def load_reference_distributions(data_directory, max_frames=2000):
    """Validation-set energies (eV) and pair distances from the parquet data."""
    import glob

    import pandas as pd

    frames = []
    for path in sorted(glob.glob(os.path.join(data_directory, "valid_run_*.parquet"))):
        frames.append(pd.read_parquet(path))
    data = pd.concat(frames).head(max_frames)
    energies = data["potential_energy"].to_numpy()
    coordinates = np.stack(
        [row.reshape(-1, 3) for row in data["relative_coordinates"].head(256)]
    )
    return energies, coordinates


def pair_distances(relative_coordinates, cell, max_distance=5.0):
    """Min-image pair distances below max_distance (the structure metric)."""
    delta = relative_coordinates[:, :, None, :] - relative_coordinates[:, None, :, :]
    delta -= np.round(delta)
    distances = np.linalg.norm(delta * np.asarray(cell), axis=-1)
    natoms = relative_coordinates.shape[1]
    mask = ~np.eye(natoms, dtype=bool)
    values = distances[:, mask].ravel()
    return values[values < max_distance]


def evaluate(axl_network, oracle, reference_energies, reference_distances, spec, key):
    """Generate + score one sweep entry; returns a result dict."""
    import jax
    from scipy.stats import ks_2samp

    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        AdaptiveCorrectorGenerator,
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.ode_position_generator import (
        ExplodingVarianceODEAXLGenerator,
        ODESamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )

    noise_parameters = NoiseParameters(
        total_time_steps=spec.get("steps", 1000),
        schedule_type="linear",
        sigma_min=1e-4,
        sigma_max=0.2,
        corrector_step_epsilon=spec.get("epsilon", 2.5e-8),
        corrector_r=spec.get("corrector_r", 0.17),
    )
    common = dict(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        number_of_samples=spec["samples"],
        use_fixed_lattice_parameters=True,
        cell_dimensions=CELL,
        record_samples=False,
    )
    algorithm = spec.get("algorithm", "predictor_corrector")
    if algorithm == "ode":
        generator = ExplodingVarianceODEAXLGenerator(
            noise_parameters,
            ODESamplingParameters(algorithm="ode", **common),
            axl_network,
        )
    elif algorithm == "sde":
        from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.sde_position_generator import (
            ExplodingVarianceSDEPositionGenerator,
            SDESamplingParameters,
        )

        generator = ExplodingVarianceSDEPositionGenerator(
            noise_parameters,
            SDESamplingParameters(algorithm="sde", **common),
            axl_network,
        )
    else:
        sampling_parameters = PredictorCorrectorSamplingParameters(
            algorithm=algorithm,
            number_of_corrector_steps=spec.get("correctors", 2),
            corrector_temperature=spec.get("temperature", 1.0),
            noise_temperature=spec.get("noise_temperature", 1.0),
            temperature_sigma_max=spec.get("sigma_window", float("inf")),
            adaptive_corrector_max_length_over_sigma=spec.get("adaptive_cap", 4.0),
            adaptive_corrector_mode_std=spec.get("adaptive_mode_std", 0.0),
            **common,
        )
        cls = (
            AdaptiveCorrectorGenerator
            if algorithm == "adaptive_corrector"
            else LangevinGenerator
        )
        generator = cls(noise_parameters, sampling_parameters, axl_network)

    import jax as _jax

    # Default chunk caps batch x N^2 pair blocks at the validated
    # 16 x 216^2 working set. Root cause of the original batch-32 fault at
    # N=216: the *dense* EGCL path's (B, 216, 216, 513) f32 edge concat
    # crosses the 2^31-byte buffer limit (experiments/buffer_audit.py) —
    # fused-path checkpoints can likely raise this after a hardware check.
    vmem_guard = max(8, min(64, (16 * 216 * 216) // max(NATOMS * NATOMS, 1)))
    chunk = min(spec.get("batch", vmem_guard), spec["samples"])

    # Two-phase corrector schedule (round 5): cheap correctors down to the
    # freeze-out window (sigma <= phase2_sigma_threshold), then a second
    # generator sharing the network with a large corrector budget below it.
    # Targets the Si 3x3x3 defect tail at a fraction of uniform-c8 cost.
    phase2_correctors = spec.get("phase2_correctors")
    generator2 = None
    switch_index = None
    if phase2_correctors and hasattr(generator, "sample_window"):
        import dataclasses as _dc

        import numpy as _np

        sigma_table = _np.asarray(generator.schedule.noise.sigma)
        threshold = spec.get("phase2_sigma_threshold", 0.02)
        # One-based switch index: phase 1 covers (total, switch], phase 2
        # covers (switch, 0] — together exactly the full trajectory.
        switch_index = int(_np.searchsorted(sigma_table, threshold))
        generator2 = LangevinGenerator(
            noise_parameters,
            _dc.replace(
                sampling_parameters, number_of_corrector_steps=phase2_correctors
            ),
            axl_network,
        )

    pieces = []
    t0 = time.time()
    remaining = spec["samples"]
    while remaining > 0:
        key, sub = _jax.random.split(key)
        if generator2 is not None:
            key_init, key_p1, key_p2 = _jax.random.split(sub, 3)
            composition = generator.initialize(key_init, chunk)
            composition = generator.sample_window(
                key_p1, composition, spec.get("steps", 1000), switch_index
            )
            pieces.append(
                generator2.sample_window(key_p2, composition, switch_index, 0)
            )
        else:
            pieces.append(generator.sample(sub, chunk))
        _jax.block_until_ready(pieces[-1].X)
        remaining -= chunk
    elapsed = time.time() - t0
    import jax.numpy as _jnp

    # Chunks are drawn full-size (one compiled program); truncate the
    # concatenation so exactly spec["samples"] structures are evaluated.
    n = spec["samples"]
    samples = pieces[0]._replace(
        A=_jnp.concatenate([p.A for p in pieces])[:n],
        X=_jnp.concatenate([p.X for p in pieces])[:n],
        L=_jnp.concatenate([p.L for p in pieces])[:n],
    )

    energies, _ = oracle.compute_oracle_energies_and_forces(samples)
    energies = np.asarray(energies)
    sample_distances = pair_distances(np.asarray(samples.X), CELL)

    ks_energy = ks_2samp(energies, reference_energies)
    ks_structure = ks_2samp(sample_distances, reference_distances)
    per_atom = energies / NATOMS
    result = {
        **spec,
        "seconds": round(elapsed, 2),
        "energy_per_atom_median": float(np.median(per_atom)),
        "energy_per_atom_mean": float(np.mean(per_atom)),
        "energy_per_atom_std": float(np.std(per_atom)),
        "fraction_above_-3eV": float(np.mean(per_atom > -3.0)),
        "ks_energy": float(ks_energy.statistic),
        "ks_energy_pvalue": float(ks_energy.pvalue),
        "ks_structure": float(ks_structure.statistic),
    }
    return result


SWEEPS = {
    "default": [
        {"name": "pc_2corr", "correctors": 2, "samples": 64},
        {"name": "pc_3corr", "correctors": 3, "samples": 64},
        {"name": "pc_4corr", "correctors": 4, "samples": 64},
        {"name": "pc_2corr_eps5e-8", "correctors": 2, "epsilon": 5e-8, "samples": 64},
        {"name": "pc_3corr_eps1.2e-8", "correctors": 3, "epsilon": 1.25e-8, "samples": 64},
        {"name": "ode", "algorithm": "ode", "samples": 64},
        {
            "name": "adaptive_r0.017",
            "algorithm": "adaptive_corrector",
            "correctors": 2,
            "corrector_r": 0.017,
            "samples": 64,
        },
        # Corrector reheating: repeated correctors quench the ensemble below
        # the thermal width; T > 1 widens it back (beyond-reference knob).
        {"name": "pc_3corr_T1.05", "correctors": 3, "temperature": 1.05,
         "samples": 64},
        {"name": "pc_4corr_T1.1", "correctors": 4, "temperature": 1.1,
         "samples": 64},
        {"name": "pc_4corr_T1.05", "correctors": 4, "temperature": 1.05,
         "samples": 64},
    ],
    # Windowed reheating: warm only the freeze-out window (sigma below the
    # thermal displacement scale) so early steps stay outlier-free.
    "reheat": [
        {"name": "w0.02_T1.05_3c", "correctors": 3, "noise_temperature": 1.05,
         "sigma_window": 0.02, "samples": 64},
        {"name": "w0.02_T1.10_3c", "correctors": 3, "noise_temperature": 1.10,
         "sigma_window": 0.02, "samples": 64},
        {"name": "w0.02_T1.15_3c", "correctors": 3, "noise_temperature": 1.15,
         "sigma_window": 0.02, "samples": 64},
        {"name": "w0.05_T1.10_3c", "correctors": 3, "noise_temperature": 1.10,
         "sigma_window": 0.05, "samples": 64},
        {"name": "w0.01_T1.10_3c", "correctors": 3, "noise_temperature": 1.10,
         "sigma_window": 0.01, "samples": 64},
        {"name": "w0.02_T1.10_2c", "correctors": 2, "noise_temperature": 1.10,
         "sigma_window": 0.02, "samples": 64},
    ],
    "reheat2": [
        {"name": "w0.02_T1.20_3c", "correctors": 3, "noise_temperature": 1.20,
         "sigma_window": 0.02, "samples": 64},
        {"name": "w0.02_T1.25_3c", "correctors": 3, "noise_temperature": 1.25,
         "sigma_window": 0.02, "samples": 64},
        {"name": "w0.02_T1.30_3c", "correctors": 3, "noise_temperature": 1.30,
         "sigma_window": 0.02, "samples": 64},
        {"name": "w0.03_T1.20_3c", "correctors": 3, "noise_temperature": 1.20,
         "sigma_window": 0.03, "samples": 64},
    ],
    "final": [
        {"name": "w0.02_T1.21_3c_256", "correctors": 3, "noise_temperature": 1.21,
         "sigma_window": 0.02, "samples": 256},
        {"name": "w0.02_T1.22_3c_256", "correctors": 3, "noise_temperature": 1.22,
         "sigma_window": 0.02, "samples": 256},
    ],
    # VERDICT round-3 #7: the adaptive corrector and the ODE sampler on the
    # production system. Round 1/2 found both unusable at reference defaults
    # (+3.5 eV/atom); the adaptive guard (predictor_corrector_axl_generator.py
    # adaptive_corrector_max_length_over_sigma, mode_std from the Si 2x2x2
    # data) caps the score-derived step length at a multiple of its
    # exact-harmonic-score value.
    "round3_samplers": [
        {"name": "adaptive_r0.17_guarded", "algorithm": "adaptive_corrector",
         "correctors": 2, "corrector_r": 0.17, "adaptive_mode_std": 0.0058,
         "samples": 64},
        {"name": "adaptive_r0.05_guarded", "algorithm": "adaptive_corrector",
         "correctors": 2, "corrector_r": 0.05, "adaptive_mode_std": 0.0058,
         "samples": 64},
        {"name": "adaptive_r0.17_guard_reheat", "algorithm": "adaptive_corrector",
         "correctors": 2, "corrector_r": 0.17, "adaptive_mode_std": 0.0058,
         "noise_temperature": 1.22, "sigma_window": 0.02, "samples": 64},
        {"name": "adaptive_r0.17_unguarded", "algorithm": "adaptive_corrector",
         "correctors": 2, "corrector_r": 0.17, "adaptive_cap": 0.0,
         "samples": 64},
        {"name": "ode_1000", "algorithm": "ode", "samples": 64},
        {"name": "sde_1000", "algorithm": "sde", "samples": 64},
    ],
    # VERDICT round-3 #7 follow-through: the exact-score convergence study
    # (tests/test_sampling_fidelity.py) found corrector-only transport needs
    # >= 5 substeps per level; this tests that threshold on the production
    # learned score, guarded and reheated.
    "adaptive5": [
        {"name": "adaptive_r0.17_5c_guarded", "algorithm": "adaptive_corrector",
         "correctors": 5, "corrector_r": 0.17, "adaptive_mode_std": 0.0058,
         "samples": 64},
        {"name": "adaptive_r0.17_5c_guard_reheat", "algorithm": "adaptive_corrector",
         "correctors": 5, "corrector_r": 0.17, "adaptive_mode_std": 0.0058,
         "noise_temperature": 1.22, "sigma_window": 0.02, "samples": 64},
    ],
    # Parameterized from the CLI (--noise_temperature/--sigma_window/...);
    # the single entry the reheat-probe -> final-eval chain fills in.
    "custom": [
        {"name": "custom", "samples": 64},
    ],
}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--data", default="data/si_diffusion_2x2x2")
    parser.add_argument("--sweep", default="default")
    parser.add_argument("--entries", default=None, help="comma-separated names")
    parser.add_argument("--prefer", default="best")
    parser.add_argument("--output", default=None)
    parser.add_argument("--seed", type=int, default=777)
    parser.add_argument("--natoms", type=int, default=64,
                        help="atoms per sample (64 = Si 2x2x2, 216 = 3x3x3)")
    parser.add_argument("--cell", type=float, nargs=3,
                        default=[10.86, 10.86, 10.86])
    # Sweep-entry overrides, applied to every entry of the selected sweep
    # (used with --sweep custom by the probe -> eval chains).
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--samples", type=int, default=None)
    parser.add_argument("--correctors", type=int, default=None)
    parser.add_argument(
        "--batch", type=int, default=None,
        help="sampling chunk size (VMEM guard: the fused EGNN forward is "
        "validated at batch 16 for N=216; larger batches can fault the "
        "worker at that size)",
    )
    parser.add_argument("--noise_temperature", type=float, default=None)
    parser.add_argument("--sigma_window", type=float, default=None)
    parser.add_argument("--phase2_correctors", type=int, default=None,
                        help="two-phase sampling: corrector substeps below "
                        "phase2_sigma_threshold (phase 1 uses --correctors)")
    parser.add_argument("--phase2_sigma_threshold", type=float, default=None)
    parser.add_argument(
        "--force_field", type=float, nargs=2, default=None,
        metavar=("RADIAL_CUTOFF", "STRENGTH"),
        help="wrap the network with the repulsive pseudo-force used by the "
        "sampling config of record (e.g. 1.5 20.0); off by default",
    )
    args = parser.parse_args(argv)

    global NATOMS, CELL
    NATOMS = args.natoms
    CELL = list(args.cell)

    import jax

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
    if args.force_field is not None:
        # Keeps the params-as-jit-arguments fast path; the plain wrapper
        # would bake every weight into the compiled scan as HLO literals.
        from _ff_partial import wrap_force_field

        axl_network = wrap_force_field(
            axl_network, args.force_field[0], args.force_field[1]
        )
    oracle = StillingerWeberOracle(
        StillingerWeberParameters(
            name="stillinger_weber", sw_coeff_filename=resolve_sw_coefficients_path("Si.sw"),
            elements=["Si"]
        )
    )
    reference_energies, reference_coordinates = load_reference_distributions(args.data)
    reference_distances = pair_distances(reference_coordinates, CELL)
    print(
        f"reference: {len(reference_energies)} frames, "
        f"E/atom mean {reference_energies.mean() / NATOMS:.4f} "
        f"std {reference_energies.std() / NATOMS:.4f}"
    )

    sweep = SWEEPS[args.sweep]
    if args.entries:
        wanted = set(args.entries.split(","))
        sweep = [spec for spec in sweep if spec["name"] in wanted]
    overrides = {
        key: value
        for key, value in (
            ("steps", args.steps),
            ("samples", args.samples),
            ("correctors", args.correctors),
            ("batch", args.batch),
            ("noise_temperature", args.noise_temperature),
            ("sigma_window", args.sigma_window),
            ("phase2_correctors", args.phase2_correctors),
            ("phase2_sigma_threshold", args.phase2_sigma_threshold),
        )
        if value is not None
    }
    if overrides:
        sweep = [{**spec, **overrides} for spec in sweep]
        tag = "_".join(f"{k}={v}" for k, v in sorted(overrides.items()))
        sweep = [
            {**spec, "name": f"{spec['name']}[{tag}]"} for spec in sweep
        ]

    output_path = args.output or os.path.join(
        args.checkpoint, f"eval_{args.sweep}.json"
    )
    results = []
    if os.path.exists(output_path):
        with open(output_path) as fh:
            results = json.load(fh)
    key = jax.random.PRNGKey(args.seed)
    for spec in sweep:
        key, entry_key = jax.random.split(key)
        result = evaluate(
            axl_network, oracle, reference_energies, reference_distances,
            spec, entry_key,
        )
        results.append(result)
        print(json.dumps(result))
        with open(output_path, "w") as fh:
            json.dump(results, fh, indent=1)
    print(f"wrote {output_path}")


if __name__ == "__main__":
    main()
