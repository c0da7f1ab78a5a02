"""Empirical reheat calibration: solve for the windowed noise_temperature.

Round-3 finding (experiments/reheat_si.json): the trained score's *linear*
gain alpha(sigma) is ~1.00 across the freeze-out window, so the harmonic
recursion (sampling/reheat_calibration.py) predicts an unbiased chain —
the observed cold quench (Si 2x2x2: effective ~250 K from 300 K data) is a
*nonlinear* property of the learned score, and the ensemble's response to
the reheat knob tau is itself nonlinear (round 2: tau=1.05 left the mean
energy unmoved, tau=1.20 restored it). Neither the schedule nor a one-shot
linear extrapolation can predict tau.

What does work: measure it. One 64-sample run gives the effective
temperature to a few percent (the median energy is far less noisy than the
n=64 KS statistic), so a bracketing secant search over tau converges in
3-5 sampling runs — versus the full two-dimensional (tau, window) sweeps of
round 2. The effective temperature is read off the harmonic estimator

    T_eff / T_data = (E_med(tau) - E_relaxed) / (E_med(data) - E_relaxed),

with E_relaxed the oracle energy of the per-atom mean-site (ideal) structure
— equipartition makes the potential energy above the minimum linear in T
for a near-harmonic crystal at 300 K, and the chi-square median factor
cancels between numerator and denominator. Medians, not means: a single
near-overlap outlier (+3 eV/atom on an 8-atom cell = +24 eV against a
~0.3 eV thermal scale) drags a mean-based ratio hot by >1 even when the
bulk is cold — exactly the failure observed on the MACE probe
(tau bracketed to 0.33 while the bulk froze).

The window stays at the schedule-derived default 3.5 x mode_std
(sampling/reheat_calibration.py; the empirically stable 0.02 for Si 2x2x2).

Usage (Si 2x2x2 validation — expect tau ~ 1.2, the round-2 sweep optimum):
    python experiments/probe_reheat.py \
        --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
        --data data/si_diffusion_2x2x2 --elements Si --sw Si.sw \
        --cell 10.86 10.86 10.86 --natoms 64 --steps 1000 --correctors 3 \
        --out experiments/reheat_probe_si.json

The reference has no counterpart (its sampler runs fixed reference-default
temperatures: src/diffusion_for_multi_scale_molecular_dynamics/generators/
langevin_generator.py); this automates a beyond-reference fidelity knob.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_generator(args, axl_network, tau, window, num_atom_types):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )

    return LangevinGenerator(
        NoiseParameters(
            total_time_steps=args.steps,
            schedule_type="linear",
            sigma_min=args.sigma_min,
            sigma_max=args.sigma_max,
            corrector_step_epsilon=args.epsilon,
        ),
        PredictorCorrectorSamplingParameters(
            num_atom_types=num_atom_types,
            number_of_atoms=args.natoms,
            number_of_samples=args.samples,
            number_of_corrector_steps=args.correctors,
            noise_temperature=tau,
            temperature_sigma_max=window,
            use_fixed_lattice_parameters=True,
            cell_dimensions=list(args.cell),
        ),
        axl_network,
    )


def select_noise_temperature(probes, refine_floor=0.5):
    """Final (tau, ratio, interpolated) pick from the probe list.

    Default: the probe whose T_eff/T_data sits closest to 1. But when the
    ratio walks off a *cliff* between two adjacent taus (the r3k Si 3x3x3
    probe: 3.55 at tau=0.41 -> 0.084 at tau=0.33) the argmin lands on the
    frozen side and the eval samples cold. If the best probe is still off
    by more than `refine_floor` and the probes bracket ratio=1, return the
    regula-falsi interpolation of the *tightest* bracket instead — an
    unverified but far better tau than either cliff edge (flagged
    interpolated=True, ratio=None).
    """
    best = min(probes, key=lambda p: abs(p["t_eff_over_t_data"] - 1.0))
    tau_b, r_b = float(best["tau"]), float(best["t_eff_over_t_data"])
    if abs(r_b - 1.0) <= refine_floor:
        return tau_b, r_b, False
    hot = [p for p in probes if p["t_eff_over_t_data"] > 1.0]
    cold = [p for p in probes if p["t_eff_over_t_data"] < 1.0]
    if not hot or not cold:
        return tau_b, r_b, False
    hi = min(hot, key=lambda p: p["tau"])  # coldest still-hot probe
    lo = max(cold, key=lambda p: p["tau"])  # hottest already-cold probe
    lo_t, lo_r = float(lo["tau"]), float(lo["t_eff_over_t_data"])
    hi_t, hi_r = float(hi["tau"]), float(hi["t_eff_over_t_data"])
    if lo_t >= hi_t:  # non-monotone ratio; no trustworthy bracket
        return tau_b, r_b, False
    tau = lo_t + (1.0 - lo_r) * (hi_t - lo_t) / (hi_r - lo_r)
    return float(tau), None, True


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--prefer", default="last")
    parser.add_argument("--data", required=True)
    parser.add_argument("--elements", nargs="+", default=["Si"])
    parser.add_argument("--sw", default="Si.sw")
    parser.add_argument("--cell", type=float, nargs="+", default=[10.86] * 3)
    parser.add_argument("--natoms", type=int, default=64)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--sigma_min", type=float, default=1e-4)
    parser.add_argument("--sigma_max", type=float, default=0.2)
    parser.add_argument("--epsilon", type=float, default=2.5e-8)
    parser.add_argument("--correctors", type=int, default=3)
    parser.add_argument("--samples", type=int, default=64)
    parser.add_argument(
        "--batch", type=int, default=None,
        help="sampling chunk size (VMEM guard: the fused EGNN forward is "
        "validated at batch 16 for N=216; larger batches can fault the "
        "worker at that size). Default: all samples in one batch.",
    )
    parser.add_argument("--window", type=float, default=None,
                        help="temperature_sigma_max; default 3.5 x mode_std")
    parser.add_argument("--tau_max", type=float, default=2.0)
    parser.add_argument("--tolerance", type=float, default=0.04,
                        help="stop when |T_eff/T_data - 1| is below this")
    parser.add_argument("--max_probes", type=int, default=6)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--out", default=None)
    parser.add_argument(
        "--force_field", type=float, nargs=2, default=None,
        metavar=("RADIAL_CUTOFF", "STRENGTH"),
        help="calibrate with the production repulsive wrapper (e.g. 1.5 20.0) "
        "so the probed tau matches the eventual sampling configuration",
    )
    args = parser.parse_args(argv)

    import jax
    import pandas as pd

    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
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

    # --- data side: mean energy, relaxed (mean-site) energy, mode_std ---
    paths = sorted(glob.glob(os.path.join(args.data, "valid_run_*.parquet")))
    tables = [pd.read_parquet(p) for p in paths]
    data_energies = np.concatenate(
        [t["potential_energy"].to_numpy() for t in tables]
    )
    frame_table = tables[0]
    coordinates = np.stack(
        [np.asarray(row).reshape(-1, 3) for row in frame_table["relative_coordinates"]]
    )
    elements = frame_table["element"].iloc[0]
    unique = sorted(set(elements))
    atom_types = np.asarray([unique.index(e) for e in elements], np.int32)
    mode_std = measured_mode_std(coordinates)
    window = args.window if args.window is not None else 3.5 * mode_std

    # Oracle species follow the list order; atom-type ids (both the data's
    # and the sampler's) follow the ElementTypes sorted convention.
    oracle = StillingerWeberOracle(
        StillingerWeberParameters(
            name="stillinger_weber",
            sw_coeff_filename=resolve_sw_coefficients_path(args.sw),
            elements=sorted(args.elements),
        )
    )
    lattice = np.asarray(list(args.cell) + [0.0] * 3, np.float32)

    angles = np.exp(2j * np.pi * coordinates.astype(np.float64))
    mean_site = (np.angle(angles.mean(axis=0)) / (2.0 * np.pi)) % 1.0
    ideal = AXL(
        A=atom_types[None],
        X=mean_site[None].astype(np.float32),
        L=lattice[None],
    )
    e_relaxed = float(
        np.asarray(oracle.compute_oracle_energies_and_forces(ideal)[0])[0]
    )
    e_data = float(np.median(data_energies))
    print(
        f"mode_std={mode_std:.5f} window={window:.4f} "
        f"E_data(median)={e_data:.4f} E_relaxed={e_relaxed:.4f}",
        flush=True,
    )
    assert e_data > e_relaxed, "data median energy must sit above the relaxed minimum"

    axl_network = load_axl_network_from_checkpoint(args.checkpoint, prefer=args.prefer)
    if args.force_field is not None:
        # Keeps the params-as-jit-arguments fast path (the probe compiles
        # one program per tau; the closure path would lower each with the
        # full weight set baked in as literals).
        from _ff_partial import wrap_force_field

        axl_network = wrap_force_field(
            axl_network, args.force_field[0], args.force_field[1]
        )
    num_atom_types = len(args.elements)

    key = jax.random.PRNGKey(args.seed)
    probes = []

    def t_ratio(tau):
        nonlocal key
        generator = build_generator(args, axl_network, tau, window, num_atom_types)
        # Chunked sampling caps batch x N^2 at the validated 16 x 216^2
        # working set. Root cause of the original batch-32 fault at N=216:
        # the *dense* EGCL path's 2^31-byte edge concat
        # (experiments/buffer_audit.py); fused-path checkpoints can likely
        # raise this after a hardware check.
        vmem_guard = max(
            8, min(64, (16 * 216 * 216) // max(args.natoms * args.natoms, 1))
        )
        chunk = min(args.batch or vmem_guard, args.samples)
        pieces = []
        remaining = args.samples
        while remaining > 0:
            key, sub = jax.random.split(key)
            samples = generator.sample(sub, min(chunk, remaining))
            pieces.append(
                np.asarray(oracle.compute_oracle_energies_and_forces(samples)[0])
            )
            remaining -= chunk
        energies = np.concatenate(pieces)
        ratio = (np.median(energies) - e_relaxed) / (e_data - e_relaxed)
        probe = {
            "tau": float(tau),
            "energy_mean": float(energies.mean()),
            "energy_median": float(np.median(energies)),
            "energy_std": float(energies.std()),
            "t_eff_over_t_data": float(ratio),
        }
        probes.append(probe)
        print(json.dumps(probe), flush=True)
        return float(ratio)

    # --- bracket (up or down), then regula falsi on T_eff(tau) - 1 ---
    # The geometric ladder keeps a *sliding* bracket (each step the previous
    # point becomes the opposite endpoint — the r3k Si 3x3x3 probe kept
    # hi at tau=1 while walking lo down to the cliff, so regula falsi had a
    # 0.33..1.0 bracket instead of the tight 0.33..0.41 one) and reserves
    # two probes of the budget for the refinement stage.
    ladder_budget = max(2, args.max_probes - 2)
    lo_tau, lo_r = 1.0, t_ratio(1.0)
    best = (lo_tau, lo_r)
    if abs(lo_r - 1.0) > args.tolerance:
        hi_tau, hi_r = lo_tau, lo_r
        if lo_r < 1.0:  # quenched at tau=1: search hotter
            while hi_r < 1.0 and hi_tau < args.tau_max and len(probes) < ladder_budget:
                lo_tau, lo_r = hi_tau, hi_r
                hi_tau = min(hi_tau * 1.3, args.tau_max)
                hi_r = t_ratio(hi_tau)
        else:  # already hot at tau=1: search colder
            while lo_r > 1.0 and lo_tau > 0.3 and len(probes) < ladder_budget:
                hi_tau, hi_r = lo_tau, lo_r
                lo_tau = max(lo_tau * 0.8, 0.3)
                lo_r = t_ratio(lo_tau)
            if abs(lo_r - 1.0) < abs(best[1] - 1.0):
                best = (lo_tau, lo_r)
        if abs(hi_r - 1.0) < abs(best[1] - 1.0):
            best = (hi_tau, hi_r)
        while (
            abs(best[1] - 1.0) > args.tolerance
            and len(probes) < args.max_probes
            and hi_r > 1.0 > lo_r
        ):
            mid_tau = lo_tau + (1.0 - lo_r) * (hi_tau - lo_tau) / (hi_r - lo_r)
            # Keep the secant point strictly inside the bracket; the inset
            # shrinks with the bracket so a narrow bracket is never inverted.
            inset = min(0.02, 0.25 * (hi_tau - lo_tau))
            mid_tau = min(max(mid_tau, lo_tau + inset), hi_tau - inset)
            mid_r = t_ratio(mid_tau)
            if abs(mid_r - 1.0) < abs(best[1] - 1.0):
                best = (mid_tau, mid_r)
            if mid_r < 1.0:
                lo_tau, lo_r = mid_tau, mid_r
            else:
                hi_tau, hi_r = mid_tau, mid_r

    # Final pick over *every* probe: argmin of |T_eff/T_data - 1|, except
    # when the argmin is still far off (>50%) and the probes bracket 1 —
    # then interpolate the tightest bracket (cliff case; see
    # select_noise_temperature).
    final_tau, final_r, interpolated = select_noise_temperature(probes)
    # An interpolated tau is unverified; spend up to two extra probes
    # measuring it so the emitted final_t_eff_over_t_data is always a real
    # number (round-3 advisor: downstream consumers expect the float
    # schema). Each verification lands in `probes`, so re-selection either
    # adopts the measured point or tightens the bracket once more.
    verification_budget = 2
    while interpolated and verification_budget > 0:
        verification_budget -= 1
        t_ratio(final_tau)
        final_tau, final_r, interpolated = select_noise_temperature(probes)
    if final_r is None:
        # Both verifications re-interpolated (pathological cliff): report
        # the measured probe closest to the final tau rather than null.
        nearest = min(probes, key=lambda p: abs(p["tau"] - final_tau))
        final_r = float(nearest["t_eff_over_t_data"])
    best = (final_tau, final_r)

    result = {
        "checkpoint": args.checkpoint,
        "prefer": args.prefer,
        "correctors": args.correctors,
        "samples_per_probe": args.samples,
        "mode_std": mode_std,
        "temperature_sigma_max": float(window),
        "force_field": args.force_field,
        "energy_median_data": e_data,
        "energy_relaxed": e_relaxed,
        "probes": probes,
        "noise_temperature": float(best[0]),
        "final_t_eff_over_t_data": (
            None if best[1] is None else float(best[1])
        ),
        "interpolated": bool(interpolated),
    }
    print(json.dumps(result, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
