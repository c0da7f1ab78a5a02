"""The committed repaint gate (VERDICT r4 #5): region-level pass/fail.

Round 4 closed the repaint gate narratively (constraints exact, healed
region within ~0.007 eV/atom of the data, bonds at 98% of the data bond,
no overlaps — experiments/repaint_si_2x2x2_coherent_r4g.json) but left no
pinned criterion a regression would trip. This module pins it:

  G1  constraint_max_abs_error == 0            (RePaint overwrite exact)
  G2  |healed-region median E/atom - data| <= 0.010 eV/atom
  G3  repainted-atom nn distance within 3% of the data bond
  G4  no repainted pair closer than 2.0 A      (no overlaps)

Whole-cell energy-KS is deliberately NOT gated: one healed region shifts
every cell's total energy a few data-sigma up, so the KS is large by
construction for inpainting; the region-level metrics carry the signal.

Usage (scripts / queue tails):
    python experiments/repaint_gate.py experiments/repaint_si_2x2x2_coherent_r4g.json
exits 1 if any gate fails. tests/test_repaint_gate.py runs the same checks
over the committed artifacts, so a regenerated-worse artifact turns CI red.

Reference basis: constrained_langevin_generator.py:94-165 there + the
tutorial 02/03 repaint demos (which only ever exercised an analytical toy
score; this gate pins the trained-model, production-scale behaviour the
reference never demonstrated).
"""

import json
import sys

ENERGY_TOLERANCE_EV_PER_ATOM = 0.010
NN_DISTANCE_RELATIVE_TOLERANCE = 0.03
MIN_PAIR_DISTANCE_ANGSTROM = 2.0


def check_repaint_gate(record: dict) -> list:
    """Return the list of gate violations (empty = pass) for one repaint run."""
    violations = []

    constraint_error = record.get("constraint_max_abs_error")
    if constraint_error is None or constraint_error != 0.0:
        violations.append(
            f"G1 constraint overwrite not exact: max |dx| = {constraint_error}"
        )

    median = record.get("energy_per_atom_median")
    data_median = record.get("data_energy_per_atom_median")
    if median is None or data_median is None:
        violations.append("G2 missing energy medians")
    elif abs(median - data_median) > ENERGY_TOLERANCE_EV_PER_ATOM:
        violations.append(
            f"G2 healed-region median E/atom {median:.4f} is "
            f"{abs(median - data_median):.4f} eV/atom from data {data_median:.4f} "
            f"(tolerance {ENERGY_TOLERANCE_EV_PER_ATOM})"
        )

    nn = record.get("repaint_nn_distance_median")
    bond = record.get("data_nn_bond_angstrom")
    if nn is None or bond is None:
        violations.append("G3 missing nn-distance metrics")
    elif abs(nn - bond) / bond > NN_DISTANCE_RELATIVE_TOLERANCE:
        violations.append(
            f"G3 repainted nn distance {nn:.3f} A deviates "
            f"{abs(nn - bond) / bond:.1%} from the data bond {bond:.2f} A "
            f"(tolerance {NN_DISTANCE_RELATIVE_TOLERANCE:.0%})"
        )

    min_pair = record.get("min_repaint_distance_angstrom")
    if min_pair is None:
        violations.append("G4 missing min repaint pair distance")
    elif min_pair < MIN_PAIR_DISTANCE_ANGSTROM:
        violations.append(
            f"G4 overlap: min repainted pair distance {min_pair:.3f} A < "
            f"{MIN_PAIR_DISTANCE_ANGSTROM} A"
        )

    return violations


def main(argv=None):
    paths = (argv or sys.argv[1:]) or [
        "experiments/repaint_si_2x2x2_coherent_r4g.json"
    ]
    failed = False
    for path in paths:
        with open(path) as fh:
            record = json.load(fh)
        violations = check_repaint_gate(record)
        if violations:
            failed = True
            print(f"FAIL {path}")
            for violation in violations:
                print(f"  {violation}")
        else:
            print(
                f"PASS {path}: E/atom {record['energy_per_atom_median']:.4f} "
                f"(data {record['data_energy_per_atom_median']:.4f}), "
                f"nn {record['repaint_nn_distance_median']:.3f} A, "
                f"min pair {record['min_repaint_distance_angstrom']:.3f} A"
            )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
