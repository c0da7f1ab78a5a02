"""Committed repaint gate (VERDICT r4 #5): the region-level criterion as a
red-able test over the production repaint artifacts.

The gate logic lives in experiments/repaint_gate.py; queue scripts run it
after every repaint eval, and this test runs it over the committed r4g
artifacts — regenerating them worse turns CI red.
"""

import importlib.util
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gate():
    spec = importlib.util.spec_from_file_location(
        "repaint_gate", os.path.join(_ROOT, "experiments", "repaint_gate.py")
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


ARTIFACTS = [
    "experiments/repaint_si_2x2x2_coherent_r4g.json",
    "experiments/repaint_si_2x2x2_tpu_r4g.json",
    "experiments/repaint_si_2x2x2_r5.json",
    "experiments/repaint_si_2x2x2_coherent_r5.json",
]


@pytest.mark.parametrize("path", ARTIFACTS)
def test_committed_repaint_artifacts_pass_the_gate(path):
    import json

    full = os.path.join(_ROOT, path)
    if not os.path.exists(full):
        pytest.skip(f"{path} not (yet) generated")
    gate = _load_gate()
    with open(full) as fh:
        record = json.load(fh)
    assert gate.check_repaint_gate(record) == []


def test_gate_flags_each_failure_mode():
    gate = _load_gate()
    good = {
        "constraint_max_abs_error": 0.0,
        "energy_per_atom_median": -4.291,
        "data_energy_per_atom_median": -4.297,
        "repaint_nn_distance_median": 2.30,
        "data_nn_bond_angstrom": 2.35,
        "min_repaint_distance_angstrom": 2.2,
    }
    assert gate.check_repaint_gate(good) == []

    assert any(
        "G1" in v
        for v in gate.check_repaint_gate({**good, "constraint_max_abs_error": 1e-6})
    )
    assert any(
        "G2" in v
        for v in gate.check_repaint_gate({**good, "energy_per_atom_median": -4.28})
    )
    assert any(
        "G3" in v
        for v in gate.check_repaint_gate(
            {**good, "repaint_nn_distance_median": 2.15}
        )
    )
    assert any(
        "G4" in v
        for v in gate.check_repaint_gate(
            {**good, "min_repaint_distance_angstrom": 1.4}
        )
    )
    # The round-4 failure signature (divergent corrector epsilon) trips
    # G2/G3/G4 at once.
    bad = {
        **good,
        "energy_per_atom_median": 2.1,
        "repaint_nn_distance_median": 1.34,
        "min_repaint_distance_angstrom": 0.14,
    }
    assert len(gate.check_repaint_gate(bad)) == 3
