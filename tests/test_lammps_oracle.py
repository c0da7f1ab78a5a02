"""Subprocess LAMMPS oracle tested against a fake `lmp` executable.

The reference gates its in-process LAMMPS oracle test out of CI
(tests/oracle/test_lammps_energy_oracle.py, marker not_on_github); here the
file/subprocess protocol itself is testable hermetically: a stand-in
executable validates the input script and emits the thermo line + dump file
the parser expects.
"""

import os
import stat
import textwrap

import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.lammps_oracle import (
    LammpsEnergyOracle,
    LammpsOracleParameters,
    lammps_is_available,
)

FAKE_LMP = textwrap.dedent(
    """\
    #!/usr/bin/env python3
    import os, sys

    # Parse -i <script>; run from the work dir like the real binary.
    script = sys.argv[sys.argv.index("-i") + 1]
    text = open(script).read()
    assert "pair_style sw" in text
    assert "read_data" in text
    data_file = [l for l in text.splitlines() if l.startswith("read_data")][0].split()[1]
    natoms = int(open(data_file).read().split(" atoms")[0].strip().splitlines()[-1])
    with open("forces.dump", "w") as fh:
        fh.write("ITEM: TIMESTEP\\n0\\n")
        fh.write("ITEM: NUMBER OF ATOMS\\n%d\\n" % natoms)
        fh.write("ITEM: BOX BOUNDS pp pp pp\\n0 1\\n0 1\\n0 1\\n")
        fh.write("ITEM: ATOMS id fx fy fz\\n")
        for i in range(natoms):
            fh.write("%d %f %f %f\\n" % (i + 1, 0.1 * i, -0.1 * i, 0.5))
    print("ORACLE_ENERGY = -17.25")
    """
)


@pytest.fixture
def fake_lmp(tmp_path):
    path = tmp_path / "lmp_fake"
    path.write_text(FAKE_LMP)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


def test_availability_probe(fake_lmp):
    assert lammps_is_available(fake_lmp)
    assert not lammps_is_available("/nonexistent/lmp")


def test_missing_executable_raises():
    with pytest.raises(RuntimeError, match="not found"):
        LammpsEnergyOracle(
            LammpsOracleParameters(
                name="lammps",
                sw_coeff_filename="Si.sw",
                elements=["Si"],
                lammps_executable="/nonexistent/lmp",
            )
        )


def test_subprocess_protocol_roundtrip(fake_lmp):
    oracle = LammpsEnergyOracle(
        LammpsOracleParameters(
            name="lammps",
            sw_coeff_filename="Si.sw",
            elements=["Si"],
            lammps_executable=fake_lmp,
        )
    )
    rng = np.random.default_rng(0)
    natoms = 4
    composition = AXL(
        A=np.zeros((2, natoms), np.int32),
        X=rng.uniform(0, 1, (2, natoms, 3)).astype(np.float32),
        L=np.tile([5.43, 5.43, 5.43, 0, 0, 0], (2, 1)).astype(np.float32),
    )
    energies, forces = oracle.compute_oracle_energies_and_forces(composition)
    np.testing.assert_allclose(np.asarray(energies), [-17.25, -17.25])
    assert forces.shape == (2, natoms, 3)
    np.testing.assert_allclose(np.asarray(forces)[0, 2], [0.2, -0.2, 0.5])
