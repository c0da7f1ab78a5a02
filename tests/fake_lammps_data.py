"""Fabricate LAMMPS yaml dump + thermo files for hermetic pipeline tests.

(the reference's equivalent fixture strategy: tests/fake_data_utils.py)
"""

import os

import numpy as np


def write_fake_lammps_run(
    run_dir: str,
    n_steps: int = 5,
    natoms: int = 6,
    box_size: float = 5.43,
    elements=("Si",),
    seed: int = 0,
):
    """Write dump.fake.yaml and thermo.fake.yaml; returns the ground truth."""
    os.makedirs(run_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    positions = rng.uniform(0, box_size, size=(n_steps, natoms, 3))
    forces = rng.randn(n_steps, natoms, 3)
    element_choices = [elements[i % len(elements)] for i in range(natoms)]
    potential = rng.randn(n_steps) * 0.1 - 4.0
    kinetic = np.abs(rng.randn(n_steps)) * 0.05

    dump_lines = []
    for step in range(n_steps):
        dump_lines.append("---")
        dump_lines.append("creator: LAMMPS")
        dump_lines.append(f"timestep: {step}")
        dump_lines.append(f"natoms: {natoms}")
        dump_lines.append("boundary: [ p, p, p ]")
        dump_lines.append("box:")
        for _ in range(3):
            dump_lines.append(f"- [ 0, {box_size} ]")
        dump_lines.append("keywords: [ id, element, x, y, z, fx, fy, fz ]")
        dump_lines.append("data:")
        # Shuffle atom order in the file: parsers must sort by id.
        order = rng.permutation(natoms)
        for a in order:
            p = positions[step, a]
            f = forces[step, a]
            dump_lines.append(
                f"- [ {a + 1} , {element_choices[a]} , "
                f"{p[0]:.10f} , {p[1]:.10f} , {p[2]:.10f} , "
                f"{f[0]:.10f} , {f[1]:.10f} , {f[2]:.10f} ]"
            )
        dump_lines.append("...")
    with open(os.path.join(run_dir, "dump.fake.yaml"), "w") as fh:
        fh.write("\n".join(dump_lines) + "\n")

    thermo_lines = ["---", "keywords: [ Step, Temp, KinEng, PotEng, Press ]", "data:"]
    for step in range(n_steps):
        thermo_lines.append(
            f"- [ {step} , 300.0 , {kinetic[step]:.8f} , "
            f"{potential[step]:.8f} , 1.0 ]"
        )
    thermo_lines.append("...")
    with open(os.path.join(run_dir, "thermo.fake.yaml"), "w") as fh:
        fh.write("\n".join(thermo_lines) + "\n")

    return {
        "positions": positions,
        "forces": forces,
        "elements": element_choices,
        "potential_energy": potential,
        "kinetic_energy": kinetic,
        "box": np.full(3, box_size),
    }
