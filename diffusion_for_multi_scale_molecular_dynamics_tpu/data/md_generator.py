r"""On-device molecular-dynamics data generation (NVT Langevin, SW forces).

The reference's training data comes from LAMMPS NVT runs at 300 K with the
Stillinger-Weber potential (data/Si_diffusion_*/create_data.sh). With the SW
potential implemented natively in JAX (oracle/stillinger_weber.py), the whole
data-generation pipeline moves on device: a BAOAB Langevin integrator runs as
one ``lax.scan`` over MD steps, sampling configurations/forces/energies along
the way, and writes parquet files in the exact schema of the LAMMPS ETL —
the existing LammpsDataModule consumes them unchanged.

Units are LAMMPS "metal": eV, Angstrom, ps. BAOAB (Leimkuhler-Matthews)
splitting:

    B: v += dt/2 * F/m
    A: x += dt/2 * v
    O: v  = c1 v + c2 sqrt(kT/m) xi,  c1 = exp(-gamma dt), c2 = sqrt(1-c1^2)
    A: x += dt/2 * v
    B: v += dt/2 * F/m
"""

import logging
import os
from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import get_number_of_lattice_parameters
from ..oracle.stillinger_weber import SWTables, build_sw_tables, parse_stillinger_weber_coefficients, sw_energy
from ..utils.reference_configurations import get_silicon_supercell

logger = logging.getLogger(__name__)

BOLTZMANN_EV_PER_K = 8.617333262e-5  # eV / K
AMU_TO_METAL_MASS = 1.03642696e-4  # eV ps^2 / A^2 per amu
ATOMIC_MASSES_AMU = {"Si": 28.0855, "Ge": 72.63}


@dataclass(kw_only=True)
class MDParameters:
    """NVT Langevin MD configuration."""

    temperature: float = 300.0  # K
    time_step: float = 0.001  # ps (1 fs)
    friction: float = 10.0  # 1/ps Langevin friction gamma
    equilibration_steps: int = 2000
    production_steps: int = 10000
    sample_every: int = 10
    neighbor_capacity: int = 32


class MDTrajectory(NamedTuple):
    """Sampled MD frames (device arrays)."""

    relative_coordinates: jnp.ndarray  # [n_samples, natoms, 3]
    cartesian_forces: jnp.ndarray  # [n_samples, natoms, 3]
    potential_energies: jnp.ndarray  # [n_samples]
    temperatures: jnp.ndarray  # [n_samples]


def run_nvt_langevin(
    key,
    relative_coordinates: jnp.ndarray,
    cell: jnp.ndarray,
    atom_types: jnp.ndarray,
    masses_amu: jnp.ndarray,
    tables: SWTables,
    parameters: MDParameters,
) -> MDTrajectory:
    """One NVT Langevin trajectory as a compiled scan.

    Args:
        key: PRNG key.
        relative_coordinates: initial fractional coordinates, [natoms, 3].
        cell: row-stacked (diagonal) cell, [3, 3].
        atom_types: [natoms] integer types into the SW tables.
        masses_amu: per-atom masses in amu, [natoms].
        tables: SW coefficient tables.
        parameters: MD settings.

    Returns:
        MDTrajectory with production samples every ``sample_every`` steps.
    """
    p = parameters
    dt = p.time_step
    kT = BOLTZMANN_EV_PER_K * p.temperature
    mass = (masses_amu * AMU_TO_METAL_MASS)[:, None]  # [natoms, 1]
    c1 = jnp.exp(-p.friction * dt)
    c2 = jnp.sqrt(1.0 - c1**2)

    lengths = jnp.diagonal(cell)
    types_b = atom_types[None]
    cell_b = cell[None]

    def forces_and_energy(positions):
        energy, forces = jax.value_and_grad(
            lambda r: jnp.sum(
                sw_energy(
                    r[None], cell_b, types_b, tables, p.neighbor_capacity
                )
            )
        )(positions)
        return -forces, energy

    def step(carry, step_key):
        positions, velocities, forces = carry
        # B
        velocities = velocities + 0.5 * dt * forces / mass
        # A
        positions = positions + 0.5 * dt * velocities
        # O
        noise = jax.random.normal(step_key, velocities.shape)
        velocities = c1 * velocities + c2 * jnp.sqrt(kT / mass) * noise
        # A
        positions = positions + 0.5 * dt * velocities
        # wrap back into the box
        positions = positions - jnp.floor(positions / lengths) * lengths
        # B
        forces, energy = forces_and_energy(positions)
        velocities = velocities + 0.5 * dt * forces / mass

        kinetic = 0.5 * jnp.sum(mass * velocities**2)
        natoms = positions.shape[0]
        temperature = 2.0 * kinetic / (3.0 * natoms * BOLTZMANN_EV_PER_K)
        return (positions, velocities, forces), (positions, forces, energy, temperature)

    key_v, key_equil, key_prod = jax.random.split(key, 3)
    positions0 = relative_coordinates @ cell
    velocities0 = jnp.sqrt(kT / mass) * jax.random.normal(
        key_v, positions0.shape
    )
    forces0, _ = forces_and_energy(positions0)
    carry = (positions0, velocities0, forces0)

    # Equilibration (discard).
    equil_keys = jax.random.split(key_equil, p.equilibration_steps)
    carry, _ = jax.lax.scan(step, carry, equil_keys)

    # Production.
    prod_keys = jax.random.split(key_prod, p.production_steps)
    carry, (positions, forces, energies, temperatures) = jax.lax.scan(
        step, carry, prod_keys
    )

    sample_idx = jnp.arange(
        p.sample_every - 1, p.production_steps, p.sample_every
    )
    sampled_positions = positions[sample_idx]
    fractional = sampled_positions / lengths
    fractional = jnp.mod(fractional, 1.0)
    return MDTrajectory(
        relative_coordinates=fractional,
        cartesian_forces=forces[sample_idx],
        potential_energies=energies[sample_idx],
        temperatures=temperatures[sample_idx],
    )


def create_diffusion_dataset(
    output_directory: str,
    *,
    coordinates,
    cell,
    atom_types,
    elements: List[str],
    sw_coefficients_filename: str,
    number_of_train_runs: int = 2,
    number_of_valid_runs: int = 1,
    parameters: Optional[MDParameters] = None,
    seed: int = 0,
) -> Dict[str, List[str]]:
    """Generate MD training data as parquet files (LammpsDataModule schema).

    The on-device replacement of the reference's LAMMPS create_data.sh runs:
    NVT Langevin at parameters.temperature, sampled along the trajectory.

    Args:
        coordinates/cell: equilibrium structure (fractional coords, [3,3] cell).
        atom_types: integer ids following the sorted-element convention of
            ElementTypes(elements).
        elements: the element list; SW tables are ordered by sorted(elements)
            so ids and potential types agree.
        sw_coefficients_filename: .sw file (resolved against the shipped
            coefficient directory), e.g. "Si.sw" or "SiGe.sw".
    """
    import pandas as pd

    from ..oracle.energy_oracle_factory import resolve_sw_coefficients_path

    parameters = parameters or MDParameters()
    sw_path = resolve_sw_coefficients_path(sw_coefficients_filename)
    ordered_elements = sorted(elements)
    tables = build_sw_tables(
        parse_stillinger_weber_coefficients(sw_path), ordered_elements
    )
    os.makedirs(output_directory, exist_ok=True)

    natoms = len(coordinates)
    atom_types = np.asarray(atom_types, np.int64)
    masses = jnp.asarray(
        [ATOMIC_MASSES_AMU[ordered_elements[t]] for t in atom_types],
        jnp.float32,
    )
    n_lattice = get_number_of_lattice_parameters(3)

    written: Dict[str, List[str]] = {"train": [], "valid": []}
    run_specs = [("train", i + 1) for i in range(number_of_train_runs)] + [
        ("valid", i + 1) for i in range(number_of_valid_runs)
    ]
    for run_index, (mode, run_number) in enumerate(run_specs):
        target = os.path.join(output_directory, f"{mode}_run_{run_number}.parquet")
        written[mode].append(target)
        if os.path.exists(target):
            continue
        logger.info("Running on-device MD for %s_run_%d ...", mode, run_number)
        key = jax.random.PRNGKey(seed + run_index)
        trajectory = run_nvt_langevin(
            key,
            jnp.asarray(coordinates, jnp.float32),
            jnp.asarray(cell, jnp.float32),
            jnp.asarray(atom_types, jnp.int32),
            masses,
            tables,
            parameters,
        )
        n_samples = trajectory.relative_coordinates.shape[0]
        boxes = np.tile(np.diag(cell), (n_samples, 1))
        lattice_parameters = np.zeros((n_samples, n_lattice))
        lattice_parameters[:, :3] = boxes
        x = np.asarray(trajectory.relative_coordinates, np.float64)
        forces = np.asarray(trajectory.cartesian_forces, np.float64)
        energies = np.asarray(trajectory.potential_energies, np.float64)
        frame = pd.DataFrame(
            {
                "natom": [natoms] * n_samples,
                "box": list(boxes),
                "lattice_parameters": list(lattice_parameters),
                "element": [atom_types] * n_samples,
                "cartesian_positions": [
                    (row @ cell).ravel() for row in x
                ],
                "relative_coordinates": [row.ravel() for row in x],
                "cartesian_forces": [row.ravel() for row in forces],
                "potential_energy": energies,
                "energy": energies,
            }
        )
        frame.to_parquet(target, engine="pyarrow", index=False)
        logger.info(
            "Wrote %s (%d frames, mean T %.1f K, mean E/atom %.4f eV)",
            target,
            n_samples,
            float(np.mean(np.asarray(trajectory.temperatures))),
            float(energies.mean() / natoms),
        )
    return written


def create_silicon_diffusion_dataset(
    output_directory: str,
    supercell_factor: int = 1,
    lattice_constant: float = 5.43,
    number_of_train_runs: int = 2,
    number_of_valid_runs: int = 1,
    parameters: Optional[MDParameters] = None,
    sw_coefficients_path: Optional[str] = None,
    seed: int = 0,
) -> Dict[str, List[str]]:
    """Perfect diamond Si supercell, NVT at 300 K (reference create_data.sh)."""
    coordinates, cell = get_silicon_supercell(supercell_factor, lattice_constant)
    return create_diffusion_dataset(
        output_directory,
        coordinates=coordinates,
        cell=cell,
        atom_types=np.zeros(len(coordinates), np.int64),
        elements=["Si"],
        sw_coefficients_filename=sw_coefficients_path or "Si.sw",
        number_of_train_runs=number_of_train_runs,
        number_of_valid_runs=number_of_valid_runs,
        parameters=parameters,
        seed=seed,
    )


def create_sige_diffusion_dataset(
    output_directory: str,
    supercell_factor: int = 1,
    lattice_constant: float = 5.543,
    number_of_train_runs: int = 2,
    number_of_valid_runs: int = 1,
    parameters: Optional[MDParameters] = None,
    seed: int = 0,
) -> Dict[str, List[str]]:
    """Zincblende SiGe (Si/Ge on the two diamond sublattices), SW SiGe.sw.

    Two real atom types — this is the dataset that exercises the D3PM
    atom-type diffusion end to end (the reference ships SiGe datasets next
    to its Si ones, data/SiGe_diffusion_*).
    """
    from ..utils.reference_configurations import (
        create_equilibrium_sige_structure,
    )

    coordinates, atom_types, cell = create_equilibrium_sige_structure(
        supercell_factor, lattice_constant
    )
    return create_diffusion_dataset(
        output_directory,
        coordinates=coordinates,
        cell=cell,
        atom_types=atom_types,
        elements=["Si", "Ge"],
        sw_coefficients_filename="SiGe.sw",
        number_of_train_runs=number_of_train_runs,
        number_of_valid_runs=number_of_valid_runs,
        parameters=parameters,
        seed=seed,
    )


def main(argv=None) -> None:
    """CLI: generate Si MD training data fully on device.

    python -m diffusion_for_multi_scale_molecular_dynamics_tpu.data.md_generator \\
        --output si_data --supercell_factor 2 --production_steps 10000
    """
    import argparse

    parser = argparse.ArgumentParser(description="On-device MD data generation")
    parser.add_argument("--output", required=True)
    parser.add_argument("--system", choices=["si", "sige"], default="si")
    parser.add_argument("--supercell_factor", type=int, default=1)
    parser.add_argument("--lattice_constant", type=float, default=5.43)
    parser.add_argument("--temperature", type=float, default=300.0)
    parser.add_argument("--train_runs", type=int, default=2)
    parser.add_argument("--valid_runs", type=int, default=1)
    parser.add_argument("--equilibration_steps", type=int, default=2000)
    parser.add_argument("--production_steps", type=int, default=10000)
    parser.add_argument("--sample_every", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    factory = (
        create_sige_diffusion_dataset
        if args.system == "sige"
        else create_silicon_diffusion_dataset
    )
    if args.system == "sige" and args.lattice_constant == 5.43:
        args.lattice_constant = 5.543  # SiGe equilibrium
    factory(
        args.output,
        supercell_factor=args.supercell_factor,
        lattice_constant=args.lattice_constant,
        number_of_train_runs=args.train_runs,
        number_of_valid_runs=args.valid_runs,
        parameters=MDParameters(
            temperature=args.temperature,
            equilibration_steps=args.equilibration_steps,
            production_steps=args.production_steps,
            sample_every=args.sample_every,
        ),
        seed=args.seed,
    )


if __name__ == "__main__":
    main()
