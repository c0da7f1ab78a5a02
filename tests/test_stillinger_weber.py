"""Stillinger-Weber oracle tests.

Validation strategy:
  1. independent float64 numpy implementation (direct O(n^2 * 27) loops,
     straight from the published formulas) as the correctness oracle for
     random configurations — catches masking/parameter-mixing bugs;
  2. physics checks: the perfect diamond-Si crystal at the SW equilibrium
     lattice constant must give the published cohesive energy -2 eps =
     -4.3366 eV/atom with ~zero forces.
"""

import itertools
import os

import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle import (
    StillingerWeberOracle,
    StillingerWeberParameters,
    parse_stillinger_weber_coefficients,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.energy_oracle_factory import (
    create_energy_oracle,
    create_energy_oracle_parameters,
    resolve_sw_coefficients_path,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.reference_configurations import (
    create_equilibrium_sige_structure,
    get_silicon_supercell,
)


def sw_energy_numpy(positions, cell, types, entries, elements):
    """Direct float64 SW energy: loops over pairs/triplets and 27 images."""

    def params(t1, t2, t3):
        return entries[(elements[t1], elements[t2], elements[t3])]

    n = positions.shape[0]
    shifts = [
        np.asarray(s, dtype=float) @ cell
        for s in itertools.product((-1, 0, 1), repeat=3)
    ]

    # collect neighbors (j, displacement) of each atom within max cutoff
    max_cut = max(p["a"] * p["sigma"] for p in entries.values())
    neighbors = [[] for _ in range(n)]
    for i in range(n):
        for j in range(n):
            for s in shifts:
                if i == j and np.allclose(s, 0):
                    continue
                d = positions[j] + s - positions[i]
                r = np.linalg.norm(d)
                if r < max_cut:
                    neighbors[i].append((j, d, r))

    def h(r, p_pair, gamma):
        cut = p_pair["a"] * p_pair["sigma"]
        if r >= cut - 1e-5:
            return 0.0
        return np.exp(gamma * p_pair["sigma"] / (r - cut))

    e2 = 0.0
    e3 = 0.0
    for i in range(n):
        for idx_j, (j, d_ij, r_ij) in enumerate(neighbors[i]):
            p_ij = params(types[i], types[j], types[j])
            cut = p_ij["a"] * p_ij["sigma"]
            if r_ij < cut - 1e-5:
                sr = p_ij["sigma"] / r_ij
                phi2 = (
                    p_ij["A"]
                    * p_ij["epsilon"]
                    * (p_ij["B"] * sr ** p_ij["p"] - sr ** p_ij["q"])
                    * h(r_ij, p_ij, 1.0)
                )
                e2 += 0.5 * phi2
            for j2, d_ik, r_ik in neighbors[i][idx_j + 1 :]:
                p_ik = params(types[i], types[j2], types[j2])
                p_ijk = params(types[i], types[j], types[j2])
                h1 = h(r_ij, p_ij, p_ij["gamma"])
                h2 = h(r_ik, p_ik, p_ik["gamma"])
                if h1 == 0.0 or h2 == 0.0:
                    continue
                cos = float(d_ij @ d_ik / (r_ij * r_ik))
                e3 += (
                    p_ijk["lam"]
                    * p_ijk["epsilon"]
                    * (cos - p_ijk["costheta0"]) ** 2
                    * h1
                    * h2
                )
    return e2 + e3


@pytest.fixture(scope="module")
def si_oracle():
    path = resolve_sw_coefficients_path("Si.sw")
    return StillingerWeberOracle(
        StillingerWeberParameters(elements=["Si"], sw_coeff_filename=path)
    )


def test_parse_si_coefficients():
    path = resolve_sw_coefficients_path("Si.sw")
    entries = parse_stillinger_weber_coefficients(path)
    p = entries[("Si", "Si", "Si")]
    assert p["epsilon"] == pytest.approx(2.1683)
    assert p["sigma"] == pytest.approx(2.0951)
    assert p["a"] == pytest.approx(1.80)
    assert p["lam"] == pytest.approx(21.0)


def test_diamond_silicon_cohesive_energy(si_oracle):
    """Perfect diamond Si at the SW minimum: E = -2 eps per atom, F = 0."""
    coords, cell = get_silicon_supercell(2, 5.431)
    positions = coords @ cell
    energies, forces = si_oracle._compute_batch_energy_and_forces(
        positions[None], cell[None], np.zeros((1, len(coords)), dtype=np.int32)
    )
    e_per_atom = float(energies[0]) / len(coords)
    assert e_per_atom == pytest.approx(-2 * 2.1683, abs=2e-3)
    np.testing.assert_allclose(forces[0], 0.0, atol=2e-4)


def test_energy_minimum_near_published_lattice_constant(si_oracle):
    energies = []
    lattice_constants = [5.35, 5.431, 5.51]
    for a in lattice_constants:
        coords, cell = get_silicon_supercell(1, a)
        positions = coords @ cell
        e, _ = si_oracle._compute_batch_energy_and_forces(
            positions[None], cell[None], np.zeros((1, 8), dtype=np.int32)
        )
        energies.append(float(e[0]))
    assert energies[1] < energies[0] and energies[1] < energies[2]


def test_matches_numpy_brute_force_on_random_configs(si_oracle):
    rng = np.random.RandomState(0)
    path = resolve_sw_coefficients_path("Si.sw")
    entries = parse_stillinger_weber_coefficients(path)
    cell = np.eye(3) * 6.5
    # Slightly perturbed diamond plus fully random atoms.
    coords, base_cell = get_silicon_supercell(1, 6.5)
    configs = [
        np.mod(coords + 0.03 * rng.randn(8, 3), 1.0),
        rng.uniform(size=(8, 3)),
    ]
    for x in configs:
        positions = x @ cell
        expected = sw_energy_numpy(
            positions, cell, np.zeros(8, dtype=int), entries, ["Si"]
        )
        got, _ = si_oracle._compute_batch_energy_and_forces(
            positions[None], cell[None], np.zeros((1, 8), dtype=np.int32)
        )
        assert float(got[0]) == pytest.approx(expected, rel=2e-4, abs=1e-3)


def test_forces_match_numeric_gradient(si_oracle):
    rng = np.random.RandomState(1)
    coords, cell = get_silicon_supercell(1, 5.5)
    x = np.mod(coords + 0.02 * rng.randn(8, 3), 1.0)
    positions = (x @ cell).astype(np.float64)
    types = np.zeros((1, 8), dtype=np.int32)

    _, forces = si_oracle._compute_batch_energy_and_forces(
        positions[None], cell[None], types
    )

    eps = 1e-3
    for atom, axis in [(0, 0), (3, 1), (7, 2)]:
        plus = positions.copy()
        plus[atom, axis] += eps
        minus = positions.copy()
        minus[atom, axis] -= eps
        e_plus, _ = si_oracle._compute_batch_energy_and_forces(
            plus[None], cell[None], types
        )
        e_minus, _ = si_oracle._compute_batch_energy_and_forces(
            minus[None], cell[None], types
        )
        numeric = -(float(e_plus[0]) - float(e_minus[0])) / (2 * eps)
        assert forces[0, atom, axis] == pytest.approx(numeric, rel=2e-2, abs=2e-3)


def test_sige_mixed_system_matches_brute_force():
    path = resolve_sw_coefficients_path("SiGe.sw")
    entries = parse_stillinger_weber_coefficients(path)
    # ElementTypes sorts: Ge = 0, Si = 1.
    elements = ["Ge", "Si"]
    oracle = StillingerWeberOracle(
        StillingerWeberParameters(elements=elements, sw_coeff_filename=path)
    )
    coords, atom_types, cell = create_equilibrium_sige_structure(1)
    # the builder marks Si = 1, Ge = 0 matching the sorted convention
    rng = np.random.RandomState(2)
    x = np.mod(coords + 0.02 * rng.randn(*coords.shape), 1.0)
    positions = x @ cell
    expected = sw_energy_numpy(positions, cell, atom_types, entries, elements)
    got, _ = oracle._compute_batch_energy_and_forces(
        positions[None], cell[None], atom_types[None].astype(np.int32)
    )
    assert float(got[0]) == pytest.approx(expected, rel=2e-4, abs=1e-3)


def test_oracle_factory_and_axl_interface():
    params = create_energy_oracle_parameters(
        dict(name="stillinger_weber", sw_coeff_filename="Si.sw"), elements=["Si"]
    )
    oracle = create_energy_oracle(params)
    coords, cell = get_silicon_supercell(1, 5.431)
    lattice_params = np.concatenate([np.diag(cell), np.zeros(3)])
    samples = AXL(
        A=np.zeros((2, 8), dtype=np.int32),
        X=np.stack([coords, coords]),
        L=np.stack([lattice_params, lattice_params]),
    )
    energies, forces = oracle.compute_oracle_energies_and_forces(samples)
    assert energies.shape == (2,)
    assert forces.shape == (2, 8, 3)
    np.testing.assert_allclose(energies[0], energies[1], rtol=1e-6)


def test_oracle_factory_sorts_elements_to_match_atom_type_ids():
    """Atom-type ids follow ElementTypes' sorted convention (Ge=0, Si=1);
    the factory must sort the raw config element list or every SiGe energy
    evaluation swaps species."""
    params = create_energy_oracle_parameters(
        dict(name="stillinger_weber", sw_coeff_filename="SiGe.sw"),
        elements=["Si", "Ge"],
    )
    assert list(params.elements) == ["Ge", "Si"]
