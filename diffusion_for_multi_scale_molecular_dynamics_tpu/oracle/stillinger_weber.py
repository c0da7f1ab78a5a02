r"""Vectorized Stillinger-Weber potential in JAX (energies + forces on device).

The SW potential (Stillinger & Weber, PRB 31, 5262 (1985)) in LAMMPS "metal"
units:

  E = sum_{i<j} phi2(r_ij) + sum_i sum_{j != i} sum_{k > j, k != i} phi3

  phi2(r)   = A eps [B (sig/r)^p - (sig/r)^q] exp[sig / (r - a sig)]
  phi3      = lam eps [cos(theta_jik) - cos0]^2
              * exp[gam_ij sig_ij / (r_ij - a_ij sig_ij)]
              * exp[gam_ik sig_ik / (r_ik - a_ik sig_ik)]

with per-triplet parameter mixing exactly as LAMMPS pair_style sw: two-body
parameters and the two exponential screening factors come from the (i,j,j) /
(i,k,k) entries; lambda*eps and cos(theta0) come from the (i,j,k) entry.
Interactions vanish smoothly at the cutoff r = a sig.

This replaces the reference's per-sample in-process LAMMPS calls
(src/diffusion_for_multi_scale_molecular_dynamics/oracle/lammps_energy_oracle.py:30-179)
with one jitted, vmapped computation over the whole batch: fixed-capacity
periodic neighbor tables feed masked pair and triplet sums, and forces come
from jax.grad of the (scalar) batch energy — no host round-trips, so
validation-time energy scoring and active-learning candidate scoring stay on
the TPU. The .sw coefficient-file format is parsed for compatibility with
existing parameter files.
"""

import itertools
import logging
import re
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.neighbors import get_fixed_capacity_neighbors
from .energy_oracle import EnergyOracle, OracleParameters

logger = logging.getLogger(__name__)

_ENTRY_FIELDS = (
    "epsilon",
    "sigma",
    "a",
    "lam",
    "gamma",
    "costheta0",
    "A",
    "B",
    "p",
    "q",
    "tol",
)


def parse_stillinger_weber_coefficients(
    path: str,
) -> Dict[Tuple[str, str, str], Dict[str, float]]:
    """Parse a LAMMPS .sw coefficient file into {(e1, e2, e3): params}."""
    with open(path, "r") as fh:
        text = fh.read()
    tokens: List[str] = []
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if line:
            tokens.extend(line.split())

    entries: Dict[Tuple[str, str, str], Dict[str, float]] = {}
    i = 0
    while i < len(tokens):
        e1, e2, e3 = tokens[i : i + 3]
        numbers = [float(t) for t in tokens[i + 3 : i + 3 + 11]]
        assert len(numbers) == 11, f"incomplete SW entry for {(e1, e2, e3)}"
        entries[(e1, e2, e3)] = dict(zip(_ENTRY_FIELDS, numbers))
        i += 14
    return entries


class SWTables(NamedTuple):
    """Dense [T, T, T] coefficient tables over atom types."""

    epsilon: jnp.ndarray
    sigma: jnp.ndarray
    a: jnp.ndarray
    lam: jnp.ndarray
    gamma: jnp.ndarray
    costheta0: jnp.ndarray
    A: jnp.ndarray
    B: jnp.ndarray
    p: jnp.ndarray
    q: jnp.ndarray
    max_cutoff: float


def build_sw_tables(
    coefficients: Dict[Tuple[str, str, str], Dict[str, float]],
    elements: List[str],
) -> SWTables:
    """Order the parsed entries into [T, T, T] arrays following ``elements``."""
    n = len(elements)
    arrays = {f: np.zeros((n, n, n)) for f in _ENTRY_FIELDS}
    for i, j, k in itertools.product(range(n), repeat=3):
        key = (elements[i], elements[j], elements[k])
        assert key in coefficients, f"missing SW entry for {key}"
        for f in _ENTRY_FIELDS:
            arrays[f][i, j, k] = coefficients[key][f]
    max_cutoff = float((arrays["a"] * arrays["sigma"]).max())
    return SWTables(
        epsilon=jnp.asarray(arrays["epsilon"], jnp.float32),
        sigma=jnp.asarray(arrays["sigma"], jnp.float32),
        a=jnp.asarray(arrays["a"], jnp.float32),
        lam=jnp.asarray(arrays["lam"], jnp.float32),
        gamma=jnp.asarray(arrays["gamma"], jnp.float32),
        costheta0=jnp.asarray(arrays["costheta0"], jnp.float32),
        A=jnp.asarray(arrays["A"], jnp.float32),
        B=jnp.asarray(arrays["B"], jnp.float32),
        p=jnp.asarray(arrays["p"], jnp.float32),
        q=jnp.asarray(arrays["q"], jnp.float32),
        max_cutoff=max_cutoff,
    )


def _screening(r, sigma, a, gamma):
    """gamma*sigma/(r - a*sigma) guarded against the r -> a*sigma pole.

    Valid (mask=True) only for r < a*sigma; the double-where keeps values and
    gradients finite on masked lanes.
    """
    cutoff = a * sigma
    inside = r < cutoff - 1e-5
    r_safe = jnp.where(inside, r, cutoff - 1e-2)
    return jnp.where(inside, jnp.exp(gamma * sigma / (r_safe - cutoff)), 0.0)


def sw_energy(
    cartesian_positions: jnp.ndarray,
    basis_vectors: jnp.ndarray,
    atom_types: jnp.ndarray,
    tables: SWTables,
    neighbor_capacity: int = 32,
    atom_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Batched SW energy, [batch].

    Args:
        cartesian_positions: [b, n, 3]
        basis_vectors: [b, 3, 3] row-stacked cells.
        atom_types: [b, n] integer types indexing the tables.
        tables: coefficient tables.
        neighbor_capacity: max neighbors per atom (static).
        atom_mask: optional [b, n] validity mask.
    """
    table = get_fixed_capacity_neighbors(
        cartesian_positions,
        basis_vectors,
        cutoff=tables.max_cutoff,
        capacity=neighbor_capacity,
        atom_mask=atom_mask,
    )
    t_i = atom_types[:, :, None]  # [b, n, 1]
    natoms = atom_types.shape[1]
    t_j = jnp.take_along_axis(
        jnp.broadcast_to(atom_types[:, None, :], (atom_types.shape[0], natoms, natoms)),
        table.indices,
        axis=2,
    )  # [b, n, K]

    r = table.distances  # [b, n, K]
    valid = table.mask

    # ---- two-body: parameters from the (i, j, j) entries, half per edge.
    def pair_param(arr):
        return arr[t_i, t_j, t_j]

    sig = pair_param(tables.sigma)
    a_ij = pair_param(tables.a)
    inside = valid & (r < a_ij * sig - 1e-5)
    r_safe = jnp.where(inside, r, 1.0)
    sr = sig / r_safe
    repulsive = pair_param(tables.B) * sr ** pair_param(tables.p) - sr ** pair_param(
        tables.q
    )
    phi2 = (
        pair_param(tables.A)
        * pair_param(tables.epsilon)
        * repulsive
        * _screening(r, sig, a_ij, 1.0)
    )
    e2 = 0.5 * jnp.sum(jnp.where(inside, phi2, 0.0), axis=(1, 2))

    # ---- three-body: screening from (i,j,j)/(i,k,k), angle term from (i,j,k).
    h_ij = _screening(r, sig, a_ij, pair_param(tables.gamma))  # [b, n, K]
    h_ij = jnp.where(valid, h_ij, 0.0)

    unit = table.displacements / r_safe_expand(r)[..., None]
    cos_jk = jnp.einsum("bnkd,bnld->bnkl", unit, unit)  # [b, n, K, K]

    t_jk = t_j  # alias for readability
    lam_eps = tables.lam[t_i[..., None], t_jk[:, :, :, None], t_jk[:, :, None, :]] * \
        tables.epsilon[t_i[..., None], t_jk[:, :, :, None], t_jk[:, :, None, :]]
    cos0 = tables.costheta0[
        t_i[..., None], t_jk[:, :, :, None], t_jk[:, :, None, :]
    ]

    delta_cos = cos_jk - cos0
    triplet = lam_eps * delta_cos**2 * h_ij[:, :, :, None] * h_ij[:, :, None, :]

    # Keep each unordered (j, k) pair once: strictly upper-triangular slots.
    capacity = r.shape[-1]
    upper = jnp.triu(jnp.ones((capacity, capacity), bool), k=1)
    pair_valid = valid[:, :, :, None] & valid[:, :, None, :] & upper
    e3 = jnp.sum(jnp.where(pair_valid, triplet, 0.0), axis=(1, 2, 3))

    return e2 + e3


def r_safe_expand(r):
    """Avoid 0/0 on padded slots when normalizing displacement vectors."""
    return jnp.where(r > 1e-8, r, 1.0)


@dataclass(kw_only=True)
class StillingerWeberParameters(OracleParameters):
    """Configuration of the JAX SW oracle."""

    name: str = "stillinger_weber"
    sw_coeff_filename: str
    neighbor_capacity: int = 32


class StillingerWeberOracle(EnergyOracle):
    """Batch SW energies and forces, one jitted call per batch shape."""

    def __init__(self, oracle_parameters: StillingerWeberParameters):
        super().__init__(oracle_parameters)
        coefficients = parse_stillinger_weber_coefficients(
            oracle_parameters.sw_coeff_filename
        )
        self.tables = build_sw_tables(coefficients, oracle_parameters.elements)
        capacity = oracle_parameters.neighbor_capacity

        def total_energy(positions, cells, types):
            return jnp.sum(sw_energy(positions, cells, types, self.tables, capacity))

        def energies_and_forces(positions, cells, types):
            energies = sw_energy(positions, cells, types, self.tables, capacity)
            forces = -jax.grad(total_energy)(positions, cells, types)
            return energies, forces

        self._energies_and_forces = jax.jit(energies_and_forces)

    def compute_energy_and_forces_on_device(
        self, cartesian_positions, basis_vectors, atom_types
    ):
        """jnp-in/jnp-out variant for fully on-device pipelines (AL scoring)."""
        return self._energies_and_forces(
            cartesian_positions, basis_vectors, atom_types
        )

    def _compute_batch_energy_and_forces(
        self, cartesian_positions, basis_vectors, atom_types
    ):
        energies, forces = self._energies_and_forces(
            jnp.asarray(cartesian_positions, jnp.float32),
            jnp.asarray(basis_vectors, jnp.float32),
            jnp.asarray(atom_types, jnp.int32),
        )
        return np.asarray(energies), np.asarray(forces)
