"""Equivariant alignment ("optimal transport") on the hyper-torus.

Finds a symmetry-group image (point-group operation + permutation, after
removing the toroidal center of mass) of a target configuration mu that is
close to a source configuration x. Used to (a) align noised coordinates with
the clean ones during training and (b) build the equivariant analytical score
network.

Capability parity with the reference transporter
(src/diffusion_for_multi_scale_molecular_dynamics/transport/transporter.py,
transport/distance.py), with a TPU-aware split:

  * all geometry (toroidal center of mass via atan2, geodesic displacements,
    cost matrices over every point-group operation) is batched jnp — the
    reference computes cost matrices on device too;
  * the linear assignment problem itself is combinatorial host work in the
    reference (a python loop of scipy ``linear_sum_assignment`` calls). Here
    a single ``jax.pure_callback`` solves all [batch * n_ops] LAPs at once,
    so the op remains usable inside jit; systems are <= a few hundred atoms,
    so the host cost is negligible and fully overlapped with device work.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import map_relative_coordinates_to_unit_cell

_EXACT = jax.lax.Precision.HIGHEST


def get_geodesic_displacements(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Shortest signed displacement x2 - x1 on the unit torus, in (-1/2, 1/2]."""
    delta = map_relative_coordinates_to_unit_cell(x2 - x1)
    return jnp.where(delta > 0.5, delta - 1.0, delta)


def _solve_lap_host(cost_matrices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Solve a stack of LAPs on the host (scipy). [M, n, n] -> cols [M, n], costs [M]."""
    from scipy.optimize import linear_sum_assignment

    m, n, _ = cost_matrices.shape
    cols = np.empty((m, n), dtype=np.int32)
    costs = np.empty((m,), dtype=cost_matrices.dtype)
    for i in range(m):
        row, col = linear_sum_assignment(cost_matrices[i])
        cols[i] = col.astype(np.int32)
        costs[i] = cost_matrices[i][row, col].sum()
    return cols, costs


class Transporter:
    """Aligns mu to x under translations x point group x permutations."""

    def __init__(self, point_group_operations: jnp.ndarray):
        """Args:
        point_group_operations: [n_ops, d, d] matrices (identity-only for
            pure permutation/translation alignment).
        """
        self.point_group_operations = jnp.asarray(
            point_group_operations, dtype=jnp.float32
        )

    @staticmethod
    def get_atan2_translation(x: jnp.ndarray) -> jnp.ndarray:
        """Toroidal center of mass via the circular mean, [batch, d]."""
        two_pi = 2.0 * jnp.pi
        x_bar = jnp.mean(jnp.cos(two_pi * x), axis=1)
        y_bar = jnp.mean(jnp.sin(two_pi * x), axis=1)
        return jnp.arctan2(y_bar, x_bar) / two_pi

    def get_translation_invariant(self, x: jnp.ndarray) -> jnp.ndarray:
        """Remove the toroidal center of mass."""
        com = self.get_atan2_translation(x)[:, None, :]
        return map_relative_coordinates_to_unit_cell(x - com)

    def _get_all_cost_matrices(
        self, x_invariant: jnp.ndarray, mu_invariant: jnp.ndarray
    ) -> jnp.ndarray:
        """Squared-geodesic cost matrices for every point-group op, [b, o, n, n]."""
        rotated_mu = jnp.einsum(
            "ode,bne->bond", self.point_group_operations, mu_invariant,
            precision=_EXACT,
        )
        # cost[b, o, i, j] = |geodesic(x_i, (g mu)_j)|^2
        x_exp = x_invariant[:, None, :, None, :]
        mu_exp = rotated_mu[:, :, None, :, :]
        disp = get_geodesic_displacements(mu_exp, x_exp)
        return jnp.sum(disp**2, axis=-1)

    def get_optimal_transport(self, x: jnp.ndarray, mu: jnp.ndarray) -> jnp.ndarray:
        """Best-aligned symmetry image of mu w.r.t. x (jit-compatible).

        Args:
            x, mu: [batch, natoms, d] points on the torus.

        Returns:
            aligned mu, [batch, natoms, d].
        """
        batch, natoms, d = x.shape
        n_ops = self.point_group_operations.shape[0]

        x_inv = self.get_translation_invariant(x)
        mu_inv = self.get_translation_invariant(mu)
        costs = self._get_all_cost_matrices(x_inv, mu_inv)  # [b, o, n, n]

        flat_costs = costs.reshape(batch * n_ops, natoms, natoms)
        cols, totals = jax.pure_callback(
            _solve_lap_host,
            (
                jax.ShapeDtypeStruct((batch * n_ops, natoms), jnp.int32),
                jax.ShapeDtypeStruct((batch * n_ops,), flat_costs.dtype),
            ),
            flat_costs,
            vmap_method="sequential",
        )
        cols = cols.reshape(batch, n_ops, natoms)
        totals = totals.reshape(batch, n_ops)

        best_op = jnp.argmin(totals, axis=1)  # [b]
        best_cols = jnp.take_along_axis(
            cols, best_op[:, None, None], axis=1
        ).squeeze(1)  # [b, n]: row i of x matches column best_cols[i] of (g mu)

        rotated_mu = jnp.einsum(
            "bde,bne->bnd",
            self.point_group_operations[best_op],
            mu_inv,
            precision=_EXACT,
        )
        aligned = jnp.take_along_axis(
            rotated_mu, best_cols[..., None], axis=1
        )  # aligned[b, i] = (g mu)_{col(i)}
        return map_relative_coordinates_to_unit_cell(aligned)
