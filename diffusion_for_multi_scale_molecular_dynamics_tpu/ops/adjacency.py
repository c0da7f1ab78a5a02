"""COO-style adjacency view over the fixed-capacity neighbor tables.

Some consumers (graph libraries, exports, parity with the reference's
`AdjacencyInfo`/`get_adj_matrix` interface — utils/neighbors.py:24,
models/graph_utils.py:10) want edge lists. This module flattens the
static-shape NeighborTable into padded COO arrays with an edge mask — still
jit-friendly (no dynamic edge counts), trivially convertible to ragged numpy
on the host.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .neighbors import get_fixed_capacity_neighbors


class AdjacencyInfo(NamedTuple):
    """Padded COO periodic adjacency.

    Attributes:
        adjacency_matrix: [2, batch * natoms * capacity] (source, destination)
            node indices, shifted for disconnected-graph batching
            (node of atom a in sample b = b * natoms + a).
        shifts: cartesian periodic shift vectors per edge, [E, d].
        edge_batch_indices: sample index per edge, [E].
        node_batch_indices: sample index per node, [batch * natoms].
        edge_mask: validity of each padded edge slot, [E].
        number_of_edges: valid-edge count per sample, [batch].
    """

    adjacency_matrix: jnp.ndarray
    shifts: jnp.ndarray
    edge_batch_indices: jnp.ndarray
    node_batch_indices: jnp.ndarray
    edge_mask: jnp.ndarray
    number_of_edges: jnp.ndarray


def get_periodic_adjacency_information(
    cartesian_positions: jnp.ndarray,
    basis_vectors: jnp.ndarray,
    radial_cutoff: float,
    capacity: int = 32,
) -> AdjacencyInfo:
    """Padded COO edge lists within a radial cutoff (one image shell).

    Args:
        cartesian_positions: [batch, natoms, d]
        basis_vectors: [batch, d, d]
        radial_cutoff: static float.
        capacity: max neighbors per atom (static).
    """
    batch, natoms, d = cartesian_positions.shape
    table = get_fixed_capacity_neighbors(
        cartesian_positions, basis_vectors, radial_cutoff, capacity
    )

    atom_index = jnp.arange(natoms)[None, :, None]  # source node i
    source = jnp.broadcast_to(atom_index, table.indices.shape)
    destination = table.indices

    node_offset = (jnp.arange(batch) * natoms)[:, None, None]
    source = (source + node_offset).reshape(-1)
    destination = (destination + node_offset).reshape(-1)

    # Cartesian shift = displacement - (r_j - r_i).
    r_i = cartesian_positions[:, :, None, :]
    r_j = jnp.take_along_axis(
        cartesian_positions[:, None, :, :].repeat(natoms, axis=1),
        table.indices[..., None],
        axis=2,
    )
    shifts = (table.displacements - (r_j - r_i)).reshape(-1, d)

    edge_batch = jnp.broadcast_to(
        jnp.arange(batch)[:, None, None], table.indices.shape
    ).reshape(-1)
    node_batch = jnp.repeat(jnp.arange(batch), natoms)

    edge_mask = table.mask.reshape(-1)
    number_of_edges = jnp.sum(table.mask, axis=(1, 2))

    return AdjacencyInfo(
        adjacency_matrix=jnp.stack([source, destination]),
        shifts=shifts,
        edge_batch_indices=edge_batch,
        node_batch_indices=node_batch,
        edge_mask=edge_mask,
        number_of_edges=number_of_edges,
    )


def to_ragged_numpy(info: AdjacencyInfo):
    """Host-side view keeping only valid edges (ragged across samples)."""
    mask = np.asarray(info.edge_mask)
    return (
        np.asarray(info.adjacency_matrix)[:, mask],
        np.asarray(info.shifts)[mask],
        np.asarray(info.edge_batch_indices)[mask],
        np.asarray(info.number_of_edges),
    )
