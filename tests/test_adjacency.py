import jax.numpy as jnp
import numpy as np

from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.adjacency import (
    get_periodic_adjacency_information,
    to_ragged_numpy,
)
from tests.test_neighbors import naive_periodic_neighbors


def test_coo_adjacency_matches_naive():
    rng = np.random.RandomState(3)
    n, batch = 10, 2
    cell = np.diag([6.0, 6.5, 7.0]).astype(np.float32)
    x = rng.uniform(size=(batch, n, 3)).astype(np.float32)
    pos = x @ cell
    cutoff = 3.2

    info = get_periodic_adjacency_information(
        jnp.asarray(pos), jnp.asarray(np.tile(cell, (batch, 1, 1))), cutoff, capacity=40
    )
    adjacency, shifts, edge_batch, n_edges = to_ragged_numpy(info)

    for b in range(batch):
        naive = naive_periodic_neighbors(pos[b].astype(np.float64), cell, cutoff)
        assert n_edges[b] == len(naive)
        sel = edge_batch == b
        got = sorted(
            (
                int(adjacency[0, k]) - b * n,
                int(adjacency[1, k]) - b * n,
                tuple(np.round(shifts[k], 3)),
            )
            for k in np.where(sel)[0]
        )
        expected = sorted(
            (i, j, tuple(np.round(np.asarray(s, dtype=float) @ cell, 3)))
            for (i, j, s, r) in naive
        )
        assert got == expected

    # Reconstructed distances match: |r_dst + shift - r_src| <= cutoff.
    src = adjacency[0] % n
    dst = adjacency[1] % n
    flat_pos = pos.reshape(-1, 3)
    d = np.linalg.norm(
        flat_pos[adjacency[1]] + shifts - flat_pos[adjacency[0]], axis=-1
    )
    assert (d <= cutoff + 1e-5).all()
