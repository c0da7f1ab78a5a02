import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.neighbors import (
    compute_distances_in_batch,
    get_fixed_capacity_neighbors,
    get_min_image_pair_distances,
    get_periodic_images,
    get_shortest_distance_that_crosses_unit_cell,
)


def naive_periodic_neighbors(positions, cell, cutoff):
    """O(n^2 * 27) reference: list of (i, j, shift, distance) within cutoff."""
    n, d = positions.shape
    out = []
    shifts = []
    for sx in (-1, 0, 1):
        for sy in (-1, 0, 1):
            for sz in (-1, 0, 1):
                shifts.append((sx, sy, sz))
    for i in range(n):
        for j in range(n):
            for s in shifts:
                if i == j and s == (0, 0, 0):
                    continue
                disp = positions[j] + np.asarray(s, dtype=float) @ cell - positions[i]
                r = np.linalg.norm(disp)
                if r <= cutoff:
                    out.append((i, j, s, r))
    return out


@pytest.fixture
def small_system():
    rng = np.random.RandomState(7)
    n = 12
    cell = np.diag([6.0, 7.0, 8.0]).astype(np.float32)
    x = rng.uniform(size=(n, 3)).astype(np.float32)
    pos = x @ cell
    return pos, cell


def test_fixed_capacity_matches_naive(small_system):
    pos, cell = small_system
    cutoff = 3.5
    table = get_fixed_capacity_neighbors(
        jnp.asarray(pos[None]), jnp.asarray(cell[None]), cutoff, capacity=40
    )
    naive = naive_periodic_neighbors(pos.astype(np.float64), cell, cutoff)

    mask = np.asarray(table.mask[0])
    dist = np.asarray(table.distances[0])
    idx = np.asarray(table.indices[0])

    # 1) counts per atom match
    n = pos.shape[0]
    naive_counts = np.zeros(n, dtype=int)
    for i, j, s, r in naive:
        naive_counts[i] += 1
    np.testing.assert_array_equal(mask.sum(-1), naive_counts)

    # 2) multisets of (j, round(distance)) per atom match
    for i in range(n):
        got = sorted(
            (int(j), round(float(r), 3))
            for j, r, m in zip(idx[i], dist[i], mask[i])
            if m
        )
        expected = sorted((j, round(r, 3)) for (i2, j, s, r) in naive if i2 == i)
        assert got == expected, f"atom {i}"


def test_capacity_truncation_keeps_closest(small_system):
    pos, cell = small_system
    cutoff = 5.0
    full = get_fixed_capacity_neighbors(
        jnp.asarray(pos[None]), jnp.asarray(cell[None]), cutoff, capacity=120
    )
    small = get_fixed_capacity_neighbors(
        jnp.asarray(pos[None]), jnp.asarray(cell[None]), cutoff, capacity=5
    )
    # The 5 kept slots must be the 5 smallest distances of the full table.
    d_full = np.sort(np.where(np.asarray(full.mask[0]), np.asarray(full.distances[0]), np.inf))[:, :5]
    d_small = np.sort(np.where(np.asarray(small.mask[0]), np.asarray(small.distances[0]), np.inf))
    np.testing.assert_allclose(d_small, d_full, atol=1e-5)


def test_atom_mask_excludes_padding(small_system):
    pos, cell = small_system
    atom_mask = np.ones(pos.shape[0], dtype=bool)
    atom_mask[-3:] = False
    table = get_fixed_capacity_neighbors(
        jnp.asarray(pos[None]),
        jnp.asarray(cell[None]),
        3.5,
        capacity=40,
        atom_mask=jnp.asarray(atom_mask[None]),
    )
    mask = np.asarray(table.mask[0])
    idx = np.asarray(table.indices[0])
    # padded atoms have no neighbors
    assert mask[-3:].sum() == 0
    # no valid slot points to a padded atom
    assert not np.any(mask & (idx >= pos.shape[0] - 3))


def test_min_image_distances_symmetric(small_system):
    pos, cell = small_system
    dmat = np.asarray(
        get_min_image_pair_distances(jnp.asarray(pos[None]), jnp.asarray(cell[None]))
    )[0]
    np.testing.assert_allclose(dmat, dmat.T, atol=1e-5)
    assert (dmat > 0).all()  # diagonal excluded => min over images of self > 0


def test_compute_distances_in_batch(small_system):
    pos, cell = small_system
    cutoff = 3.0
    dists = np.asarray(
        compute_distances_in_batch(
            jnp.asarray(pos[None]), jnp.asarray(cell[None]), cutoff
        )
    )[0]
    finite = np.sort(dists[np.isfinite(dists)])
    naive = naive_periodic_neighbors(pos.astype(np.float64), cell, cutoff)
    expected = np.sort([r for (_, _, _, r) in naive])
    np.testing.assert_allclose(finite, expected, atol=1e-4)


def test_shortest_crossing_distance():
    cell = jnp.asarray(np.diag([4.0, 6.0, 9.0]).astype(np.float32)[None])
    got = float(get_shortest_distance_that_crosses_unit_cell(cell)[0])
    assert got == pytest.approx(4.0, rel=1e-5)


def test_periodic_images_jit_and_vmap(small_system):
    pos, cell = small_system
    fn = jax.jit(get_periodic_images)
    images = fn(jnp.asarray(pos[None]), jnp.asarray(cell[None]))
    assert images.distances.shape == (1, 12, 12, 27)
    assert bool(images.self_mask[0, 0, 13])  # central image index = 13
