"""Multi-chip sharding tests on a virtual 8-device CPU mesh: the sharded
ops must agree exactly with the single-chip ops."""

import jax
import numpy as np
import pytest

from clustering_tpu import ops, parallel
from clustering_tpu.models import density as density_model


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return parallel.make_mesh()


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(99)
    a = rng.normal((0.0, 0.0, 0.0), 0.2, size=(130, 3))
    b = rng.normal((2.0, 0.5, -1.0), 0.25, size=(100, 3))
    return np.concatenate([a, b]).astype(np.float32)


def test_sharded_populations(mesh8, blobs):
    radii = [0.3, 0.7]
    single = ops.populations(blobs, radii, row_block=32, col_block=64)
    sharded = parallel.sharded.populations(blobs, radii, mesh8,
                                           row_block=32, col_block=64)
    for r in radii:
        np.testing.assert_array_equal(single[r], sharded[r])


def test_sharded_nearest_neighbors(mesh8, blobs):
    pops = ops.populations(blobs, [0.4], row_block=32, col_block=64)[0.4]
    fe = ops.free_energies(pops)
    single = ops.nearest_neighbors(blobs, fe, row_block=32, col_block=64)
    sharded = parallel.sharded.nearest_neighbors(blobs, fe, mesh8,
                                                 row_block=32, col_block=64)
    for i in range(4):
        np.testing.assert_array_equal(single[i], sharded[i])


def test_sharded_screening(mesh8, blobs):
    pops = ops.populations(blobs, [0.4], row_block=32, col_block=64)[0.4]
    fe = ops.free_energies(pops)
    order = density_model.sorted_fe_order(fe)
    coords_sorted = blobs[order]
    labels0 = np.arange(len(blobs), dtype=np.int32)
    for n_below, t in ((150, 0.08), (230, 0.2)):
        single = ops.screening_labels(coords_sorted, labels0, n_below, t,
                                      row_block=32, col_block=64)
        sharded = parallel.sharded.screening_labels(
            coords_sorted, labels0, n_below, t, mesh8,
            row_block=32, col_block=64)
        np.testing.assert_array_equal(single, sharded)


def test_sharded_screening_seeded(mesh8, blobs):
    pops = ops.populations(blobs, [0.4], row_block=32, col_block=64)[0.4]
    fe = ops.free_energies(pops)
    order = density_model.sorted_fe_order(fe)
    coords_sorted = blobs[order]
    labels0 = np.arange(len(blobs), dtype=np.int32)
    first = ops.screening_labels(coords_sorted, labels0, 120, 0.1,
                                 row_block=32, col_block=64)
    seeded = first.copy().astype(np.int32)
    single = ops.screening_labels(coords_sorted, seeded, 200, 0.1,
                                  row_block=32, col_block=64)
    sharded = parallel.sharded.screening_labels(
        coords_sorted, seeded, 200, 0.1, mesh8, row_block=32, col_block=64)
    np.testing.assert_array_equal(single, sharded)


def test_sharded_pallas_populations(mesh8, blobs):
    """The shard_map'd Pallas tile kernel (interpret mode on the CPU mesh)
    must agree with the sharded XLA path."""
    radii = [0.3, 0.7]
    want = parallel.sharded.populations(blobs, radii, mesh8,
                                        row_block=8, col_block=16)
    got = parallel.sharded.populations(blobs, radii, mesh8,
                                       row_block=8, col_block=16,
                                       backend="pallas")
    for r in radii:
        np.testing.assert_array_equal(want[r], got[r])


def test_sharded_pallas_nearest_neighbors(mesh8, blobs):
    pops = ops.populations(blobs, [0.4], row_block=32, col_block=64)[0.4]
    fe = ops.free_energies(pops)
    want = parallel.sharded.nearest_neighbors(blobs, fe, mesh8,
                                              row_block=8, col_block=16)
    got = parallel.sharded.nearest_neighbors(blobs, fe, mesh8,
                                             row_block=8, col_block=16,
                                             backend="pallas")
    np.testing.assert_array_equal(want[0], got[0])
    np.testing.assert_array_equal(want[2], got[2])
    np.testing.assert_allclose(want[1], got[1], rtol=1e-6)
    np.testing.assert_allclose(want[3], got[3], rtol=1e-6)


def test_sharded_pallas_screening(mesh8, blobs):
    pops = ops.populations(blobs, [0.4], row_block=32, col_block=64)[0.4]
    fe = ops.free_energies(pops)
    order = density_model.sorted_fe_order(fe)
    cs = blobs[order]
    labels0 = np.arange(len(blobs), dtype=np.int32)
    for nb, t in ((150, 0.08), (230, 0.2)):
        want = parallel.sharded.screening_labels(
            cs, labels0, nb, t, mesh8, row_block=8, col_block=16)
        got = parallel.sharded.screening_labels(
            cs, labels0, nb, t, mesh8, row_block=8, col_block=16,
            backend="pallas")
        np.testing.assert_array_equal(want, got)
