"""TRUE golden parity: run the *reference's own* CPU density code (compiled
from /root/reference via tests/density_oracle.cpp with a minimal
program_options stub) and compare populations, NN lists and full seeded
screening series against clustering_tpu.

Notes on comparability (see docs/PARITY.md):
  * populations: the reference CPU path counts d2 < r^2 (self pre-counted),
    ours d2 <= r^2 (self included) -- identical away from exact boundary
    ties, which random fixtures avoid.
  * the fixture free energies are distinct per frame so the reference's
    unstable FE sort and our stable sort induce the same order.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from clustering_tpu import ops
from clustering_tpu.models import density as density_model

REF_SRC = "/root/reference/src"
STUB = os.path.join(os.path.dirname(__file__), "refstub")
ORACLE_SRC = os.path.join(os.path.dirname(__file__), "density_oracle.cpp")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    cxx = shutil.which("g++")
    if cxx is None or not os.path.isdir(REF_SRC):
        pytest.skip("reference sources or g++ unavailable")
    exe = tmp_path_factory.mktemp("oracle") / "density_oracle"
    subprocess.run(
        [cxx, "-O2", "-fopenmp", "-std=c++11", "-I", STUB, "-I", REF_SRC,
         ORACLE_SRC,
         os.path.join(REF_SRC, "density_clustering.cpp"),
         os.path.join(REF_SRC, "density_clustering_common.cpp"),
         os.path.join(REF_SRC, "tools.cpp"),
         os.path.join(REF_SRC, "logger.cpp"),
         "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    rng = np.random.default_rng(77)
    a = rng.normal((0.0, 0.0, 0.0), 0.15, size=(200, 3))
    b = rng.normal((1.5, 0.5, -0.5), 0.2, size=(150, 3))
    c = rng.normal((-1.0, 1.5, 1.0), 0.12, size=(80, 3))
    coords = np.concatenate([a, b, c]).astype(np.float32)
    coords = coords[rng.permutation(len(coords))]
    d = tmp_path_factory.mktemp("golden")
    path = d / "coords.dat"
    np.savetxt(path, coords, fmt="%.6f")
    # re-read so both sides work from the identical quantized values
    coords = np.loadtxt(path, dtype=np.float32)
    # distinct free energies (no sort-order ties)
    fe = (rng.permutation(len(coords)).astype(np.float32)
          / len(coords) * 3.0)
    fe_path = d / "fe.dat"
    np.savetxt(fe_path, fe, fmt="%.9g")
    fe = np.loadtxt(fe_path, dtype=np.float32)
    return str(path), coords, str(fe_path), fe


def test_populations_match_reference(oracle, fixture):
    path, coords, _, _ = fixture
    radii = [0.2, 0.3, 0.5]
    out = subprocess.run([oracle, "pops", path] + [str(r) for r in radii],
                        check=True, capture_output=True, text=True).stdout
    ref = {}
    current = None
    for line in out.splitlines():
        if line.startswith("# r "):
            current = ref.setdefault(float(line.split()[2]), [])
        else:
            current.append(int(line))
    got = ops.populations(coords, radii, row_block=32, col_block=64)
    for r in radii:
        np.testing.assert_array_equal(got[r], np.asarray(ref[r]))


def test_nearest_neighbors_match_reference(oracle, fixture):
    path, coords, fe_path, fe = fixture
    out = subprocess.run([oracle, "nn", path, fe_path],
                        check=True, capture_output=True, text=True).stdout
    ref = np.asarray([[float(v) for v in line.split()]
                      for line in out.splitlines()])
    nh_j, nh_d, hd_j, hd_d = ops.nearest_neighbors(
        coords, fe, row_block=32, col_block=64)
    np.testing.assert_array_equal(nh_j, ref[:, 0].astype(np.int64))
    np.testing.assert_allclose(nh_d, ref[:, 1], rtol=2e-6)
    # reference CPU reports n_rows+1 when no lower-fe neighbor exists;
    # we follow the CUDA convention (0, 0.0)
    has_hd = ref[:, 2].astype(np.int64) != len(coords) + 1
    np.testing.assert_array_equal(hd_j[has_hd],
                                  ref[has_hd, 2].astype(np.int64))
    np.testing.assert_allclose(hd_d[has_hd], ref[has_hd, 3], rtol=2e-6)
    assert (hd_j[~has_hd] == 0).all()


def test_screening_series_matches_reference(oracle, fixture):
    path, coords, fe_path, fe = fixture
    thresholds = [0.8, 1.6, 2.4]
    out = subprocess.run(
        [oracle, "screen", path, fe_path] + [str(t) for t in thresholds],
        check=True, capture_output=True, text=True).stdout
    ref_blocks = []
    for line in out.splitlines():
        if line.startswith("# t "):
            ref_blocks.append([])
        else:
            ref_blocks[-1].append(int(line))
    # our side: same nh distances feed sigma^2
    nh_j, nh_d, _, _ = ops.nearest_neighbors(coords, fe,
                                             row_block=32, col_block=64)
    order = density_model.sorted_fe_order(fe)
    cs = coords[order]
    eng = ops.screening.ScreeningEngine(cs, row_block=32, col_block=64)
    clustering = None
    for t, ref_block in zip(thresholds, ref_blocks):
        clustering = density_model.screening_step(
            fe, nh_d, t, coords, clustering, order=order,
            coords_sorted=cs, engine=eng)
        np.testing.assert_array_equal(clustering, np.asarray(ref_block))


def test_series_screener_matches_reference(oracle, fixture):
    """The production (band, Morton)-ordered incremental screener against
    the reference binary."""
    path, coords, fe_path, fe = fixture
    thresholds = [0.8, 1.6, 2.4]
    out = subprocess.run(
        [oracle, "screen", path, fe_path] + [str(t) for t in thresholds],
        check=True, capture_output=True, text=True).stdout
    ref_blocks = []
    for line in out.splitlines():
        if line.startswith("# t "):
            ref_blocks.append([])
        else:
            ref_blocks[-1].append(int(line))
    _, nh_d, _, _ = ops.nearest_neighbors(coords, fe,
                                          row_block=32, col_block=64)
    md2 = np.float32(4.0 * ops.neighbors.compute_sigma2(nh_d))
    series = ops.screening.ThresholdSeriesScreener(
        coords, fe, [np.float32(t) for t in thresholds],
        row_block=32, col_block=64)
    clustering = None
    for k, ref_block in enumerate(ref_blocks):
        clustering = series.step(clustering, k, md2)
        np.testing.assert_array_equal(clustering, np.asarray(ref_block))


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505, 606, 707, 808])
def test_fuzz_pipeline_matches_reference(oracle, tmp_path, seed):
    """Randomized configurations (frame count, dimensionality, basin
    geometry, radii, thresholds) against the reference's own compiled
    density code -- populations, NN lists, and the hd-seeded incremental
    series screener."""
    rng = np.random.default_rng(seed)
    d = int(rng.integers(2, 6))
    n_basins = int(rng.integers(1, 5))
    centers = rng.normal(0.0, 1.2, size=(n_basins, d))
    sizes = rng.integers(40, 220, size=n_basins)
    coords = np.concatenate([
        rng.normal(c, rng.uniform(0.08, 0.3), size=(s, d))
        for c, s in zip(centers, sizes)]).astype(np.float32)
    coords = coords[rng.permutation(len(coords))]
    n = len(coords)
    path = tmp_path / "coords.dat"
    np.savetxt(path, coords, fmt="%.6f")
    coords = np.loadtxt(path, dtype=np.float32, ndmin=2)
    fe = (rng.permutation(n).astype(np.float32) / n
          * rng.uniform(1.5, 4.0))
    fe_path = tmp_path / "fe.dat"
    np.savetxt(fe_path, fe, fmt="%.9g")
    fe = np.loadtxt(fe_path, dtype=np.float32)

    radii = sorted(rng.uniform(0.1, 0.6, size=3))
    out = subprocess.run(
        [oracle, "pops", str(path)] + [str(r) for r in radii],
        check=True, capture_output=True, text=True).stdout
    ref_pop_blocks = []
    for line in out.splitlines():
        if line.startswith("# r "):
            ref_pop_blocks.append([])
        else:
            ref_pop_blocks[-1].append(int(line))
    got = ops.populations(coords, list(radii), row_block=8, col_block=32)
    for r, block in zip(radii, ref_pop_blocks):
        np.testing.assert_array_equal(got[r], np.asarray(block))

    out = subprocess.run([oracle, "nn", str(path), str(fe_path)],
                         check=True, capture_output=True, text=True).stdout
    refnn = np.asarray([[float(v) for v in line.split()]
                        for line in out.splitlines()])
    nh_j, nh_d, hd_j, hd_d = ops.nearest_neighbors(
        coords, fe, row_block=8, col_block=32)
    np.testing.assert_array_equal(nh_j, refnn[:, 0].astype(np.int64))
    has_hd = refnn[:, 2].astype(np.int64) != n + 1
    np.testing.assert_array_equal(hd_j[has_hd],
                                  refnn[has_hd, 2].astype(np.int64))

    thresholds = sorted(rng.uniform(0.3, float(fe.max()), size=3))
    out = subprocess.run(
        [oracle, "screen", str(path), str(fe_path)]
        + [str(t) for t in thresholds],
        check=True, capture_output=True, text=True).stdout
    ref_blocks = []
    for line in out.splitlines():
        if line.startswith("# t "):
            ref_blocks.append([])
        else:
            ref_blocks[-1].append(int(line))
    md2 = np.float32(4.0 * ops.neighbors.compute_sigma2(nh_d))
    series = ops.screening.ThresholdSeriesScreener(
        coords, fe, [np.float32(t) for t in thresholds],
        row_block=8, col_block=32, hd_neighbors=(hd_j, hd_d))
    clustering = None
    for k, ref_block in enumerate(ref_blocks):
        clustering = series.step(clustering, k, md2)
        np.testing.assert_array_equal(clustering, np.asarray(ref_block))
