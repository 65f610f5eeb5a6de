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


def _run_oracle(oracle, mode, *args):
    out = subprocess.run([oracle, mode] + [str(a) for a in args],
                         check=True, capture_output=True, text=True).stdout
    return out


def _parse_blocks(out, prefix):
    blocks = []
    for line in out.splitlines():
        if line.startswith(prefix):
            blocks.append([])
        else:
            blocks[-1].append(int(line))
    return blocks


def test_large_scale_matches_reference(oracle, tmp_path):
    """>= 10^4-frame golden parity (round-1 fixtures capped at ~900
    frames): populations, NN indices, and the production incremental
    series screener against the reference's own compiled code."""
    rng = np.random.default_rng(4242)
    d = 3
    centers = rng.normal(0.0, 1.5, size=(6, d))
    coords = np.concatenate([
        rng.normal(c, rng.uniform(0.1, 0.25), size=(2000, d))
        for c in centers]).astype(np.float32)
    coords = coords[rng.permutation(len(coords))]
    n = len(coords)
    assert n == 12000
    path = tmp_path / "coords.dat"
    np.savetxt(path, coords, fmt="%.6f")
    coords = np.loadtxt(path, dtype=np.float32, ndmin=2)
    fe = rng.permutation(n).astype(np.float32) / n * 3.0
    fe_path = tmp_path / "fe.dat"
    np.savetxt(fe_path, fe, fmt="%.9g")
    fe = np.loadtxt(fe_path, dtype=np.float32)

    radii = [0.2, 0.4]
    blocks = _parse_blocks(_run_oracle(oracle, "pops", path, *radii), "# r ")
    got = ops.populations(coords, radii, row_block=64, col_block=256)
    for r, block in zip(radii, blocks):
        np.testing.assert_array_equal(got[r], np.asarray(block))

    refnn = np.asarray([[float(v) for v in line.split()] for line in
                        _run_oracle(oracle, "nn", path, fe_path)
                        .splitlines()])
    nh_j, nh_d, hd_j, hd_d = ops.nearest_neighbors(
        coords, fe, row_block=64, col_block=256)
    np.testing.assert_array_equal(nh_j, refnn[:, 0].astype(np.int64))
    has_hd = refnn[:, 2].astype(np.int64) != n + 1
    np.testing.assert_array_equal(hd_j[has_hd],
                                  refnn[has_hd, 2].astype(np.int64))

    thresholds = [1.0, 2.0]
    ref_blocks = _parse_blocks(
        _run_oracle(oracle, "screen", path, fe_path, *thresholds), "# t ")
    md2 = np.float32(4.0 * ops.neighbors.compute_sigma2(nh_d))
    series = ops.screening.ThresholdSeriesScreener(
        coords, fe, [np.float32(t) for t in thresholds],
        row_block=64, col_block=256, hd_neighbors=(hd_j, hd_d))
    clustering = None
    for k, ref_block in enumerate(ref_blocks):
        clustering = series.step(clustering, k, md2)
        np.testing.assert_array_equal(clustering, np.asarray(ref_block))


def test_exact_boundary_ties_adversarial(oracle, tmp_path):
    """Grid-quantized coordinates put many pairs at exactly d2 == r2. The
    only admissible divergence is the documented pops predicate (reference
    CPU strict '<', ours '<=', docs/PARITY.md): populations must differ by
    exactly the per-frame count of boundary pairs, and NN indices plus the
    full screening series must still match bit-for-bit (both sides use
    strict '<' adjacency)."""
    rng = np.random.default_rng(9)
    # all coordinates are multiples of 0.25 -> d2 values are exact binary
    # fractions; r = 0.5 gives r2 = 0.25 == d2 of axis-adjacent pairs.
    # Distinct grid cells only: duplicates are a separate (also
    # documented) deviation class tested in
    # test_duplicate_frames_adversarial
    cells = rng.choice(24 * 24, size=400, replace=False)
    coords = (np.stack([cells // 24, cells % 24], axis=1)
              * 0.25).astype(np.float32)
    path = tmp_path / "coords.dat"
    np.savetxt(path, coords, fmt="%.6f")
    coords = np.loadtxt(path, dtype=np.float32, ndmin=2)
    n = len(coords)
    fe = rng.permutation(n).astype(np.float32) / n * 2.0
    fe_path = tmp_path / "fe.dat"
    np.savetxt(fe_path, fe, fmt="%.9g")
    fe = np.loadtxt(fe_path, dtype=np.float32)

    r = 0.5
    r2 = np.float32(r) * np.float32(r)
    # exact fp32 pairwise distances in the kernels' ascending-d order
    acc = np.zeros((n, n), dtype=np.float32)
    for k in range(coords.shape[1]):
        diff = coords[:, k][:, None] - coords[:, k][None, :]
        acc = (acc + diff * diff).astype(np.float32)
    boundary = (acc == r2).sum(axis=1)
    assert boundary.sum() > 0, "fixture has no exact boundary ties"

    block = _parse_blocks(_run_oracle(oracle, "pops", path, r), "# r ")[0]
    got = ops.populations(coords, [r], row_block=32, col_block=64)[r]
    np.testing.assert_array_equal(got, np.asarray(block) + boundary)

    refnn = np.asarray([[float(v) for v in line.split()] for line in
                        _run_oracle(oracle, "nn", path, fe_path)
                        .splitlines()])
    nh_j, nh_d, hd_j, hd_d = ops.nearest_neighbors(
        coords, fe, row_block=32, col_block=64)
    np.testing.assert_array_equal(nh_j, refnn[:, 0].astype(np.int64))

    thresholds = [0.8, 1.6]
    ref_blocks = _parse_blocks(
        _run_oracle(oracle, "screen", path, fe_path, *thresholds), "# t ")
    md2 = np.float32(4.0 * ops.neighbors.compute_sigma2(nh_d))
    series = ops.screening.ThresholdSeriesScreener(
        coords, fe, [np.float32(t) for t in thresholds],
        row_block=32, col_block=64, hd_neighbors=(hd_j, hd_d))
    clustering = None
    for k, ref_block in enumerate(ref_blocks):
        clustering = series.step(clustering, k, md2)
        np.testing.assert_array_equal(clustering, np.asarray(ref_block))


def test_duplicate_frames_adversarial(oracle, tmp_path):
    """Exactly-duplicated frames: populations and the screening series
    must match the reference bit-for-bit (zero-distance pairs are counted
    and linked identically); nearest neighbors diverge ONLY in the
    documented way (the reference reports the duplicate at distance 0,
    we exclude zero-distance pairs -- docs/PARITY.md)."""
    rng = np.random.default_rng(13)
    base = np.concatenate([
        rng.normal((0.0, 0.0), 0.15, size=(120, 2)),
        rng.normal((1.2, 0.5), 0.18, size=(100, 2))]).astype(np.float32)
    dup_src = rng.choice(len(base), size=40, replace=False)
    coords = np.concatenate([base, base[dup_src]])
    coords = coords[rng.permutation(len(coords))]
    path = tmp_path / "coords.dat"
    np.savetxt(path, coords, fmt="%.6f")
    coords = np.loadtxt(path, dtype=np.float32, ndmin=2)
    n = len(coords)
    fe = rng.permutation(n).astype(np.float32) / n * 2.0
    fe_path = tmp_path / "fe.dat"
    np.savetxt(fe_path, fe, fmt="%.9g")
    fe = np.loadtxt(fe_path, dtype=np.float32)
    _, uniq_inverse, uniq_counts = np.unique(
        coords, axis=0, return_inverse=True, return_counts=True)
    is_dup = uniq_counts[uniq_inverse] > 1
    assert is_dup.sum() >= 80

    r = 0.3
    block = _parse_blocks(_run_oracle(oracle, "pops", path, r), "# r ")[0]
    got = ops.populations(coords, [r], row_block=32, col_block=64)[r]
    np.testing.assert_array_equal(got, np.asarray(block))

    refnn = np.asarray([[float(v) for v in line.split()] for line in
                        _run_oracle(oracle, "nn", path, fe_path)
                        .splitlines()])
    nh_j, nh_d, hd_j, hd_d = ops.nearest_neighbors(
        coords, fe, row_block=32, col_block=64)
    # non-duplicated frames: identical
    np.testing.assert_array_equal(nh_j[~is_dup],
                                  refnn[~is_dup, 0].astype(np.int64))
    # duplicated frames: the reference latches the duplicate at d2 == 0,
    # we report the nearest strictly-positive neighbor -- the ONLY
    # divergence class
    assert (refnn[is_dup, 1] == 0.0).all()
    assert (nh_d[is_dup] > 0.0).all()

    thresholds = [0.8, 1.6]
    ref_blocks = _parse_blocks(
        _run_oracle(oracle, "screen", path, fe_path, *thresholds), "# t ")
    md2 = np.float32(4.0 * ops.neighbors.compute_sigma2(
        np.asarray(refnn[:, 1], dtype=np.float32)))
    series = ops.screening.ThresholdSeriesScreener(
        coords, fe, [np.float32(t) for t in thresholds],
        row_block=32, col_block=64)
    clustering = None
    for k, ref_block in enumerate(ref_blocks):
        clustering = series.step(clustering, k, md2)
        np.testing.assert_array_equal(clustering, np.asarray(ref_block))


def test_empty_new_band_matches_reference(oracle, fixture):
    """-T series step admitting zero new frames (a threshold gap with no
    frames in it) must early-out to the previous clustering exactly as
    the reference does."""
    path, coords, fe_path, fe = fixture
    lo = float(fe.max()) + 0.5
    thresholds = [lo, lo + 0.25, lo + 0.5]  # bands 2 and 3 are empty
    ref_blocks = _parse_blocks(
        _run_oracle(oracle, "screen", path, fe_path, *thresholds), "# t ")
    _, nh_d, hd_j, hd_d = ops.nearest_neighbors(coords, fe,
                                                row_block=32, col_block=64)
    md2 = np.float32(4.0 * ops.neighbors.compute_sigma2(nh_d))
    series = ops.screening.ThresholdSeriesScreener(
        coords, fe, [np.float32(t) for t in thresholds],
        row_block=32, col_block=64, hd_neighbors=(hd_j, hd_d))
    clustering = None
    for k, ref_block in enumerate(ref_blocks):
        clustering = series.step(clustering, k, md2)
        np.testing.assert_array_equal(clustering, np.asarray(ref_block),
                                      err_msg=f"threshold {k}")
