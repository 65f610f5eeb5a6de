"""High-level Python API tests (mirrors the CLI pipeline in-memory)."""

import numpy as np
import pytest

import clustering_tpu as ct


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    a = rng.normal((0.0, 0.0), 0.12, size=(150, 2))
    b = rng.normal((1.3, 0.2), 0.15, size=(110, 2))
    coords = np.concatenate([a, b]).astype(np.float32)
    return coords[rng.permutation(len(coords))]


def test_api_pipeline(data):
    pops = ct.populations(data, 0.2)
    assert (pops >= 1).all()
    multi = ct.populations(data, [0.1, 0.2])
    np.testing.assert_array_equal(multi[0.2], pops)
    fe = ct.free_energies(pops)
    assert fe.min() == 0.0
    nn = ct.nearest_neighbors(data, fe)
    assert nn.nh_idx.shape == (len(data),)
    series = ct.screening_series(data, fe, nn.nh_dist,
                                 thresholds=[0.5, 1.0, 2.0])
    assert len(series) == 3
    assert (series[0][fe > 0.5] == 0).all()
    micro = ct.fill_landscape(series[-1], nn, fe)
    assert (micro > 0).all()
    res = ct.mpp_lump(micro, fe, lagtime=2, qmin_values=[0.3, 0.6])
    assert len(res.trajectories) == 2
    cored, cores = ct.core_trajectory(micro, windows=2)
    assert cored.shape == micro.shape
    assert set(np.unique(cores)) <= set([-1] + np.unique(cored).tolist())
    clean = ct.assign_noise(micro, series[-1], cmin=5.0)
    assert clean.shape == micro.shape
    wtd = ct.waiting_time_distribution(micro, int(micro[0]))
    assert wtd[0] == 1.0


@pytest.mark.parametrize("bad", [[1.0, 0.5], [0.5, 0.5, 1.0]])
def test_screening_series_rejects_non_ascending_thresholds(data, bad):
    pops = ct.populations(data, 0.2)
    fe = ct.free_energies(pops)
    nn = ct.nearest_neighbors(data, fe)
    with pytest.raises(ValueError, match="ascending"):
        ct.screening_series(data, fe, nn.nh_dist, thresholds=bad)


def test_generic_seed_runs_full_sweep(data):
    """An arbitrary (non-series) seed is only a set of equivalences, not a
    completed fixpoint: step() must still merge old-old edges and produce
    the same partition as a cold start at the same threshold."""
    from clustering_tpu.ops.screening import ThresholdSeriesScreener
    from clustering_tpu.ops import neighbors as nbr
    pops = ct.populations(data, 0.2)
    fe = ct.free_energies(pops)
    nn = ct.nearest_neighbors(data, fe)
    max_dist2 = np.float32(4.0 * nbr.compute_sigma2(nn.nh_dist))
    cold = ThresholdSeriesScreener(data, fe, [np.float32(2.0)])
    want = cold.step(None, 0, max_dist2)
    # seed: every below-threshold frame its own singleton state -- carries
    # zero completed-fixpoint information, so only a full sweep recovers
    # the true components
    seed = np.zeros(len(data), dtype=np.int64)
    below = fe <= 2.0
    seed[below] = np.arange(1, int(below.sum()) + 1)
    warm = ThresholdSeriesScreener(data, fe, [np.float32(2.0)])
    got = warm.step(seed, 0, max_dist2)
    # same partition (names may differ only if seed order changed ranks;
    # the naming rule is rank-of-min-FE so they must match exactly here)
    np.testing.assert_array_equal(got, want)


def test_api_matches_cli_building_blocks(data):
    """API functions are the same building blocks the CLI uses."""
    from clustering_tpu import ops
    pops = ct.populations(data, 0.3)
    want = ops.populations(data, [0.3])[0.3]
    np.testing.assert_array_equal(pops, want)
