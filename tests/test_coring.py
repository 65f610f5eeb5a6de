import numpy as np

from clustering_tpu.models.coring import (compute_wtd, core_trajectory)


def oracle_core(states, concat_limits, windows, size_for_all,
                iterative=False):
    """Literal sequential transcription of the reference scan
    (src/coring.cpp:217-284) used as an independent oracle."""
    states = list(states)
    n = len(states)
    win = lambda s: windows.get(s, size_for_all)
    max_window = max(win(s) for s in set(states))
    ramp = list(range(2, max_window + 1)) if (iterative and max_window > 1) \
        else [max_window]
    prev = list(states)
    cored = [0] * n
    cores = [0] * n
    changed = 0
    for curr_max in ramp:
        changed = 0
        last_limit = 0
        for next_limit in concat_limits:
            hi = min(next_limit, n)
            # find first core (window truncated at chunk end)
            current_core = prev[last_limit]
            for i in range(last_limit, hi):
                cw = min(curr_max, win(prev[i]))
                w = min(i + cw, next_limit)
                if all(prev[j] == prev[i] for j in range(i + 1, w)):
                    current_core = prev[i]
                    break
            for i in range(last_limit, hi):
                cw = min(curr_max, win(prev[i]))
                if i + cw <= next_limit:
                    if iterative:
                        in_core = prev[i + cw - 1] == prev[i]
                    else:
                        in_core = all(prev[j] == prev[i]
                                      for j in range(i + 1, i + cw))
                else:
                    in_core = False
                if in_core:
                    current_core = prev[i]
                if curr_max == max_window:
                    cores[i] = current_core if in_core else -1
                    if current_core != states[i]:
                        changed += 1
                cored[i] = current_core
            last_limit = hi
        prev = list(cored)
    return np.asarray(cored), np.asarray(cores), changed


def _check(states, limits, windows, size_for_all, iterative=False):
    got = core_trajectory(np.asarray(states), limits, windows, size_for_all,
                          iterative)
    want = oracle_core(states, limits, windows, size_for_all, iterative)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    assert got[2] == want[2]


def test_window_one_is_identity():
    states = [1, 2, 2, 1, 3, 3, 3, 1]
    cored, cores, changed = core_trajectory(np.asarray(states), [8], {}, 1)
    np.testing.assert_array_equal(cored, states)
    assert changed == 0


def test_simple_window():
    states = [1, 1, 1, 2, 1, 1, 2, 2, 2, 1, 2, 2]
    _check(states, [12], {}, 2)


def test_flicker_removal():
    # single-frame excursions into state 2 are removed with window 3
    states = [1, 1, 1, 1, 2, 1, 1, 1, 2, 2, 2, 2]
    cored, cores, changed = core_trajectory(np.asarray(states), [12], {}, 3)
    np.testing.assert_array_equal(
        cored, [1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2])
    _check(states, [12], {}, 3)


def test_chunk_boundaries_respected():
    states = [1, 1, 1, 2, 2, 2, 2, 1, 1, 1]
    _check(states, [5, 10], {}, 3)
    _check(states, [3, 7, 10], {}, 2)


def test_per_state_windows():
    states = [1, 1, 1, 1, 3, 3, 4, 4, 4, 3, 3, 3, 1, 1]
    _check(states, [14], {3: 2, 4: 3}, 2)
    _check(states, [14], {3: 1, 4: 4}, 3)


def test_iterative_mode():
    states = [1, 1, 1, 1, 2, 2, 1, 2, 2, 2, 1, 1, 1, 1, 2, 2, 2, 2]
    _check(states, [18], {}, 4, iterative=True)
    _check(states, [9, 18], {1: 3, 2: 4}, 4, iterative=True)


def test_randomized_against_oracle():
    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(10, 60))
        states = rng.integers(1, 4, size=n).tolist()
        n_chunks = int(rng.integers(1, 3))
        cuts = sorted(rng.integers(1, n, size=n_chunks - 1).tolist()) + [n]
        cuts = sorted(set(cuts))
        windows = {1: int(rng.integers(1, 4)), 2: int(rng.integers(1, 4))}
        sfa = int(rng.integers(1, 4))
        it = bool(rng.integers(0, 2))
        _check(states, cuts, windows, sfa, iterative=it)


def test_wtd():
    wtd = compute_wtd([3, 1, 2, 3])
    # P(streak >= i): i=0..3 -> 1, 1, 0.75, 0.5
    assert wtd[0] == 1.0
    assert wtd[1] == 1.0
    assert wtd[2] == 0.75
    assert wtd[3] == 0.5
    assert compute_wtd([]) == {}


def test_native_pass_matches_numpy_fallback():
    """core_trajectory's native one-pass scan must be bit-identical to
    the vectorized numpy fallback (which the literal oracle above pins)
    across windows files, concat limits and both ramp modes."""
    from clustering_tpu.utils import textio_native
    if not textio_native.available():
        import pytest
        pytest.skip("native textio unavailable")
    rng = np.random.default_rng(23)
    for trial in range(60):
        n = int(rng.integers(1, 250))
        traj = rng.integers(0, 5, size=n).astype(np.int64)
        if rng.random() < 0.5:
            traj = np.repeat(traj, rng.integers(1, 6, size=n))[:n]
        n = len(traj)
        wmap = ({int(s): int(rng.integers(1, 8)) for s in range(5)
                 if rng.random() < 0.7} if rng.random() < 0.5 else {})
        sfa = int(rng.integers(1, 8))
        lims = sorted(rng.integers(1, n + 5, size=rng.integers(1, 4))
                      .tolist())
        if lims[-1] < n:
            lims.append(n)
        it = bool(rng.random() < 0.5)
        got = core_trajectory(traj, lims, wmap, sfa, it)
        orig = textio_native.coring_pass
        textio_native.coring_pass = lambda *a: None
        try:
            want = core_trajectory(traj, lims, wmap, sfa, it)
        finally:
            textio_native.coring_pass = orig
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
