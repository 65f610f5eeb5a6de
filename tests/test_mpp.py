import numpy as np

from clustering_tpu.models import mpp


def oracle_transition_counts(traj, limits, lag):
    """Literal transcription of reference mpp.cpp:78-111."""
    counts = {}
    limits = list(limits)
    li = 0
    for i in range(len(traj) - lag):
        frm, to = traj[i], traj[i + lag]
        if li < len(limits):
            if i + lag < limits[li]:
                row = counts.setdefault(frm, {})
                row[to] = row.get(to, 0) + 1
            elif i + 1 == limits[li]:
                li += 1
        else:
            row = counts.setdefault(frm, {})
            row[to] = row.get(to, 0) + 1
    return counts


def test_transition_counts_single_chunk():
    traj = [1, 1, 2, 2, 1, 2]
    got = mpp.transition_counts(traj, [6], 1)
    want = oracle_transition_counts(traj, [6], 1)
    assert {i: {j: int(c) for j, c in r.items()} for i, r in got.items()} \
        == want


def test_transition_counts_respects_limits():
    rng = np.random.default_rng(3)
    traj = rng.integers(1, 4, size=50).tolist()
    for limits in ([50], [20, 50], [10, 30, 50], [25]):
        for lag in (1, 2, 5):
            got = mpp.transition_counts(traj, limits, lag)
            want = oracle_transition_counts(traj, limits, lag)
            got_int = {i: {j: int(c) for j, c in r.items()}
                       for i, r in got.items()}
            assert got_int == want, (limits, lag)


def test_row_normalized():
    counts = {1: {1: 3.0, 2: 1.0}, 2: {1: 2.0, 2: 2.0}}
    t = mpp.row_normalized(counts, [1, 2])
    assert abs(t[1][1] - 0.75) < 1e-7
    assert abs(t[1][2] - 0.25) < 1e-7
    assert abs(t[2][1] - 0.5) < 1e-7


def test_future_state_stays_when_stable():
    t = {1: {1: 0.9, 2: 0.1}, 2: {2: 0.8, 1: 0.2}}
    fut = mpp.single_step_future_state(t, [1, 2], 0.5, {1: 0.0, 2: 1.0})
    assert fut == {1: 1, 2: 2}


def test_future_state_moves_when_unstable():
    t = {1: {1: 0.3, 2: 0.7}, 2: {2: 0.9, 1: 0.1}}
    fut = mpp.single_step_future_state(t, [1, 2], 0.5, {1: 0.0, 2: 1.0})
    assert fut == {1: 2, 2: 2}


def test_most_probable_path_cycles():
    fut = {1: 2, 2: 3, 3: 2}
    paths = mpp.most_probable_path(fut, [1, 2, 3])
    assert paths[1] == [1, 2, 3]
    assert paths[2] == [2, 3]


def test_lumped_trajectory():
    traj = [1, 2, 3, 2, 1]
    out = mpp.lumped_trajectory(traj, {1: 1, 2: 1, 3: 3})
    np.testing.assert_array_equal(out, [1, 1, 3, 1, 1])


def _two_state_markov(n=4000, seed=0):
    """Microstates 1,2 metastable pair; 3 a separate metastable state."""
    rng = np.random.default_rng(seed)
    traj = []
    state = 1
    for _ in range(n):
        r = rng.random()
        if state == 1:
            state = 2 if r < 0.3 else 1
        elif state == 2:
            state = 1 if r < 0.4 else (3 if r < 0.42 else 2)
        else:
            state = 2 if r < 0.02 else 3
        traj.append(state)
    return np.asarray(traj)


def test_fixed_metastability_lumps_fast_exchanging_pair():
    traj = _two_state_markov()
    names = sorted(set(traj.tolist()))
    counts = mpp.transition_counts(traj, [len(traj)], 1)
    t = mpp.row_normalized(counts, names)
    fe = np.asarray([0.0, 0.1, 0.5, 0.3], dtype=np.float32)[
        np.minimum(traj, 3)]
    # fe indexed per frame; states 1/2 exchange fast -> lumped at high qmin
    out, lumping, t2 = mpp.fixed_metastability_clustering(traj, t, 0.8, fe)
    final_states = set(out.tolist())
    assert len(final_states) == 2
    assert 3 in final_states
    # states 1 and 2 were merged into one of them
    assert lumping, "expected at least one lump"


def test_weighted_transition_counts_intended_semantics():
    """The fixed (intended) per-chunk sqrt-weighted counts: two chunks with
    different sampling weight."""
    # chunk 1: 1->1 x3, 1->2 x1 ; chunk 2: 1->2 x1
    traj = [1, 1, 1, 1, 2, 1, 2]
    limits = [5, 7]
    w = mpp.weighted_transition_counts(traj, limits, 1)
    # chunk1 row1 counts {1:3, 2:1}, weight sqrt(4)=2
    # chunk2 row1 counts {2:1}, weight sqrt(1)=1
    # weighted row1 = (2*{3,1} + 1*{0,1}) / (2+1) = {2.0, 1.0}
    assert abs(w[1][1] - 2.0) < 1e-6
    assert abs(w[1][2] - 1.0) < 1e-6
    # state 2 only ever appears as the last frame of a chunk: no row
    assert 2 not in w


def test_weighted_counts_reduce_to_plain_for_single_chunk():
    rng = np.random.default_rng(4)
    traj = rng.integers(1, 4, size=40).tolist()
    plain = mpp.transition_counts(traj, [40], 2)
    weighted = mpp.weighted_transition_counts(traj, [40], 2)
    for i, row in plain.items():
        for j, c in row.items():
            assert abs(weighted[i][j] - c) < 1e-6
