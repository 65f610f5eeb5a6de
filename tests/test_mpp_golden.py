"""TRUE golden parity for MPP against the reference's own compiled mpp.cpp
(minimal program_options/uBLAS stubs, tests/refstub/)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from clustering_tpu.models import mpp

REF_SRC = "/root/reference/src"
STUB = os.path.join(os.path.dirname(__file__), "refstub")
ORACLE_SRC = os.path.join(os.path.dirname(__file__), "mpp_oracle.cpp")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    cxx = shutil.which("g++")
    if cxx is None or not os.path.isdir(REF_SRC):
        pytest.skip("reference sources or g++ unavailable")
    exe = tmp_path_factory.mktemp("oracle") / "mpp_oracle"
    subprocess.run(
        [cxx, "-O2", "-std=c++11", "-I", STUB, "-I", REF_SRC, ORACLE_SRC,
         os.path.join(REF_SRC, "mpp.cpp"),
         os.path.join(REF_SRC, "tools.cpp"),
         os.path.join(REF_SRC, "logger.cpp"),
         "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


def _markov_traj(n, seed):
    """Metastable microstate trajectory over ~12 states in 3 basins."""
    rng = np.random.default_rng(seed)
    basins = [list(range(1, 5)), list(range(5, 9)), list(range(9, 13))]
    traj = []
    b = 0
    state = basins[b][0]
    for _ in range(n):
        r = rng.random()
        if r < 0.02:
            b = rng.integers(0, 3)
            state = basins[b][rng.integers(0, 4)]
        elif r < 0.45:
            state = basins[b][rng.integers(0, 4)]
        traj.append(state)
    return np.asarray(traj)


@pytest.mark.parametrize("seed,lag,qmins", [
    (1, 1, [0.2, 0.5, 0.8]),
    (2, 3, [0.3, 0.6]),
    (3, 2, [0.1, 0.4, 0.7, 0.95]),
    (4, 5, [0.05, 0.35, 0.65, 0.9]),
    (5, 7, [0.25, 0.5, 0.75, 0.99]),
    (6, 1, [0.01, 0.2, 0.45, 0.6, 0.85]),
])
def test_mpp_matches_reference(oracle, tmp_path, seed, lag, qmins):
    traj = _markov_traj(3000, seed)
    rng = np.random.default_rng(seed + 100)
    fe = rng.permutation(len(traj)).astype(np.float32) / len(traj) * 4.0
    tpath = tmp_path / f"traj{seed}.dat"
    fpath = tmp_path / f"fe{seed}.dat"
    np.savetxt(tpath, traj, fmt="%d")
    np.savetxt(fpath, fe, fmt="%.9g")
    fe = np.loadtxt(fpath, dtype=np.float32)
    out = subprocess.run(
        [oracle, str(tpath), str(fpath), str(lag)] + [str(q) for q in qmins],
        check=True, capture_output=True, text=True).stdout
    blocks = []
    ref_transitions = {}
    mode = None
    for line in out.splitlines():
        if line.startswith("# q "):
            blocks.append([])
            mode = "traj"
        elif line.startswith("# transitions"):
            mode = "trans"
        elif mode == "traj":
            blocks[-1].append(int(line))
        else:
            a, b, q = line.split()
            ref_transitions[int(a)] = (int(b), float(np.float32(float(q))))

    names = sorted(set(traj.tolist()))
    counts = mpp.transition_counts(traj, [len(traj)], lag)
    tmat = mpp.row_normalized(counts, names)
    current = traj
    transitions = {}
    for q, ref_block in zip(qmins, blocks):
        current, lumping, tmat = mpp.fixed_metastability_clustering(
            current, tmat, float(np.float32(q)), fe)
        np.testing.assert_array_equal(current, np.asarray(ref_block))
        for frm, to in lumping.items():
            transitions[frm] = (to, float(np.float32(q)))
    assert transitions == ref_transitions
