"""Full-mode golden parity: run the reference's OWN Coring/Noise/
NetworkBuilder/Filter(stats) entry points (compiled from /root/reference
with the functional stubs in tests/refstub/) on the same inputs as our CLI
and diff the outputs."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from clustering_tpu import cli

REF_SRC = "/root/reference/src"
STUB = os.path.join(os.path.dirname(__file__), "refstub")
ORACLE_SRC = os.path.join(os.path.dirname(__file__), "modes_oracle.cpp")
XDR = os.path.join(REF_SRC, "coords_file", "xdrfile")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    cxx = shutil.which("g++")
    cc = shutil.which("gcc") or cxx
    if cxx is None or not os.path.isdir(REF_SRC):
        pytest.skip("reference sources or g++ unavailable")
    d = tmp_path_factory.mktemp("oracle")
    objs = []
    for c in ("xdrfile.c", "xdrfile_xtc.c"):
        obj = d / (c + ".o")
        subprocess.run([cc, "-O2", "-c", os.path.join(XDR, c), "-I", XDR,
                        "-o", str(obj)], check=True, capture_output=True)
        objs.append(str(obj))
    exe = d / "modes_oracle"
    subprocess.run(
        [cxx, "-O2", "-std=c++17", "-fopenmp", "-I", STUB, "-I", REF_SRC,
         ORACLE_SRC,
         os.path.join(REF_SRC, "coring.cpp"),
         os.path.join(REF_SRC, "noise.cpp"),
         os.path.join(REF_SRC, "network_builder.cpp"),
         os.path.join(REF_SRC, "state_filter.cpp"),
         os.path.join(REF_SRC, "coords_file", "coords_file.cpp"),
         os.path.join(REF_SRC, "tools.cpp"),
         os.path.join(REF_SRC, "logger.cpp"), *objs,
         "-o", str(exe)],
        check=True, capture_output=True)
    return str(exe)


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    """Shared inputs: a screening series + microstates from our density."""
    d = tmp_path_factory.mktemp("inputs")
    rng = np.random.default_rng(2024)
    a = rng.normal((0.0, 0.0), 0.12, size=(180, 2))
    b = rng.normal((1.3, 0.2), 0.16, size=(140, 2))
    c = rng.normal((-0.4, 1.4), 0.1, size=(60, 2))
    coords = np.concatenate([a, b, c]).astype(np.float32)
    coords = coords[rng.permutation(len(coords))]
    cwd = os.getcwd()
    os.chdir(d)
    try:
        np.savetxt("coords.dat", coords, fmt="%.6f")
        assert cli.main(["density", "-f", "coords.dat", "-r", "0.2",
                         "-d", "fe", "-b", "nn", "-o", "clust",
                         "-T", "0.4", "0.4", "2.0"]) == 0
        assert cli.main(["density", "-f", "coords.dat", "-D", "fe",
                         "-B", "nn", "-i", "clust.2.00",
                         "-o", "microstates"]) == 0
    finally:
        os.chdir(cwd)
    return str(d)


def _datalines(path):
    """Data lines + #@ metadata (free-text headers differ by design)."""
    out = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("#@") or not line.startswith("#"):
                out.append(line.rstrip("\n"))
    return out


def _stage(inputs, dst):
    for f in os.listdir(inputs):
        shutil.copy(os.path.join(inputs, f), dst)


def test_coring_matches_reference_main(oracle, inputs, tmp_path):
    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    ours.mkdir(), ref.mkdir()
    _stage(inputs, ours), _stage(inputs, ref)
    cwd = os.getcwd()
    os.chdir(ours)
    try:
        assert cli.main(["coring", "-s", "microstates", "-w", "3",
                         "-o", "cored", "-d", "wtd",
                         "--cores", "cores.dat"]) == 0
    finally:
        os.chdir(cwd)
    subprocess.run([oracle, "coring", "microstates", "3", "cored", "wtd",
                    "cores.dat", "0"], cwd=ref, check=True,
                   capture_output=True)
    states = np.loadtxt(os.path.join(inputs, "microstates"), dtype=int)
    for name in ["cored", "cores.dat"] + \
            [f"wtd_{s}" for s in sorted(set(states.tolist()))]:
        assert _datalines(ours / name) == _datalines(ref / name), name


def test_coring_iterative_matches_reference_main(oracle, inputs, tmp_path):
    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    ours.mkdir(), ref.mkdir()
    _stage(inputs, ours), _stage(inputs, ref)
    cwd = os.getcwd()
    os.chdir(ours)
    try:
        assert cli.main(["coring", "-s", "microstates", "-w", "4",
                         "-o", "cored", "--iterative"]) == 0
    finally:
        os.chdir(cwd)
    subprocess.run([oracle, "coring", "microstates", "4", "cored", "wtd",
                    "cores.dat", "1"], cwd=ref, check=True,
                   capture_output=True)
    assert _datalines(ours / "cored") == _datalines(ref / "cored")


def test_noise_matches_reference_main(oracle, inputs, tmp_path):
    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    ours.mkdir(), ref.mkdir()
    _stage(inputs, ours), _stage(inputs, ref)
    cwd = os.getcwd()
    os.chdir(ours)
    try:
        assert cli.main(["noise", "-s", "microstates", "-o", "denoised",
                         "-b", "clust", "-c", "8",
                         "--cores", "ncores.dat"]) == 0
    finally:
        os.chdir(cwd)
    subprocess.run([oracle, "noise", "microstates", "denoised", "clust",
                    "8", "ncores.dat"], cwd=ref, check=True,
                   capture_output=True)
    assert _datalines(ours / "denoised") == _datalines(ref / "denoised")
    assert _datalines(ours / "ncores.dat") == _datalines(ref / "ncores.dat")


def test_network_matches_reference_main(oracle, inputs, tmp_path):
    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    ours.mkdir(), ref.mkdir()
    _stage(inputs, ours), _stage(inputs, ref)
    cwd = os.getcwd()
    os.chdir(ours)
    try:
        assert cli.main(["network", "-p", "2", "-b", "clust", "-o", "net",
                         "--min", "0.4", "--step", "0.4"]) == 0
    finally:
        os.chdir(cwd)
    subprocess.run([oracle, "network", "2", "clust", "net", "0.4", "0",
                    "0.4"], cwd=ref, check=True, capture_output=True)
    for name in ("net_links.dat", "net_nodes.dat", "net_leaves.dat",
                 "net_end_node_traj.dat", "remapped_clust.0.40",
                 "remapped_clust.0.80"):
        assert _datalines(ours / name) == _datalines(ref / name), name


def test_stats_matches_reference_main(oracle, inputs, tmp_path, capsys):
    cwd = os.getcwd()
    os.chdir(inputs)
    try:
        assert cli.main(["stats", "-s", "microstates"]) == 0
    finally:
        os.chdir(cwd)
    ours = capsys.readouterr().out
    ref = subprocess.run([oracle, "stats", "microstates"], cwd=inputs,
                         check=True, capture_output=True,
                         text=True).stdout
    ours_tbl = ours[ours.index("~~~ state stats"):]
    ref_tbl = ref[ref.index("~~~ state stats"):]
    assert ours_tbl.strip() == ref_tbl.strip()


def test_filter_matches_reference_main(oracle, inputs, tmp_path):
    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    ours.mkdir(), ref.mkdir()
    _stage(inputs, ours), _stage(inputs, ref)
    cwd = os.getcwd()
    os.chdir(ours)
    try:
        assert cli.main(["filter", "-s", "microstates", "-c", "coords.dat",
                         "-o", "sel", "-S", "1", "2",
                         "--every-nth", "2"]) == 0
    finally:
        os.chdir(cwd)
    subprocess.run([oracle, "filter", "microstates", "coords.dat", "sel",
                    "2", "1", "2"], cwd=ref, check=True,
                   capture_output=True)
    for name in ("sel.state1.dat", "sel.state2.dat"):
        a = open(ours / name).read()
        b = open(ref / name).read()
        assert a == b, name


def test_filter_xtc_matches_reference_main(oracle, inputs, tmp_path):
    """Round-trips our xtc writer through the reference's xdrfile-based
    filter and vice versa: output .xtc files must be byte-identical."""
    from clustering_tpu.utils import xtc
    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    ours.mkdir(), ref.mkdir()
    _stage(inputs, ours), _stage(inputs, ref)
    coords = np.loadtxt(os.path.join(inputs, "coords.dat"),
                        dtype=np.float32)
    for d in (ours, ref):
        w = xtc.XtcWriter(str(d / "traj.xtc"))
        for i, row in enumerate(coords):
            # 3 atoms per frame from the 2-D point (padded)
            frame = np.zeros((3, 3), dtype=np.float32)
            frame[0, :2] = row
            frame[1, :2] = row * 0.5
            frame[2, :2] = row + 1.0
            w.write_frame(frame, step=i, time=0.1 * i)
        w.close()
    cwd = os.getcwd()
    os.chdir(ours)
    try:
        assert cli.main(["filter", "-s", "microstates", "-c", "traj.xtc",
                         "-o", "sel", "-S", "1"]) == 0
    finally:
        os.chdir(cwd)
    subprocess.run([oracle, "filter", "microstates", "traj.xtc", "sel",
                    "1", "1"], cwd=ref, check=True, capture_output=True)
    a = (ours / "sel.state1.xtc").read_bytes()
    b = (ref / "sel.state1.xtc").read_bytes()
    assert a == b
