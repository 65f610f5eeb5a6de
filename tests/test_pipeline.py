"""End-to-end pipeline test: density -> network -> mpp -> coring -> noise
-> stats/filter through the CLI, mirroring the reference tool's documented
workflow on a small synthetic free-energy landscape."""

import os

import numpy as np
import pytest

from clustering_tpu import cli


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(1234)
    a = rng.normal((0.0, 0.0), 0.12, size=(150, 2))
    b = rng.normal((1.2, 0.1), 0.15, size=(120, 2))
    c = rng.normal((-0.3, 1.5), 0.10, size=(60, 2))
    coords = np.concatenate([a, b, c]).astype(np.float32)
    # time-correlated ordering so MPP/coring see realistic dynamics
    order = rng.permutation(len(coords))
    coords = coords[order]
    np.savetxt("coords.dat", coords, fmt="%.6f")
    return tmp_path


def run(args):
    assert cli.main(args) == 0


def test_full_pipeline(workdir):
    # density with fixed radius, multi-threshold screening
    run(["density", "-f", "coords.dat", "-r", "0.2",
         "-p", "pop", "-d", "fe", "-b", "nn",
         "-o", "clust", "-T", "0.2", "0.2", "2.0", "-v"])
    assert os.path.exists("pop")
    assert os.path.exists("fe")
    assert os.path.exists("nn")
    clust_files = sorted(f for f in os.listdir(".")
                         if f.startswith("clust."))
    assert "clust.0.20" in clust_files
    assert len(clust_files) >= 5

    fe = np.loadtxt("fe")
    pops = np.loadtxt("pop")
    assert len(fe) == len(pops) == 330
    assert (pops >= 1).all()
    assert fe.min() == 0.0

    # re-use artifacts: -D/-B restart produces identical clustering
    run(["density", "-f", "coords.dat", "-D", "fe", "-B", "nn",
         "-o", "clust2", "-T", "0.2", "0.2", "2.0"])
    for f in clust_files:
        a = np.loadtxt(f)
        b = np.loadtxt("clust2" + f[5:])
        np.testing.assert_array_equal(a, b)

    # network from the screening series
    run(["network", "-p", "1", "-b", "clust", "-o", "network",
         "--min", "0.2", "--step", "0.2"])
    assert os.path.exists("network_links.dat")
    assert os.path.exists("network_nodes.dat")
    assert os.path.exists("network_leaves.dat")
    assert os.path.exists("network_end_node_traj.dat")
    assert os.path.exists("remapped_clust.0.20")

    # seeded final density pass to fill the FEL
    # (reference workflow: -i initial states)
    hi = clust_files[-1]
    run(["density", "-f", "coords.dat", "-D", "fe", "-B", "nn",
         "-i", hi, "-o", "microstates"])
    micro = np.loadtxt("microstates", dtype=int)
    assert micro.shape == (330,)
    assert (micro > 0).all()
    # names sorted by decreasing population
    vals, counts = np.unique(micro, return_counts=True)
    assert set(vals) == set(range(1, len(vals) + 1))
    by_name = dict(zip(vals, counts))
    pops_in_name_order = [by_name[v] for v in sorted(vals)]
    assert pops_in_name_order == sorted(pops_in_name_order, reverse=True)

    # mpp on the microstates
    run(["mpp", "-s", "microstates", "-D", "fe", "-l", "2",
         "--qmin-from", "0.1", "--qmin-to", "0.9", "--qmin-step", "0.4"])
    assert os.path.exists("mpp_traj_0.100.dat")
    assert os.path.exists("mpp_pop_0.100.dat")
    assert os.path.exists("mpp_transitions.dat")
    assert os.path.exists("mpp_max_pop.dat")
    assert os.path.exists("mpp_max_qmin.dat")

    # coring
    run(["coring", "-s", "microstates", "-w", "2", "-o", "cored",
         "-d", "wtd", "--cores", "cores.dat"])
    cored = np.loadtxt("cored", dtype=int)
    assert cored.shape == (330,)
    assert os.path.exists("cores.dat")

    # noise
    run(["noise", "-s", "microstates", "-o", "denoised", "-b", "clust",
         "-c", "20"])
    denoised = np.loadtxt("denoised", dtype=int)
    assert denoised.shape == (330,)

    # stats (prints table)
    run(["stats", "-s", "microstates"])

    # filter
    run(["filter", "-s", "microstates", "-c", "coords.dat",
         "-o", "filtered"])
    first = np.loadtxt("filtered.state1.dat")
    assert first.shape[1] == 2
    assert len(first) == by_name[1]


def test_multi_radius_mode(workdir):
    run(["density", "-f", "coords.dat", "-R", "0.1", "0.3",
         "-p", "pop", "-d", "fe"])
    assert os.path.exists("pop_0.100000")
    assert os.path.exists("pop_0.300000")
    assert os.path.exists("fe_0.100000")
    assert os.path.exists("fe_0.300000")
    p1 = np.loadtxt("pop_0.100000")
    p3 = np.loadtxt("pop_0.300000")
    assert (p3 >= p1).all()


def test_lumping_radius_default(workdir):
    # without -r the lumping radius is derived from NN statistics
    run(["density", "-f", "coords.dat", "-p", "pop", "-d", "fe"])
    text = open("pop").read()
    assert "#@   lumping_radius" in text
    assert "#@   clustering_radius" in text


def test_filter_xtc(workdir):
    from clustering_tpu.utils import xtc
    rng = np.random.default_rng(3)
    states = rng.integers(1, 4, size=30)
    np.savetxt("states.dat", states, fmt="%d")
    w = xtc.XtcWriter("traj.xtc")
    base = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
    for f in range(30):
        w.write_frame(base + 0.01 * f, step=f, time=0.1 * f)
    w.close()
    run(["filter", "-s", "states.dat", "-c", "traj.xtc", "-o", "sel",
         "-S", "2"])
    r = xtc.XtcReader("sel.state2.xtc")
    count = 0
    while r.read_frame() is not None:
        count += 1
    r.close()
    assert count == int((states == 2).sum())


def test_network_html(workdir):
    run(["density", "-f", "coords.dat", "-r", "0.2", "-d", "fe",
         "-o", "clust", "-T", "0.2", "0.2", "1.0"])
    run(["network", "-p", "1", "-b", "clust", "-o", "net",
         "--min", "0.2", "--step", "0.2", "--network-html"])
    html = open("net_visualization.html").read()
    # fully self-contained page: no external scripts, valid node/edge data
    assert "<script src" not in html
    import json
    import re
    nodes = json.loads(
        "[" + re.search(r"var NODES = \[(.*?)\];", html, re.S).group(1)
        + "]")
    edges = json.loads(
        "[" + re.search(r"var EDGES = \[(.*?)\];", html, re.S).group(1)
        + "]")
    assert nodes and all({"id", "x", "y", "pop", "fe"} <= set(n)
                         for n in nodes)
    ids = {n["id"] for n in nodes}
    assert edges and all(e["s"] in ids and e["t"] in ids for e in edges)


def test_density_default_screening_params(workdir):
    # -T -1 means FROM=0.1 STEP=0.1 TO=max(FE)
    run(["density", "-f", "coords.dat", "-r", "0.25", "-d", "fe",
         "-o", "cl", "-T", "-1"])
    files = sorted(f for f in os.listdir(".") if f.startswith("cl.0."))
    assert "cl.0.10" in files
    assert "cl.0.20" in files


def test_density_screening_usage_errors(workdir, capsys):
    # reference usage errors (density_clustering.cpp:789-800): more than
    # three -T parameters, and FROM/STEP with >2 decimal digits
    with pytest.raises(SystemExit):
        cli.main(["density", "-f", "coords.dat", "-r", "0.25", "-d", "fe",
                  "-o", "cl", "-T", "0.1", "0.1", "1.0", "2.0"])
    assert "at most three" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli.main(["density", "-f", "coords.dat", "-r", "0.25", "-d", "fe",
                  "-o", "cl", "-T", "0.125", "0.1", "1.0"])
    assert "two digits" in capsys.readouterr().err


def test_coring_windows_file(workdir):
    states = np.array([1] * 10 + [2] * 10 + [1, 2] * 5)
    np.savetxt("states.dat", states, fmt="%d")
    with open("win.dat", "w") as fh:
        fh.write("# comment line\n* 2\n1 3\n")
    run(["coring", "-s", "states.dat", "-w", "win.dat", "-o", "cored"])
    cored = np.loadtxt("cored", dtype=int)
    assert len(cored) == 30
    text = open("cored").read()
    assert "1 state-specific coring windows were read" in text


def test_mpp_tprob_input(workdir):
    states = np.array(([1] * 6 + [2] * 6) * 10)
    np.savetxt("states.dat", states, fmt="%d")
    np.savetxt("fe.dat", np.linspace(0, 1, len(states)))
    with open("tprob.dat", "w") as fh:
        fh.write("1 1 0.9\n1 2 0.1\n2 1 0.2\n2 2 0.8\n")
    run(["mpp", "-s", "states.dat", "-D", "fe.dat", "-l", "1",
         "--tprob", "tprob.dat", "--qmin-from", "0.5", "--qmin-to", "0.5",
         "--qmin-step", "0.1", "-o", "m"])
    assert os.path.exists("m_traj_0.500.dat")


def test_stats_with_concat(workdir, capsys):
    states = np.array([1, 1, 2, 2, 1, 1, 2, 2])
    np.savetxt("states.dat", states, fmt="%d")
    run(["stats", "-s", "states.dat", "--concat-nframes", "4"])
    out = capsys.readouterr().out
    assert "state stats" in out
    assert "total number of microstates" in out


def test_density_check_mode(workdir):
    run(["density", "-f", "coords.dat", "-r", "0.2", "-p", "pop",
         "-d", "fe", "-b", "nn", "--check", "-v"])
    assert os.path.exists("pop")


def test_density_npy_artifacts(workdir):
    run(["density", "-f", "coords.dat", "-r", "0.2",
         "-p", "pop.npy", "-d", "fe.npy", "-b", "nn"])
    run(["density", "-f", "coords.dat", "-D", "fe.npy", "-B", "nn",
         "-o", "cl", "-T", "0.3", "0.3", "0.9"])
    assert os.path.exists("cl.0.30")


def test_filter_nrandom(workdir):
    states = np.array([1] * 40 + [2] * 10)
    np.savetxt("states.dat", states, fmt="%d")
    np.savetxt("c2.dat", np.arange(100).reshape(50, 2), fmt="%.1f")
    run(["filter", "-s", "states.dat", "-c", "c2.dat", "-o", "r",
         "--nRandom", "5"])
    s1 = np.loadtxt("r.state1.dat")
    s2 = np.loadtxt("r.state2.dat")
    assert len(s1) == 5
    assert len(s2) == 5
    # frames come from the right state, in index order
    assert set(map(tuple, s1)) <= set(
        map(tuple, np.arange(80).reshape(40, 2)))
