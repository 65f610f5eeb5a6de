"""Regenerate the golden regression fixtures in tests/golden/.

Run from the repo root:  python tests/make_golden.py

The fixtures freeze the full pipeline's data lines (and ``#@`` metadata) on
a small deterministic dataset so refactors that change numeric behavior are
caught. They are OUR outputs (regression goldens), not reference-binary
outputs -- semantic parity with the reference is covered by the oracle
tests.
"""

import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
GOLDEN = os.path.join(HERE, "golden")

FILES = [
    "pop", "fe", "nn",
    "clust.0.30", "clust.0.60", "clust.0.90", "clust.1.20",
    "network_links.dat", "network_nodes.dat", "network_leaves.dat",
    "network_end_node_traj.dat",
    "microstates",
    "mpp_traj_0.200.dat", "mpp_pop_0.200.dat", "mpp_traj_0.600.dat",
    "mpp_transitions.dat", "mpp_max_pop.dat", "mpp_max_qmin.dat",
    "cored", "cores.dat", "wtd_1",
    "denoised",
]


def generate(workdir):
    # fixtures are defined by the CPU/XLA backend for reproducibility
    # (matches the pytest environment; see tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, ROOT)
    from clustering_tpu import cli

    rng = np.random.default_rng(20260816)
    a = rng.normal((0.0, 0.0), 0.12, size=(160, 2))
    b = rng.normal((1.2, 0.1), 0.15, size=(120, 2))
    c = rng.normal((-0.3, 1.5), 0.10, size=(70, 2))
    coords = np.concatenate([a, b, c]).astype(np.float32)
    coords = coords[rng.permutation(len(coords))]
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        np.savetxt("coords.dat", coords, fmt="%.6f")
        for argv in [
            ["density", "-f", "coords.dat", "-r", "0.2", "-p", "pop",
             "-d", "fe", "-b", "nn", "-o", "clust",
             "-T", "0.3", "0.3", "1.2"],
            ["network", "-p", "1", "-b", "clust", "-o", "network",
             "--min", "0.3", "--step", "0.3"],
            ["density", "-f", "coords.dat", "-D", "fe", "-B", "nn",
             "-i", "clust.1.20", "-o", "microstates"],
            ["mpp", "-s", "microstates", "-D", "fe", "-l", "2",
             "--qmin-from", "0.2", "--qmin-to", "0.6",
             "--qmin-step", "0.4"],
            ["coring", "-s", "microstates", "-w", "2", "-o", "cored",
             "-d", "wtd", "--cores", "cores.dat"],
            ["noise", "-s", "microstates", "-o", "denoised",
             "-b", "clust", "-c", "10"],
        ]:
            assert cli.main(argv) == 0, argv
    finally:
        os.chdir(cwd)


def strip_volatile(path):
    """Data lines + #@ metadata; drop free-text header comments."""
    out = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("#@") or not line.startswith("#"):
                out.append(line)
    return "".join(out)


def main():
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        generate(tmp)
        if os.path.isdir(GOLDEN):
            shutil.rmtree(GOLDEN)
        os.makedirs(GOLDEN)
        for name in FILES:
            src = os.path.join(tmp, name)
            with open(os.path.join(GOLDEN, name), "w") as fh:
                fh.write(strip_volatile(src))
    print(f"wrote {len(FILES)} fixtures to {GOLDEN}")


if __name__ == "__main__":
    main()
