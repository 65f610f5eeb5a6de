"""High-level Python API.

The reference tool is CLI-only; these functions expose the same pipeline to
library users as plain arrays, without touching the filesystem:

    import clustering_tpu as ct

    pops = ct.populations(coords, radius)            # neighbor counts
    fe = ct.free_energies(pops)                      # -ln(p / p_max)
    nn = ct.nearest_neighbors(coords, fe)            # joint NN / NN-hd
    clust = ct.screening_series(coords, fe, nn.nh_dist,
                                thresholds=[0.1, 0.2, ...])
    micro = ct.fill_landscape(clust[-1], nn, fe)     # seeded final states
    macro = ct.mpp_lump(micro, fe, lagtime=25)       # MPP macrostates
    cored = ct.core_trajectory(micro, windows=20)    # dynamical coring
    clean = ct.assign_noise(micro, clust[-1], cmin=0.1)

All functions accept numpy arrays and return numpy arrays; device placement,
kernel selection and mesh sharding are handled internally (see
clustering_tpu.ops / clustering_tpu.parallel).
"""

from collections import namedtuple

import numpy as np

from . import ops
from .models import coring as _coring
from .models import density as _density
from .models import mpp as _mpp
from .models import noise as _noise

Neighborhoods = namedtuple(
    "Neighborhoods", ["nh_idx", "nh_dist", "nhhd_idx", "nhhd_dist"])

MppResult = namedtuple(
    "MppResult", ["trajectories", "transitions", "qmin_values"])


def populations(coords, radius, mesh=None):
    """Per-frame neighbor counts inside the hypersphere ``radius``
    (self-inclusive). ``radius`` may be a scalar or a list; returns an
    array for a scalar, a dict radius -> array otherwise."""
    engine = ops.engine.DensityEngine(np.asarray(coords, np.float32),
                                      mesh=mesh)
    radii = np.atleast_1d(np.asarray(radius, dtype=float)).tolist()
    out = engine.populations(radii)
    if np.isscalar(radius) or np.asarray(radius).ndim == 0:
        return out[radii[0]]
    return out


def free_energies(pops):
    """fe_i = -ln(pop_i / max pop)."""
    return ops.free_energies(pops)


def nearest_neighbors(coords, free_energy, mesh=None) -> Neighborhoods:
    """Joint nearest-neighbor and nearest-higher-density-neighbor search."""
    engine = ops.engine.DensityEngine(np.asarray(coords, np.float32),
                                      mesh=mesh)
    nh_idx, nh_d, hd_idx, hd_d = engine.nearest_neighbors(
        np.asarray(free_energy, np.float32))
    return Neighborhoods(nh_idx, nh_d, hd_idx, hd_d)


def screening_series(coords, free_energy, nh_dist, thresholds, mesh=None,
                     hd_neighbors=None):
    """Density screening over a free-energy threshold series.

    Returns a list of state trajectories (one per threshold, ids 1..K per
    threshold, 0 above it), seeded incrementally like the reference's -T
    loop. Pass ``hd_neighbors=(nn.nhhd_idx, nn.nhhd_dist)`` to seed new
    frames with their nearest-higher-density edge (same results, fewer
    fixpoint merges)."""
    thresholds = [np.float32(t) for t in thresholds]
    sigma2 = ops.neighbors.compute_sigma2(nh_dist)
    max_dist2 = np.float32(4.0 * sigma2)
    series = ops.screening.ThresholdSeriesScreener(
        np.asarray(coords, np.float32), np.asarray(free_energy, np.float32),
        thresholds, mesh=mesh, hd_neighbors=hd_neighbors)
    # each step's host postlude overlaps the next threshold's device
    # sweeps (ThresholdSeriesScreener.step_submit)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [series.step_submit(k, max_dist2, pool)
                for k in range(len(thresholds))]
        return [f.result() for f in futs]


def fill_landscape(clustering, neighborhoods, free_energy):
    """Assign every unclustered frame to its nearest higher-density
    neighbor's state and rename states by decreasing population (the
    reference's seeded final density pass, ``density -i``)."""
    filled = _density.assign_low_density_frames(
        clustering, neighborhoods.nhhd_idx, free_energy)
    return _density.sorted_cluster_names(filled)


def mpp_lump(trajectory, free_energy, lagtime, qmin_values=None,
             concat_limits=None) -> MppResult:
    """Most-Probable-Path lumping over a Q_min series.

    Returns per-Q_min lumped trajectories plus the accumulated lumping
    transitions {from_state: (to_state, qmin)}."""
    traj = np.asarray(trajectory, dtype=np.int64)
    if qmin_values is None:
        qmin_values = np.round(np.arange(0.01, 1.0001, 0.01), 4)
    names = np.unique(traj).tolist()
    counts = _mpp.transition_counts(traj, concat_limits or [len(traj)],
                                    lagtime)
    tmat = _mpp.row_normalized(counts, names)
    trajectories = []
    transitions = {}
    current = traj
    for q in qmin_values:
        current, lumping, tmat = _mpp.fixed_metastability_clustering(
            current, tmat, float(q), np.asarray(free_energy, np.float32))
        trajectories.append(current)
        for frm, to in lumping.items():
            transitions[frm] = (to, float(q))
    return MppResult(trajectories, transitions, list(qmin_values))


def core_trajectory(trajectory, windows, concat_limits=None,
                    iterative=False):
    """Dynamical coring: a frame enters a new state's core only after
    ``windows`` consecutive frames of that state. ``windows`` is an int or
    a {state: window} dict. Returns (cored_trajectory, cores) where cores
    is -1 outside core regions."""
    traj = np.asarray(trajectory, dtype=np.int64)
    if isinstance(windows, dict):
        wmap, size_for_all = windows, 1
    else:
        wmap, size_for_all = {}, int(windows)
    cored, cores, _ = _coring.core_trajectory(
        traj, concat_limits or [len(traj)], wmap, size_for_all, iterative)
    return cored, cores


def assign_noise(trajectory, highest_clustering, cmin=0.1,
                 concat_limits=None):
    """Mark frames of clusters below the ``cmin`` population percentage as
    noise and dynamically reassign them to the previous core."""
    traj = np.asarray(trajectory, dtype=np.int64)
    marked, noise_state, _ = _noise.noise_assignment(
        traj, highest_clustering, 0.01 * float(cmin))
    out, cores, _ = _noise.reassign_noise(
        marked, noise_state, concat_limits or [len(traj)], traj)
    return out


def waiting_time_distribution(trajectory, state):
    """P(streak >= t) of consecutive-frame streaks of ``state``."""
    traj = np.asarray(trajectory, dtype=np.int64)
    if not len(traj):
        return _coring.compute_wtd([])
    change = np.flatnonzero(traj[1:] != traj[:-1]) + 1
    bounds = np.concatenate(([0], change, [len(traj)]))
    lengths = np.diff(bounds)
    streaks = lengths[traj[bounds[:-1]] == state]
    return _coring.compute_wtd(streaks)
