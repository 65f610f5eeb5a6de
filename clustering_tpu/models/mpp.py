"""Most-Probable-Path (MPP) dynamic lumping of microstates.

Mirrors ``Clustering::MPP`` (reference: src/mpp.cpp): builds a row-normalized
transition matrix at fixed lag time, then for a series of metastability
thresholds Q_min iteratively lumps each microstate along its most probable
path into the path's free-energy sink until self-consistency.

Matrices are kept as sparse dict-of-rows keyed by state id (the reference
uses boost::uBLAS mapped_matrix<float>, mpp.hpp:59). Initial transition
probabilities are computed with fp32 divisions to match the reference
bitwise; re-lumped matrices accumulate in double (the reference accumulates
in fp32 -- values may differ at ~1e-7, documented deviation).

Reference quirks reproduced on purpose (see SURVEY.md "hard parts" #7):
  * ``path_sinks`` collects equal-minimum sink candidates by comparing the
    *per-frame* free energy indexed by state id (reference bug,
    mpp.cpp:373-384); we reproduce it verbatim for parity.
Reference quirks fixed on purpose:
  * the reference tests ``args.count("concat_limits")`` (typo, mpp.cpp:526),
    so ``--concat-limits`` silently degraded to a single continuous
    trajectory; here the flag works and selects the *intended* per-chunk
    sqrt-weighted transition counts (with the chunk-slicing fixed,
    cf. mpp.cpp:113-157).
"""

import sys

import numpy as np

from ..utils import io
from ..utils.logger import logger

MAX_ITER = 100


# ---------------------------------------------------------------------------
# transition matrices (sparse dict-of-rows: {i: {j: p}})
# ---------------------------------------------------------------------------

def transition_counts(trajectory, concat_limits, n_lag_steps):
    """Pair counts (i -> j) at the given lag, not crossing chunk limits.

    Reference: mpp.cpp:78-111 (including the quirk that frames beyond the
    last limit form an implicit extra chunk).
    """
    if n_lag_steps == 0:
        print("error: lagtime of 0 does not make any sense for MPP"
              " clustering", file=sys.stderr)
        sys.exit(1)
    traj = np.asarray(trajectory, dtype=np.int64)
    n = len(traj)
    limits = [min(int(x), n) for x in (concat_limits or [n])]
    if limits and limits[-1] < n:
        limits.append(n)
    counts = {}
    lo = 0
    for hi in limits:
        if hi - lo > n_lag_steps:
            src = traj[lo:hi - n_lag_steps]
            dst = traj[lo + n_lag_steps:hi]
            pairs, pair_counts = np.unique(
                np.stack([src, dst], axis=1), axis=0, return_counts=True)
            for (i, j), c in zip(pairs.tolist(), pair_counts.tolist()):
                row = counts.setdefault(i, {})
                row[j] = row.get(j, 0.0) + float(c)
        lo = hi
    return counts


def weighted_transition_counts(trajectory, concat_limits, n_lag_steps):
    """Per-chunk counts combined with sqrt(row-count) weights
    (intended semantics of reference mpp.cpp:113-157)."""
    traj = np.asarray(trajectory, dtype=np.int64)
    n = len(traj)
    weighted = {}
    acc_weights = {}
    lo = 0
    for hi in [min(int(x), n) for x in concat_limits]:
        chunk_counts = transition_counts(traj[lo:hi], [], n_lag_steps)
        for i, row in chunk_counts.items():
            w = float(np.sqrt(np.float32(sum(row.values()))))
            acc_weights[i] = acc_weights.get(i, 0.0) + w
            wrow = weighted.setdefault(i, {})
            for j, c in row.items():
                wrow[j] = wrow.get(j, 0.0) + w * c
        lo = hi
    for i, row in weighted.items():
        for j in row:
            row[j] /= acc_weights[i]
    return weighted


def row_normalized(counts, cluster_names):
    """Row-normalize counts into transition probabilities with fp32
    divisions (reference: mpp.cpp:159-179)."""
    tmat = {}
    for i in cluster_names:
        row = counts.get(i, {})
        row_sum = np.float32(0.0)
        for j in sorted(row):
            row_sum = np.float32(row_sum + np.float32(row[j]))
        if row_sum > 0:
            tmat[i] = {j: float(np.float32(np.float32(c) / row_sum))
                       for j, c in row.items() if c != 0}
    return tmat


def read_transition_probabilities(path):
    """3-column 'from to prob' file (reference: mpp.cpp:38-76)."""
    tmat = {}
    data = np.loadtxt(path, ndmin=2, comments="#")
    for i, j, p in data:
        tmat.setdefault(int(i), {})[int(j)] = float(p)
    return tmat


def _t(tmat, i, j):
    return tmat.get(i, {}).get(j, 0.0)


# ---------------------------------------------------------------------------
# MPP iteration pieces
# ---------------------------------------------------------------------------

def microstate_min_free_energy(trajectory, free_energy):
    """state -> min frame free energy (reference: mpp.cpp:320-335)."""
    traj = np.asarray(trajectory, dtype=np.int64)
    fe = np.asarray(free_energy, dtype=np.float32)
    m = min(len(traj), len(fe))
    out = {}
    order = np.argsort(traj[:m], kind="stable")
    vals, starts = np.unique(traj[:m][order], return_index=True)
    mins = np.minimum.reduceat(fe[:m][order], starts)
    return {int(v): float(mn) for v, mn in zip(vals, mins)}


def single_step_future_state(tmat, cluster_names, q_min, min_free_energy):
    """Immediate-future state per microstate (reference: mpp.cpp:234-286)."""
    future = {}
    name_set = set(cluster_names)
    for i in cluster_names:
        if _t(tmat, i, i) >= q_min:
            candidates = [i]
        else:
            # only nonzero row entries can win the strict '>' maximum, so
            # iterating the sparse row (ascending j, like the reference's
            # dense scan) is exact
            candidates = []
            max_p = 0.0
            row = tmat.get(i, {})
            for j in sorted(row):
                if i == j or j not in name_set:
                    continue
                p = row[j]
                if p > max_p:
                    max_p = p
                    candidates = [j]
                elif p == max_p and max_p > 0.0:
                    candidates.append(j)
        if not candidates:
            print(f"error: state '{i}' has self-transition probability of "
                  f"{io.fmt_float(_t(tmat, i, i))} at Qmin "
                  f"{io.fmt_float(q_min)} and does not find any transition"
                  " candidates. please have a look at your trajectory!",
                  file=sys.stderr)
            sys.exit(1)
        if len(candidates) == 1:
            future[i] = candidates[0]
        else:
            future[i] = min(candidates, key=lambda s: min_free_energy[s])
    return future


def most_probable_path(future_state, cluster_names):
    """Follow future states until a state repeats (reference: mpp.cpp:288-306)."""
    mpp = {}
    for i in cluster_names:
        path = [i]
        visited = {i}
        nxt = future_state[i]
        while nxt not in visited:
            path.append(nxt)
            visited.add(nxt)
            nxt = future_state[nxt]
        mpp[i] = path
    return mpp


def path_sinks(trajectory, mpp, tmat, cluster_names, q_min, free_energy):
    """Sink (lumping target) per path (reference: mpp.cpp:337-396).

    Reproduces the reference's candidate-collection quirk: the equality loop
    compares the per-frame free energy *indexed by state id*.
    """
    pops = io.microstate_populations(trajectory)
    min_fe = microstate_min_free_energy(trajectory, free_energy)
    fe = np.asarray(free_energy, dtype=np.float32)

    def frame_fe(state):
        return float(fe[state]) if state < len(fe) else float("inf")

    sinks = {}
    for i in cluster_names:
        metastable = [j for j in mpp[i] if _t(tmat, j, j) > q_min]
        if not metastable:
            metastable = list(mpp[i])
        # first min by per-state min free energy (path order on ties)
        candidate = min(metastable, key=lambda s: min_fe[s])
        ref_fe = frame_fe(candidate)
        sink_candidates = set()
        while metastable and frame_fe(candidate) == ref_fe:
            sink_candidates.add(candidate)
            metastable.remove(candidate)
            if not metastable:
                break
            candidate = min(metastable, key=lambda s: min_fe[s])
        if len(sink_candidates) == 1:
            sinks[i] = next(iter(sink_candidates))
        else:
            sinks[i] = max(sorted(sink_candidates),
                           key=lambda s: pops.get(s, 0))
    return sinks


def updated_transition_probabilities(tmat, sinks, pops):
    """Re-lump the transition matrix by the sink mapping
    (reference: mpp.cpp:181-232)."""
    macrostates = sorted(set(sinks.values()))
    micro_of = {m: set() for m in macrostates}
    for frm, to in sinks.items():
        micro_of[to].add(frm)
    relative_pops = {}
    for m in macrostates:
        pop_total = sum(pops.get(u, 0) for u in micro_of[m])
        for u in micro_of[m]:
            relative_pops[u] = float(
                np.float32(np.float32(pops.get(u, 0))
                           / np.float32(pop_total)))
    updated = {}
    for m1 in macrostates:
        row = {}
        row_sum = 0.0
        for m2 in macrostates:
            acc = 0.0
            for u1 in sorted(micro_of[m1]):
                r = tmat.get(u1, {})
                rp = relative_pops[u1]
                for u2 in sorted(micro_of[m2]):
                    acc += rp * r.get(u2, 0.0)
            if acc != 0.0:
                row[m2] = acc
            row_sum += acc
        if row_sum != 0.0:
            for m2 in row:
                row[m2] /= row_sum
        updated[m1] = row
    return updated


def lumped_trajectory(trajectory, sinks):
    """Map every state through the sink lookup (reference: mpp.cpp:400-407)."""
    traj = np.asarray(trajectory, dtype=np.int64)
    vals = np.unique(traj)
    lookup = np.asarray([sinks.get(int(v), int(v)) for v in vals],
                        dtype=np.int64)
    return lookup[np.searchsorted(vals, traj)]


def fixed_metastability_clustering(initial_trajectory, tmat, q_min,
                                   free_energy):
    """Iterate lump->update until the trajectory is stable
    (reference: mpp.cpp:409-485)."""
    traj = np.asarray(initial_trajectory, dtype=np.int64)
    lumping = {}
    for it in range(MAX_ITER):
        names = sorted(set(traj.tolist()))
        if 0 in names:
            print("\nwarning:\n"
                  "  there is a state '0' in your trajectory.\n"
                  "  are you sure you generated a proper trajectory of"
                  " microstates\n"
                  "  (e.g. by running a final, seeded density-clustering"
                  " to fill up the FEL)?\n", file=sys.stderr)
        logger("          %3i %6s" % (it + 1, "%0.3f" % q_min))
        future = single_step_future_state(
            tmat, names, q_min, microstate_min_free_energy(traj, free_energy))
        mpp = most_probable_path(future, names)
        sinks = path_sinks(traj, mpp, tmat, names, q_min, free_energy)
        tmat = updated_transition_probabilities(
            tmat, sinks, io.microstate_populations(traj))
        traj_old = traj
        traj = lumped_trajectory(traj, sinks)
        for frm, to in sinks.items():
            if frm != to:
                lumping[frm] = to
        if np.array_equal(traj_old, traj):
            return traj, lumping, tmat
    raise RuntimeError("reached max. no. of iterations for Q_min"
                       f" convergence: {MAX_ITER}")


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def main(args, header_comment, comments_map):
    basename = args.output
    transitions = {}
    max_pop = {}
    max_qmin = {}
    logger("~~~ reading files\n    trajectory from: " + args.states)
    traj = io.read_clustered_trajectory(args.states)
    io.read_comments(args.states, comments_map)
    n_frames = len(traj)
    logger("    free energy from: " + args.free_energy_input)
    free_energy = io.read_free_energies(args.free_energy_input)
    io.read_comments(args.free_energy_input, comments_map)

    q_min_from = np.float32(args.qmin_from)
    q_min_to = np.float32(args.qmin_to)
    q_min_step = np.float32(args.qmin_step)
    lagtime = int(args.lagtime)

    diff_sized_chunks = bool(args.concat_limits)
    if diff_sized_chunks:
        logger("    concat limits from: " + args.concat_limits)
        concat_limits = io.read_concat_limits(args.concat_limits)
    elif args.concat_nframes:
        step = int(args.concat_nframes)
        concat_limits = list(range(step, n_frames + 1, step))
    else:
        concat_limits = [n_frames]
    io.check_concat_limits(concat_limits, n_frames)

    logger("~~~ transition matrix")
    if args.tprob:
        logger("    read from " + args.tprob + "\n"
               "     lagtime -l will be ignored.")
        tmat = read_transition_probabilities(args.tprob)
    else:
        logger("    compute it")
        names = sorted(set(traj.tolist()))
        if diff_sized_chunks:
            counts = weighted_transition_counts(traj, concat_limits, lagtime)
        else:
            counts = transition_counts(traj, concat_limits, lagtime)
        tmat = row_normalized(counts, names)

    logger("\n~~~ run mpp\n    iteration   qmin")
    q_min = q_min_from
    while q_min <= q_min_to:
        traj_out, lumping, tmat = fixed_metastability_clustering(
            traj, tmat, float(q_min), free_energy)
        header_qmin = io.append_comments_map(header_comment, comments_map)
        header_qmin += ("#\n# mpp specific parameters: \n"
                        "#    qmin = %0.3f \n" % float(q_min))
        traj = traj_out
        io.write_single_column(
            io.stringprintf("%s_traj_%0.3f.dat", basename, float(q_min)),
            [int(s) for s in traj], header_qmin)
        for frm, to in lumping.items():
            transitions[frm] = (to, float(q_min))
        pops = io.microstate_populations(traj)
        io.write_map(
            io.stringprintf("%s_pop_%0.3f.dat", basename, float(q_min)),
            pops, header_qmin)
        for state in set(traj.tolist()):
            max_pop[state] = pops[state]
            max_qmin[state] = float(q_min)
        q_min = np.float32(q_min + q_min_step)

    header_final = io.append_comments_map(header_comment, comments_map)
    with open(basename + "_transitions.dat", "w") as fh:
        fh.write(header_final)
        fh.write("#\n# Specifies the linkage matrix, so at which qmin value\n"
                 "# which states are lumped.\n# state_i state_j qmin\n")
        for frm in sorted(transitions):
            to, q = transitions[frm]
            fh.write(f"{frm} {to} {io.fmt_float(q)}\n")
    io.write_map(basename + "_max_pop.dat", max_pop, header_final)
    io.write_map(basename + "_max_qmin.dat", max_qmin, header_final)
