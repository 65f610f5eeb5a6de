"""Free-energy screening: density-connected microstate assignment.

TPU-native replacement for the reference's screening stage. Semantics follow
the CUDA backend (src/density_clustering_cuda.cu:396-594 with kernel
src/density_clustering_cuda_kernels.cu:132-192), which the reference
validated manually: the frames whose free energy lies below the threshold
(the first ``n_below`` frames in FE-sorted order) are partitioned into the
connected components of the graph

    i ~ j  iff  d2(i, j) < max_dist2 (= 4 * sigma^2)

with previously-assigned cluster labels acting as permanent equivalences
(seeded restarts re-use the previous threshold's clustering,
src/density_clustering.cpp:806-817).

Instead of the reference's host-side fixpoint loop with device label sweeps
and host pointer-chasing merges (CUDA: one host<->device label round-trip per
iteration), the whole fixpoint runs on-device inside one ``lax.while_loop``:

  1. blockwise neighbor-min sweep (Gauss-Seidel over row blocks so min labels
     propagate within a sweep, like the CUDA kernel's in-shared-memory
     updates),
  2. a label-table scatter-min union (the parallel equivalent of the
     reference's ``merge_results`` pointer-chase + dict rebase,
     src/density_clustering_cuda.cu:348-394, 557-571),
  3. pointer-jumping compression of the label table.

Labels are int32 frame pointers in FE-sorted index space with the invariant
label[i] <= i; a component's final label is the smallest sorted-index of its
members, which reproduces the reference's name-assignment order.

``sweep_row_range`` and ``union_rebase`` are shared with the sharded
multi-chip path (clustering_tpu.parallel.sharded).
"""

import functools
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from .pairwise import sq_dists
from ..utils.logger import logger, is_verbose

DEFAULT_ROW_BLOCK = 128
DEFAULT_COL_BLOCK = 4096

# numpy scalar: a jnp constant here would initialize the XLA
# backend at import time, breaking jax.distributed.initialize()
_IMAX = np.int32(np.iinfo(np.int32).max)


def sweep_row_range(coords_all, labels, row_offset, n_rows_local, n_below,
                    max_dist2, row_block, col_block):
    """Gauss-Seidel neighbor-min sweep over rows
    [row_offset, row_offset + n_rows_local).

    ``coords_all`` is the full padded (N_pad, D) FE-sorted frame matrix and
    ``labels`` the full (N_pad,) label vector; only local rows below
    ``n_below`` are updated. Returns the updated full label vector.
    """
    n_local_blocks = n_rows_local // row_block
    n_active = jnp.clip((n_below - row_offset + row_block - 1) // row_block,
                        0, n_local_blocks)
    n_col_blocks = (n_below + col_block - 1) // col_block

    def row_body(i_row, labels_cur):
        row0 = row_offset + i_row * row_block
        x = jax.lax.dynamic_slice_in_dim(coords_all, row0, row_block, axis=0)
        lab_x = jax.lax.dynamic_slice_in_dim(labels_cur, row0, row_block,
                                             axis=0)
        row_ids = row0 + jax.lax.broadcasted_iota(
            jnp.int32, (row_block, 1), 0)[:, 0]

        def col_body(i_col, m):
            col0 = i_col * col_block
            y = jax.lax.dynamic_slice_in_dim(coords_all, col0, col_block,
                                             axis=0)
            lab_y = jax.lax.dynamic_slice_in_dim(labels_cur, col0, col_block,
                                                 axis=0)
            d2 = sq_dists(x, y)
            col_ids = col0 + jax.lax.broadcasted_iota(
                jnp.int32, (row_block, col_block), 1)
            adj = (d2 < max_dist2) & (col_ids < n_below)
            cand = jnp.where(adj, lab_y[None, :], _IMAX)
            return jnp.minimum(m, jnp.min(cand, axis=1))

        m = jax.lax.fori_loop(0, n_col_blocks, col_body,
                              jnp.full((row_block,), _IMAX, dtype=jnp.int32))
        new_lab = jnp.where(row_ids < n_below,
                            jnp.minimum(lab_x, m), lab_x)
        return jax.lax.dynamic_update_slice_in_dim(labels_cur, new_lab,
                                                   row0, axis=0)

    return jax.lax.fori_loop(0, n_active, row_body, labels)


def pointer_jump(table):
    """Compress label chains until table == table[table].

    One gather per iteration: the convergence test reuses the body's
    doubled table instead of re-gathering in the loop condition."""
    def cond(state):
        return state[1]

    def body(state):
        m, _ = state
        m2 = m[m]
        return (m2, jnp.any(m2 != m))

    out, _ = jax.lax.while_loop(cond, body, (table, jnp.bool_(True)))
    return out


def union_rebase(labels_in, labels_cur):
    """Label-granularity union: all frames sharing a pre-sweep label are
    rebased to the minimum post-sweep label proposed for it (parallel
    equivalent of the reference dict-rebase,
    src/density_clustering_cuda.cu:557-571)."""
    iota = jnp.arange(labels_in.shape[0], dtype=jnp.int32)
    table = iota.at[labels_in].min(labels_cur)
    table = pointer_jump(table)
    return table[labels_in]


@functools.partial(jax.jit, static_argnames=("row_block", "col_block"))
def _screening_fixpoint(coords_sorted, labels0, n_below, max_dist2,
                        row_block=DEFAULT_ROW_BLOCK,
                        col_block=DEFAULT_COL_BLOCK):
    """Run the connected-component fixpoint on one chip.

    Args:
      coords_sorted: (N_pad, D) fp32, frames in FE-ascending order (padded).
      labels0: (N_pad,) int32 initial frame-pointer labels, labels0[i] <= i.
      n_below: dynamic int32, number of in-play frames (FE below threshold).
      max_dist2: dynamic fp32 squared linking distance.
    Returns:
      (N_pad,) int32 final labels (component = min member sorted-index).
    """
    n_pad = coords_sorted.shape[0]

    def outer_cond(state):
        return state[1]

    def outer_body(state):
        labels_in, _, it = state
        labels_cur = sweep_row_range(coords_sorted, labels_in, 0, n_pad,
                                     n_below, max_dist2,
                                     row_block, col_block)
        labels_out = union_rebase(labels_in, labels_cur)
        return (labels_out, jnp.any(labels_out != labels_in), it + 1)

    labels, _, iters = jax.lax.while_loop(
        outer_cond, outer_body, (labels0, jnp.bool_(True), jnp.int32(0)))
    return labels, iters


@functools.partial(jax.jit,
                   static_argnames=("row_block", "col_block"))
def _sweep_group(coords_t, labels, n_below, max_dist2, tile_i, tile_j,
                 dirty, row_block, col_block):
    """One group of sweep chunks: scan label_min_sparse, fold proposals
    into the labels (Gauss-Seidel across chunks). Bounded program size."""
    from .pallas_kernels import label_min_sparse

    def chunk_body(labels_cur, tt):
        ti_c, tj_c = tt
        mi = label_min_sparse(coords_t, labels_cur.reshape(1, -1),
                              n_below, max_dist2, ti_c, tj_c, dirty=dirty,
                              row_block=row_block, col_block=col_block)[0]
        return jnp.minimum(labels_cur, mi), None

    out, _ = jax.lax.scan(chunk_body, labels, (tile_i, tile_j))
    return out


@functools.partial(jax.jit, static_argnames=("union_size", "col_block"))
def _union_step(labels_in, labels_swept, union_size, col_block):
    """Union + pointer jumping + dirty/convergence flags for one sweep of
    the host-driven fixpoint (see _sparse_fixpoint for the semantics)."""
    ncb = labels_in.shape[0] // col_block
    head_in = labels_in[:union_size]
    head_out = union_rebase(head_in, labels_swept[:union_size])
    changed = head_out != head_in
    labels_out = (head_out if union_size == labels_in.shape[0] else
                  jnp.concatenate([head_out, labels_in[union_size:]]))
    nub = union_size // col_block
    dirty_head = jnp.any(changed.reshape(nub, col_block),
                         axis=1).astype(jnp.int32)
    dirty_next = (dirty_head if nub == ncb else
                  jnp.concatenate([dirty_head,
                                   jnp.zeros(ncb - nub, jnp.int32)]))
    return labels_out, jnp.any(changed), dirty_next


def _sparse_fixpoint_host(coords_t, labels0, n_below, max_dist2,
                          tile_i, tile_j, row_block, col_block, union_size,
                          group):
    """Host-driven variant of _sparse_fixpoint for tile lists too long for
    a single device program: each sweep is a series of bounded group
    dispatches, convergence is a one-scalar readback per sweep."""
    tile_i = np.asarray(tile_i, dtype=np.int32)
    tile_j = np.asarray(tile_j, dtype=np.int32)
    first_occ = jnp.asarray(_first_occ_mask(tile_i, tile_j))
    tile_i_dev = jnp.asarray(tile_i)
    tile_j_dev = jnp.asarray(tile_j)
    n_pad = coords_t.shape[1]
    ncb = n_pad // col_block
    nb = jnp.int32(n_below)
    md2 = jnp.float32(max_dist2)
    labels = labels0
    dirty = jnp.ones((ncb,), dtype=jnp.int32)
    iters = 0
    # device-resident accumulator: the per-sweep count rides along with
    # the sweep dispatches and is read back ONCE at the end (a blocking
    # readback here would add a tunnel round-trip to every sweep)
    swept_total_dev = jnp.float32(0.0)
    while True:
        swept_total_dev = swept_total_dev + _swept_count(
            first_occ, tile_i_dev, tile_j_dev, dirty)
        swept = labels
        for lo in range(0, tile_i.shape[0], group):
            ti_g, tj_g = tile_i[lo:lo + group], tile_j[lo:lo + group]
            if ti_g.shape[0] < group:
                pad = group - ti_g.shape[0]
                ti_g = np.concatenate([ti_g, np.repeat(ti_g[-1:], pad, 0)])
                tj_g = np.concatenate([tj_g, np.repeat(tj_g[-1:], pad, 0)])
            swept = _sweep_group(coords_t, swept, nb, md2,
                                 jnp.asarray(ti_g), jnp.asarray(tj_g),
                                 dirty, row_block=row_block,
                                 col_block=col_block)
        labels, changed, dirty = _union_step(labels, swept,
                                             union_size=union_size,
                                             col_block=col_block)
        iters += 1
        if not bool(changed):
            break
    return labels, iters, float(jax.device_get(swept_total_dev))


def _first_occ_mask(tile_i, tile_j):
    """int32 mask over a stacked (n_chunks, bucket) tile list marking the
    first occurrence of each tile in scan order (repeat-padding and
    chunk-boundary duplicates carry 0) -- the unit of the swept-tile
    accounting."""
    ti = np.asarray(tile_i, dtype=np.int64).reshape(-1)
    tj = np.asarray(tile_j, dtype=np.int64).reshape(-1)
    same = np.zeros(ti.shape[0], dtype=bool)
    same[1:] = (ti[1:] == ti[:-1]) & (tj[1:] == tj[:-1])
    return (~same).astype(np.int32).reshape(np.shape(tile_i))


@jax.jit
def _swept_count(first_occ, tile_i, tile_j, dirty):
    """Tiles the sweep kernel actually computed this round: first
    occurrences whose column block was dirty (mirrors the kernel's own
    skip condition in _label_min_sparse_kernel). float32 accumulator:
    counts are accounting-only and can exceed int32 at 16M frames."""
    return jnp.sum((first_occ * dirty[tile_j]).astype(jnp.float32))


@jax.jit
def _swept_count_bidir(first_occ, tile_i, tile_j, dirty_col, dirty_row):
    """Bidirectional variant: a tile is swept when either side is dirty
    (mirrors _label_min_bidir_kernel)."""
    gate = (dirty_col[tile_j] != 0) | (dirty_row[tile_i] != 0)
    return jnp.sum((first_occ * gate.astype(jnp.int32))
                   .astype(jnp.float32))


@jax.jit
def _first_occ_device(ti, tj):
    """Device twin of _first_occ_mask over stacked (n_chunks, bucket)
    tile chunks (repeat-padding and chunk-boundary duplicates carry 0)."""
    t_i = ti.reshape(-1)
    t_j = tj.reshape(-1)
    same = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_),
         (t_i[1:] == t_i[:-1]) & (t_j[1:] == t_j[:-1])])
    return (~same).astype(jnp.int32).reshape(ti.shape)


@functools.partial(jax.jit,
                   static_argnames=("row_block", "col_block", "triangular"))
def _screen_active_device(below, n_below, row_lo, row_block, col_block,
                          triangular):
    """Device twin of _tile_list_locked's mask algebra: the bbox
    strict-< plane restricted to the FE-threshold prefix, the
    new-frame cross (``row_lo`` > 0) and (``triangular``) the upper
    triangle. ``n_below``/``row_lo`` are traced, so one compiled
    program serves every step of a threshold series."""
    nrb, ncb = below.shape
    ri = jnp.arange(nrb, dtype=jnp.int32)[:, None]
    cj = jnp.arange(ncb, dtype=jnp.int32)[None, :]
    active = below & (ri * row_block < n_below) & (cj * col_block < n_below)
    cross = ((ri + 1) * row_block > row_lo) | ((cj + 1) * col_block > row_lo)
    active = active & jnp.where(row_lo > 0, cross, True)
    if triangular:
        active = active & ((cj + 1) * col_block > ri * row_block)
    return active


@functools.partial(jax.jit, static_argnames=("span", "union_size",
                                             "row_block", "col_block"))
def _sweep_group_bidir(coords_t, labels, n_below, max_dist2, ti_g, tj_g,
                       dirty_col, dirty_row, base, span, union_size,
                       row_block, col_block):
    """One bounded group of bidirectional sweep chunks for the
    host-driven big-N fixpoint: scan label_min_sparse_bidir over the
    group, folding row proposals and the window's column proposals
    (Gauss-Seidel across chunks). ``base`` is traced so every window of
    one span shares a single compiled program."""
    from .pallas_kernels import label_min_sparse_bidir

    lo = base * jnp.int32(col_block)
    w = span * col_block

    def chunk_body(labels_cur, tt):
        ti_c, tj_c = tt
        # per-tile dirty gate, gathered on device: the kernel takes a
        # chunk-length flag array (per-block arrays in SMEM scaled with
        # N and overflowed v5e's 1MB scalar memory at 16M frames)
        dt_c = ((dirty_col[tj_c] != 0)
                | (dirty_row[ti_c] != 0)).astype(jnp.int32)
        row_p, col_p = label_min_sparse_bidir(
            coords_t, labels_cur.reshape(1, -1), n_below, max_dist2,
            ti_c, tj_c, dt_c, union_size,
            row_block=row_block, col_block=col_block,
            col_base=base, col_span=span)
        lab = jnp.minimum(labels_cur, row_p[0])
        seg = jax.lax.dynamic_slice_in_dim(lab, lo, w, 0)
        seg = jnp.minimum(seg, col_p[0])
        return jax.lax.dynamic_update_slice(lab, seg, (lo,)), None

    out, _ = jax.lax.scan(chunk_body, labels, (ti_g, tj_g))
    return out


@functools.partial(jax.jit, static_argnames=("union_size", "col_block",
                                             "row_block"))
def _union_step_bidir(labels_in, labels_swept, union_size, col_block,
                      row_block):
    """Union + pointer jumping + dirty col/row flags for one sweep of
    the host-driven bidirectional fixpoint (the bidir twin of
    _union_step)."""
    n_pad = labels_in.shape[0]
    ncb = n_pad // col_block
    nrb = n_pad // row_block
    nub = union_size // col_block
    nru = union_size // row_block
    head_in = labels_in[:union_size]
    head_out = union_rebase(head_in, labels_swept[:union_size])
    changed = head_out != head_in
    labels_out = (head_out if union_size == n_pad else
                  jnp.concatenate([head_out, labels_in[union_size:]]))
    dc = jnp.any(changed.reshape(nub, col_block), axis=1).astype(jnp.int32)
    dirty_col = (dc if nub == ncb else
                 jnp.concatenate([dc, jnp.zeros(ncb - nub, jnp.int32)]))
    dr = jnp.any(changed.reshape(nru, row_block), axis=1).astype(jnp.int32)
    dirty_row = (dr if nru == nrb else
                 jnp.concatenate([dr, jnp.zeros(nrb - nru, jnp.int32)]))
    return labels_out, jnp.any(changed), dirty_col, dirty_row


def _group_win_parts(win_parts, group):
    """Bound each window's stacked chunks into dispatch groups of at most
    ``group`` chunks (device slicing; pad groups keep tiles in-window by
    repeating the last chunk, first_occ pads carry 0 so the accounting
    never counts them). Returns [(base_dev, span, [(ti_g, tj_g,
    fo_g), ...]), ...]."""
    from .pallas_kernels import _group_pad

    grouped = []
    for base, span, ti_st, tj_st, fo_st in win_parts:
        n_chunks = ti_st.shape[0]
        gs = []
        for lo in range(0, n_chunks, group):
            ti_g, tj_g, fo_g = (jnp.asarray(ti_st[lo:lo + group]),
                                jnp.asarray(tj_st[lo:lo + group]),
                                jnp.asarray(fo_st[lo:lo + group]))
            if ti_g.shape[0] < group and n_chunks > group:
                ti_g, tj_g, fo_g = _group_pad(
                    (ti_g, tj_g, fo_g), group, ("repeat", "repeat", 0))
            gs.append((ti_g, tj_g, fo_g))
        grouped.append((jnp.int32(base), span, gs))
    return grouped


def _sparse_fixpoint_host_bidir(coords_t, labels0, n_below, max_dist2,
                                win_parts, row_block, col_block,
                                union_size, group):
    """Host-driven bidirectional fixpoint for tile lists too long for a
    single device program: each sweep dispatches bounded groups of
    chunks per column window, convergence is a one-scalar readback per
    sweep. ``win_parts`` is a list of (base, span, ti_st, tj_st,
    first_occ_st) with (n_chunks, bucket) stacked chunks, host or
    device-resident. Same fixpoint as _sparse_fixpoint_bidir (min-label
    propagation has a unique least solution)."""
    n_pad = coords_t.shape[1]
    ncb = n_pad // col_block
    nrb = n_pad // row_block
    nb = jnp.int32(n_below)
    md2 = jnp.float32(max_dist2)
    grouped = _group_win_parts(win_parts, group)
    labels = labels0
    dirty_col = jnp.ones((ncb,), dtype=jnp.int32)
    dirty_row = jnp.ones((nrb,), dtype=jnp.int32)
    swept_dev = jnp.float32(0.0)
    iters = 0
    while True:
        swept_lab = labels
        for base, span, gs in grouped:
            for ti_g, tj_g, fo_g in gs:
                swept_dev = swept_dev + _swept_count_bidir(
                    fo_g, ti_g, tj_g, dirty_col, dirty_row)
                swept_lab = _sweep_group_bidir(
                    coords_t, swept_lab, nb, md2, ti_g, tj_g,
                    dirty_col, dirty_row, base, span=span,
                    union_size=union_size, row_block=row_block,
                    col_block=col_block)
        labels, changed, dirty_col, dirty_row = _union_step_bidir(
            labels, swept_lab, union_size=union_size,
            col_block=col_block, row_block=row_block)
        iters += 1
        if not bool(changed):
            break
    return labels, iters, float(jax.device_get(swept_dev))


@functools.partial(jax.jit,
                   static_argnames=("row_block", "col_block", "union_size"))
def _sparse_fixpoint(coords_t, labels0, n_below, max_dist2, tile_i, tile_j,
                     first_occ, row_block, col_block, union_size=None):
    """On-device fixpoint over sparse-tile sweeps. ``tile_i/tile_j`` are
    stacked (n_chunks, bucket) SMEM-sized chunks scanned per sweep.
    Compiles once per (n_chunks, bucket, union_size); the whole iteration
    (sweep + scatter-min union + pointer jumping + convergence test) stays
    on the chip.

    ``union_size`` (static, a multiple of col_block, >= n_below) bounds the
    label-table union to the prefix that can actually change: sweeps only
    update rows below n_below and only propose labels < n_below, so the
    tail passes through untouched. The caller quantizes it to keep compile
    variety bounded.

    Returns (labels, sweep count, total tiles actually swept across all
    sweeps -- the dirty-gated measured compute, not an upper bound)."""
    from .pallas_kernels import label_min_sparse

    n_pad = coords_t.shape[1]
    ncb = n_pad // col_block
    if union_size is None:
        union_size = n_pad
    nub = union_size // col_block

    def cond(state):
        return state[1]

    def body(state):
        labels_in, _, it, dirty, swept = state
        swept = swept + _swept_count(first_occ, tile_i, tile_j, dirty)

        def chunk_body(labels_cur, tt):
            ti_c, tj_c = tt
            mi = label_min_sparse(coords_t, labels_cur.reshape(1, -1),
                                  n_below, max_dist2, ti_c, tj_c,
                                  dirty=dirty,
                                  row_block=row_block,
                                  col_block=col_block)[0]
            # Gauss-Seidel across chunks: later chunks see earlier chunks'
            # merges, so min-labels propagate further per sweep (the
            # fixpoint is the same -- min-propagation is monotone and
            # order-independent at convergence)
            return jnp.minimum(labels_cur, mi), None

        labels_swept, _ = jax.lax.scan(chunk_body, labels_in,
                                       (tile_i, tile_j))
        head_in = labels_in[:union_size]
        head_cur = labels_swept[:union_size]
        head_out = union_rebase(head_in, head_cur)
        changed = head_out != head_in
        labels_out = (head_out if union_size == n_pad else
                      jnp.concatenate([head_out, labels_in[union_size:]]))
        # a tile whose column block's labels are unchanged can only
        # re-propose equivalences already in the union: sweep only tiles
        # with dirty columns next round (exact, not a heuristic)
        dirty_head = jnp.any(changed.reshape(nub, col_block),
                             axis=1).astype(jnp.int32)
        dirty_next = (dirty_head if nub == ncb else
                      jnp.concatenate([dirty_head,
                                       jnp.zeros(ncb - nub, jnp.int32)]))
        return (labels_out, jnp.any(changed), it + 1, dirty_next, swept)

    labels, _, iters, _, swept = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0),
                     jnp.ones((ncb,), dtype=jnp.int32), jnp.float32(0)))
    return labels, iters, swept


@functools.partial(jax.jit,
                   static_argnames=("row_block", "col_block", "union_size",
                                    "windows"))
def _sparse_fixpoint_bidir(coords_t, labels0, n_below, max_dist2,
                           parts, row_block, col_block,
                           union_size, windows):
    """On-device fixpoint over an UPPER-TRIANGULAR tile list with the
    bidirectional sweep kernel: each tile is evaluated once and proposes
    labels both ways, halving the distance work of the symmetric list
    (reference GPU analog sweeps the full square,
    src/density_clustering_cuda.cu:501-572). Same fixpoint as
    _sparse_fixpoint -- min-label propagation converges to the unique
    per-component minimum regardless of sweep schedule.

    ``parts`` is a tuple of (tile_i, tile_j, first_occ) stacked-chunk
    triples, one per column-range partition; ``windows`` the matching
    static (col_base, col_span) pairs. Each partition's sweep folds its
    column proposals at its own offset, so the kernel's VMEM-resident
    accumulator never caps the union size (a single full-range partition
    is the common case). Partition order within a sweep is irrelevant:
    the fixpoint is the unique least solution."""
    from .pallas_kernels import label_min_sparse_bidir

    n_pad = coords_t.shape[1]
    ncb = n_pad // col_block
    nrb = n_pad // row_block
    nub = union_size // col_block
    nru = union_size // row_block

    def cond(state):
        return state[1]

    def body(state):
        labels_in, _, it, dirty_col, dirty_row, swept = state

        labels_swept = labels_in
        for (ti_p, tj_p, first_occ_p), (base, span) in zip(parts, windows):
            swept = swept + _swept_count_bidir(first_occ_p, ti_p, tj_p,
                                               dirty_col, dirty_row)
            lo, w = base * col_block, span * col_block

            def chunk_body(labels_cur, tt, lo=lo, w=w, base=base,
                           span=span):
                ti_c, tj_c = tt
                # per-tile dirty gate (see _sweep_group_bidir): keeps
                # the kernel's SMEM footprint chunk-sized, not N-sized
                dt_c = ((dirty_col[tj_c] != 0)
                        | (dirty_row[ti_c] != 0)).astype(jnp.int32)
                row_p, col_p = label_min_sparse_bidir(
                    coords_t, labels_cur.reshape(1, -1), n_below,
                    max_dist2, ti_c, tj_c, dt_c,
                    union_size, row_block=row_block, col_block=col_block,
                    col_base=base, col_span=span)
                lab = jnp.minimum(labels_cur, row_p[0])
                mid = jnp.minimum(lab[lo:lo + w], col_p[0])
                segs = ([lab[:lo]] if lo else []) + [mid] \
                    + ([lab[lo + w:]] if lo + w < n_pad else [])
                lab = segs[0] if len(segs) == 1 else jnp.concatenate(segs)
                return lab, None

            labels_swept, _ = jax.lax.scan(chunk_body, labels_swept,
                                           (ti_p, tj_p))
        head_in = labels_in[:union_size]
        head_out = union_rebase(head_in, labels_swept[:union_size])
        changed = head_out != head_in
        labels_out = (head_out if union_size == n_pad else
                      jnp.concatenate([head_out, labels_in[union_size:]]))
        dc_head = jnp.any(changed.reshape(nub, col_block),
                          axis=1).astype(jnp.int32)
        dirty_col = (dc_head if nub == ncb else
                     jnp.concatenate([dc_head,
                                      jnp.zeros(ncb - nub, jnp.int32)]))
        dr_head = jnp.any(changed.reshape(nru, row_block),
                          axis=1).astype(jnp.int32)
        dirty_row = (dr_head if nru == nrb else
                     jnp.concatenate([dr_head,
                                      jnp.zeros(nrb - nru, jnp.int32)]))
        return (labels_out, jnp.any(changed), it + 1, dirty_col, dirty_row,
                swept)

    labels, _, iters, _, _, swept = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0),
                     jnp.ones((ncb,), dtype=jnp.int32),
                     jnp.ones((nrb,), dtype=jnp.int32), jnp.float32(0)))
    return labels, iters, swept


class ScreeningEngine:
    """Re-usable screening runner for a threshold series: pads and uploads
    the FE-sorted coordinates once and caches the (threshold-independent)
    block bounding boxes. Backend 'pallas' runs a host-driven fixpoint
    over sparse active-tile sweeps; 'xla' uses the blockwise jnp
    while_loop; 'auto' picks by platform."""

    def __init__(self, coords_sorted, row_block=DEFAULT_ROW_BLOCK,
                 col_block=DEFAULT_COL_BLOCK, backend="auto", mesh=None):
        if backend == "auto":
            backend = "xla" if jax.default_backend() == "cpu" else "pallas"
        self.backend = backend
        self.mesh = mesh
        self.row_block = row_block
        self.col_block = col_block
        coords_sorted = np.asarray(coords_sorted, dtype=np.float32)
        self.n = coords_sorted.shape[0]
        if mesh is not None:
            from ..parallel.mesh import mesh_size
            self._n_dev = mesh_size(mesh)
            block = int(np.lcm(self._n_dev * row_block, col_block))
        else:
            self._n_dev = 1
            block = int(np.lcm(row_block, col_block))
        self.n_pad = -(-self.n // block) * block
        padded = np.zeros((self.n_pad, coords_sorted.shape[1]),
                          dtype=np.float32)
        padded[:self.n] = coords_sorted
        padded[self.n:] = np.float32(3e38)
        self._padded_host = padded
        dev = padded.T if backend == "pallas" else padded
        if mesh is not None:
            from ..parallel.mesh import replicated
            self._coords_dev = replicated(dev, mesh)
        else:
            self._coords_dev = jnp.asarray(dev)
        self._bbox_d2_dev = None
        self._bbox_mask = None  # (max_dist2, strict-< tile mask)
        self._below_dev = None  # (max_dist2, device strict-< bool plane)
        # per-step host tile lists of a series, keyed
        # (row_lo, n_below, max_dist2, triangular): the precompile
        # daemon and the real step plan the same lists
        self._tile_cache = {}
        self._win_cache = {}  # device twin, capped at WIN_CACHE_CAP
        # serializes _tile_list's bbox-mask cache fill between the main
        # thread and the series' compile-prefetch daemon
        self._plan_lock = threading.Lock()
        self.last_stats = {}  # sweep/tile accounting of the last fixpoint

    # big-N device planning: same gate as the density engine's
    # (CLUSTERING_TPU_DEVICE_PLAN=1/0 forces on/off, auto above
    # DEVICE_PLAN_MIN_FRAMES padded frames). Above the gate the host
    # planner's (nrb, ncb) masks, packed-plane download and np.nonzero
    # over ~hundreds of millions of tile entries dominate the stage --
    # the exact O(tiles) host pattern that cost pops 760s at 16M before
    # the engine moved planning on device (BIGN_r03 vs r04).
    DEVICE_PLAN_MIN_FRAMES = 1 << 22

    def _device_plan_on(self):
        env = os.environ.get("CLUSTERING_TPU_DEVICE_PLAN")
        if env == "0":
            return False
        if env == "1":
            return True
        return self.n_pad >= self.DEVICE_PLAN_MIN_FRAMES

    def _below_plane_dev(self, max_dist2):
        """Device-resident strict-< bbox activity plane (series-constant:
        one plane serves every threshold step). The (nrb, ncb) bbox
        distance matrix is dropped once thresholded -- it is 2.1GB of
        HBM at 16M frames and never needed again at a fixed
        max_dist2."""
        from . import pruning
        key = float(max_dist2)
        if self._below_dev is None or self._below_dev[0] != key:
            if self._bbox_d2_dev is None:
                ct = (self._coords_dev if self.backend == "pallas"
                      and self.mesh is None
                      else jnp.asarray(self._padded_host.T))
                self._bbox_d2_dev = pruning.bbox_d2_device(
                    ct, row_block=self.row_block, col_block=self.col_block)
            below = pruning.le_planes_device(
                self._bbox_d2_dev,
                jnp.asarray([np.float32(max_dist2)], dtype=jnp.float32),
                strict=True)[0]
            self._below_dev = (key, below)
            self._bbox_d2_dev = None
        return self._below_dev[1]

    # device window plans the compile-prefetch daemon and the real step
    # share (the planning nonzero/count programs are real device work at
    # big N); capped so at most this many steps' tile lists live in HBM
    WIN_CACHE_CAP = 2

    def _bidir_windows(self, row_lo, n_below, max_dist2, union_size):
        key = (int(row_lo), int(n_below), float(max_dist2),
               int(union_size))
        with self._plan_lock:
            if key not in self._win_cache:
                self._win_cache[key] = self._bidir_windows_dev(
                    row_lo, n_below, max_dist2, union_size)
                while len(self._win_cache) > self.WIN_CACHE_CAP:
                    self._win_cache.pop(next(iter(self._win_cache)))
            return self._win_cache[key]

    def _bidir_windows_dev(self, row_lo, n_below, max_dist2, union_size):
        """Device-planned upper-triangular tile windows: the activity
        mask, tile lists and first-occurrence masks all stay ON DEVICE
        (pruning.tile_list_device); the only planning transfer is one
        (W,) window-count fetch. Returns a list of (base, span, ti_st,
        tj_st, first_occ_st) column windows (None when empty) -- the
        same tile sets, row-major order and window policy as the host
        planner's _tile_list + _bidir_partitions. Caller holds
        ``_plan_lock`` (via :meth:`_bidir_windows`)."""
        from . import pruning
        below = self._below_plane_dev(max_dist2)
        active = _screen_active_device(
            below, jnp.int32(n_below), jnp.int32(row_lo),
            self.row_block, self.col_block, True)
        ncb = self.n_pad // self.col_block
        span_cap = max(int(self.BIDIR_UNION_VMEM
                           // (self.col_block * 4)), 1)
        # span pinned to the VMEM cap, NOT the union width: a series'
        # union grows per step, and union-sized spans compiled a fresh
        # window_counts + tile-list nonzero program per step (10-40s
        # each at 16M frames, t_plan 25-40s/step in the first BIGN_r05
        # probe). With the span fixed, every step shares the same
        # planning programs; windows past the union hold no active
        # tiles (the mask is restricted to cols < n_below) and the
        # sweep's beyond-union accumulator columns fold as no-op IMAX
        # proposals.
        span = min(span_cap, ncb)
        counts_w = np.asarray(jax.device_get(
            pruning.window_counts_device(active, span)))
        if int(counts_w.sum()) == 0:
            return None

        def _win(w_base):
            w, base = w_base
            c = int(counts_w[w])
            if c == 0:
                return None
            width = min(span, ncb - base)
            ti_st, tj_st = pruning.tile_list_device(
                active, c, base=base, width=width, quantize_chunks=True)
            return (base, width, ti_st, tj_st,
                    _first_occ_device(ti_st, tj_st))
        bases = list(enumerate(range(0, ncb, span)))
        if len(bases) > 1:
            # distinct residual programs compile concurrently (the
            # remote compiler parallelizes across threads)
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=min(4, len(bases))) as ex:
                wins = [win for win in ex.map(_win, bases)
                        if win is not None]
        else:
            wins = [win for win in map(_win, bases) if win is not None]
        return wins

    def _tile_list(self, row_lo, n_below, max_dist2, triangular=False):
        key = (int(row_lo), int(n_below), float(max_dist2),
               bool(triangular))
        with self._plan_lock:
            if key not in self._tile_cache:
                # memoized per series step: the precompile daemon and
                # the real step ask for the same list, and np.nonzero +
                # chunking is a real per-step host cost at large N
                self._tile_cache[key] = self._tile_list_locked(
                    row_lo, n_below, max_dist2, triangular)
                while len(self._tile_cache) > 4 * self.WIN_CACHE_CAP:
                    self._tile_cache.pop(next(iter(self._tile_cache)))
            return self._tile_cache[key]

    def _tile_list_locked(self, row_lo, n_below, max_dist2,
                          triangular=False):
        """Active tiles: bbox distance below the linking distance, at least
        partly below the FE threshold, and touching the new-frame cross
        when ``row_lo`` > 0. Row-major sorted; padded by repetition to the
        next power of two so a handful of compiled grid sizes serve the
        whole series (the min-reduction is idempotent under repeats).

        ``triangular`` keeps only tiles intersecting the upper triangle
        (col range reaching past the row range's start): every unordered
        admissible pair (r, c), r < c, lies in the kept tile
        (rowblock(r), colblock(c)), so with the bidirectional sweep
        kernel the mirrored tiles are redundant -- ~2x fewer distance
        evaluations."""
        from . import pruning
        rb, cb = self.row_block, self.col_block
        key = float(max_dist2)
        if self._bbox_mask is None or self._bbox_mask[0] != key:
            # bbox distances on device, packed-bit download (the host
            # bbox matrix is the cold-start wall at production N);
            # max_dist2 is series-constant, so one mask serves every
            # threshold step
            if self._bbox_d2_dev is None:
                ct = (self._coords_dev if self.backend == "pallas"
                      and self.mesh is None
                      else jnp.asarray(self._padded_host.T))
                self._bbox_d2_dev = pruning.bbox_d2_device(
                    ct, row_block=rb, col_block=cb)
            below = pruning.active_masks_device(
                self._bbox_d2_dev, [np.float32(max_dist2)],
                strict=True)[0]
            self._bbox_mask = (key, below)
        active_lt = self._bbox_mask[1]
        nrb, ncb = active_lt.shape
        ri = np.arange(nrb)[:, None]
        cj = np.arange(ncb)[None, :]
        active = active_lt \
            & (ri * rb < n_below) & (cj * cb < n_below)
        if row_lo > 0:
            active &= ((ri + 1) * rb > row_lo) | ((cj + 1) * cb > row_lo)
        if triangular:
            active &= (cj + 1) * cb > ri * rb
        tiles = pruning.tile_list(active, pad_mode="repeat")
        if tiles is None:
            return None
        ti, tj = tiles
        # the fixpoint jit is keyed on (n_chunks, bucket): quantize the
        # chunk count to powers of two as well, padding by re-sweeping the
        # last chunk (idempotent min)
        n_chunks = ti.shape[0]
        if n_chunks > 1:
            q = 1 << int(np.ceil(np.log2(n_chunks)))
            if q != n_chunks:
                reps = np.repeat(ti[-1:], q - n_chunks, axis=0)
                ti = np.concatenate([ti, reps], axis=0)
                tj = np.concatenate(
                    [tj, np.repeat(tj[-1:], q - n_chunks, axis=0)], axis=0)
        return ti, tj

    def run_device(self, labels_dev, n_below, max_dist2, row_lo=0):
        """Like :meth:`run` but with device-resident (N_pad,) int32 labels
        in and out -- a threshold series seeds each step directly from the
        previous fixpoint without host round-trips."""
        if self.backend == "pallas" and self.mesh is not None:
            from ..parallel import sharded
            from .pallas_kernels import DISPATCH_CHUNK_GROUP
            union_size = self._union_size(n_below)
            bidir = self._bidir_ok(union_size)
            tiles = self._tile_list(row_lo, n_below, max_dist2,
                                    triangular=bidir)
            if tiles is None:
                return labels_dev
            from ..parallel.mesh import replicated
            ti_dev, tj_dev = self._split_tiles_per_device(*tiles)
            ti_dev = replicated(ti_dev, self.mesh)
            tj_dev = replicated(tj_dev, self.mesh)
            if bidir and ti_dev.shape[1] <= DISPATCH_CHUNK_GROUP:
                return sharded._screening_sharded_pallas_bidir(
                    self._coords_dev, labels_dev, jnp.int32(n_below),
                    jnp.float32(max_dist2), ti_dev, tj_dev, self.mesh,
                    row_block=self.row_block, col_block=self.col_block,
                    union_size=union_size)
            if bidir:
                # the host-driven safety valve stays symmetric: rebuild
                # the full tile list
                tiles = self._tile_list(row_lo, n_below, max_dist2)
                ti_dev, tj_dev = self._split_tiles_per_device(*tiles)
                ti_dev = replicated(ti_dev, self.mesh)
                tj_dev = replicated(tj_dev, self.mesh)
            if ti_dev.shape[1] > DISPATCH_CHUNK_GROUP:
                # per-device tile list too long for one device program
                # (runtime watchdogs): host-driven bounded group sweeps,
                # same safety valve as the single-chip path below
                out, iters = sharded._sparse_fixpoint_host_mesh(
                    self._coords_dev, labels_dev, n_below, max_dist2,
                    ti_dev, tj_dev, self.mesh,
                    self.row_block, self.col_block, union_size,
                    DISPATCH_CHUNK_GROUP)
                if is_verbose():
                    logger(f"    [mesh screening fixpoint: {int(iters)}"
                           f" sweeps (host-driven),"
                           f" {ti_dev.shape[1] * ti_dev.shape[2]}"
                           " tiles/device/sweep]")
                return out
            return sharded._screening_sharded_pallas(
                self._coords_dev, labels_dev, jnp.int32(n_below),
                jnp.float32(max_dist2), ti_dev, tj_dev, self.mesh,
                row_block=self.row_block, col_block=self.col_block,
                union_size=union_size)
        if self.backend == "pallas":
            t_plan0 = time.perf_counter()
            union_size = self._union_size(n_below)
            from .pallas_kernels import DISPATCH_CHUNK_GROUP
            mode = "symmetric"
            plan_kind = "host"
            driver = "device-program"
            win_parts = None
            if self._bidir_ok(union_size):
                if self._device_plan_on():
                    win_parts = self._bidir_windows(
                        row_lo, n_below, max_dist2, union_size)
                    plan_kind = "device"
                    if win_parts is None:
                        return labels_dev
                    mode = "bidir"
                else:
                    tiles = self._tile_list(row_lo, n_below, max_dist2,
                                            triangular=True)
                    if tiles is None:
                        return labels_dev
                    parts, windows = self._bidir_partitions(
                        tiles[0], tiles[1], union_size)
                    win_parts = [
                        (base, span, ti_p, tj_p, fo_p)
                        for (ti_p, tj_p, fo_p), (base, span)
                        in zip(parts, windows)]
                    mode = "bidir"
            if mode == "bidir":
                n_chunks_total = sum(p[2].shape[0] for p in win_parts)
                tiles_per_sweep = sum(p[2].shape[0] * p[2].shape[1]
                                      for p in win_parts)
                t_plan = time.perf_counter() - t_plan0
                t_disp0 = time.perf_counter()
                if n_chunks_total <= DISPATCH_CHUNK_GROUP:
                    parts = tuple((ti_p, tj_p, fo_p)
                                  for _, _, ti_p, tj_p, fo_p in win_parts)
                    windows = tuple((base, span)
                                    for base, span, *_ in win_parts)
                    out, iters, swept = _sparse_fixpoint_bidir(
                        self._coords_dev, labels_dev,
                        jnp.int32(n_below), jnp.float32(max_dist2),
                        parts,
                        row_block=self.row_block, col_block=self.col_block,
                        union_size=union_size, windows=windows)
                else:
                    # tile list too long for one device program (runtime
                    # watchdogs): host-driven bounded group sweeps, one
                    # convergence readback per sweep
                    driver = "host-groups"
                    out, iters, swept = _sparse_fixpoint_host_bidir(
                        self._coords_dev, labels_dev, n_below, max_dist2,
                        win_parts, self.row_block, self.col_block,
                        union_size, DISPATCH_CHUNK_GROUP)
            else:
                tiles = self._tile_list(row_lo, n_below, max_dist2)
                if tiles is None:
                    return labels_dev
                ti, tj = tiles
                tiles_per_sweep = int(ti.shape[0] * ti.shape[1])
                t_plan = time.perf_counter() - t_plan0
                t_disp0 = time.perf_counter()
                if ti.shape[0] > DISPATCH_CHUNK_GROUP:
                    # tile list too long for one device program (runtime
                    # watchdogs): host-driven sweeps, bounded dispatches
                    driver = "host-groups"
                    out, iters, swept = _sparse_fixpoint_host(
                        self._coords_dev, labels_dev, n_below, max_dist2,
                        ti, tj, self.row_block, self.col_block,
                        union_size, DISPATCH_CHUNK_GROUP)
                else:
                    out, iters, swept = _sparse_fixpoint(
                        self._coords_dev, labels_dev,
                        jnp.int32(n_below), jnp.float32(max_dist2),
                        jnp.asarray(ti), jnp.asarray(tj),
                        jnp.asarray(_first_occ_mask(ti, tj)),
                        row_block=self.row_block,
                        col_block=self.col_block,
                        union_size=union_size)
            # compute accounting: swept_tiles is the dirty-gated count of
            # tiles the kernel actually computed (measured, mirrors the
            # kernel's own skip condition); tiles_per_sweep x sweeps
            # remains as the upper bound for comparison. iters/swept stay
            # DEVICE scalars unless verbose: converting here would sync
            # on the fixpoint and stop the host from pipelining the next
            # series step's dispatches behind it (each sync is a full
            # remote round-trip on a tunneled TPU); consumers coerce
            # with int()/float() after their timed region.
            if is_verbose():
                iters = int(iters)
                swept = float(swept)
                logger(f"    [screening fixpoint: {iters} sweeps,"
                       f" {tiles_per_sweep} tiles/sweep,"
                       f" {swept:.0f} swept, {mode}, {plan_kind} plan,"
                       f" {driver}]")
            self.last_stats = {
                "sweeps": iters,
                "tiles_per_sweep": int(tiles_per_sweep),
                "swept_tiles": swept,
                "tile_pairs": self.row_block * self.col_block,
                "mode": mode,
                "plan": plan_kind,
                "driver": driver,
                # sub-stage walls: t_plan = host tile-list/partition
                # planning, t_dispatch = the fixpoint call's host wall
                # (device-program paths return asynchronously in ~25ms;
                # the host-driven group paths sync internally, so there
                # it is the real fixpoint wall). The device-done wait +
                # label download + normalize are measured by the series
                # postlude (ThresholdSeriesScreener._postlude) without
                # breaking the step pipeline.
                "t_plan": t_plan,
                "t_dispatch": time.perf_counter() - t_disp0,
            }
            return out
        if self.mesh is not None:
            from ..parallel import sharded
            from ..parallel.mesh import replicated
            return sharded._screening_sharded(
                replicated(self._padded_host, self.mesh), labels_dev,
                jnp.int32(n_below), jnp.float32(max_dist2), self.mesh,
                row_block=self.row_block, col_block=self.col_block)
        out, _ = _screening_fixpoint(
            self._coords_dev, labels_dev, jnp.int32(n_below),
            jnp.float32(max_dist2),
            row_block=self.row_block, col_block=self.col_block)
        return out

    def run(self, initial_labels, n_below, max_dist2, row_lo=0):
        """``row_lo`` > 0 marks a threshold-series continuation: the first
        row_lo FE-sorted frames are known to carry a completed fixpoint at
        the same max_dist2, so sweeps can restrict to edges incident to
        the new frames."""
        labels = np.asarray(initial_labels, dtype=np.int32)
        if self.n_pad != self.n:
            labels = np.concatenate(
                [labels, np.arange(self.n, self.n_pad, dtype=np.int32)])
        out = self.run_device(self._upload(labels), n_below, max_dist2,
                              row_lo=row_lo)
        return self._fetch(out)[:self.n]

    # bidirectional sweeps hold the whole union's column accumulator in
    # VMEM scratch; the kernel raises XLA's conservative 16MB scoped
    # limit, and v5e accepts >=120MB scratch (measured). Cap at 64MB /
    # 16M frames, leaving ample room for the pipeline's blocks.
    # VMEM budget for the bidirectional sweep's column accumulator;
    # larger unions split into column-range partitions (no union-size
    # cap -- the round-2 fallback to symmetric sweeps at >16M below-
    # threshold frames is gone). Tests shrink this to force partitioning.
    BIDIR_UNION_VMEM = 64 << 20

    def _bidir_ok(self, union_size):
        """Upper-triangular bidirectional sweeps need the compiled TPU
        lowering's lane dim (col_block) to be a multiple of 128; any
        union size is served (partitioned when past the VMEM budget);
        a non-positive budget disables bidir entirely (test hook, same
        convention as the engine's *_SCRATCH_CAP attributes)."""
        del union_size
        if self.BIDIR_UNION_VMEM <= 0:
            return False
        from .pallas_kernels import INTERPRET_MODE
        if not INTERPRET_MODE() and self.col_block % 128 != 0:
            return False
        return True

    def _bidir_partitions(self, ti, tj, union_size):
        """Column-range partitions of a stacked upper-triangular tile
        list: one full-range partition when the union's accumulator fits
        the VMEM budget, else tj-range slices each owning a window of
        the union (every real tile lands in the partition holding its
        tj; min-label sweeps are schedule-invariant, so per-partition
        sweeping reaches the identical fixpoint)."""
        from .pallas_kernels import _chunk_flat
        nub = union_size // self.col_block
        ncb = self.n_pad // self.col_block
        span_cap = max(int(self.BIDIR_UNION_VMEM // (self.col_block * 4)),
                       1)
        if nub <= span_cap:
            # span pinned to min(cap, ncb), matching the device planner:
            # one sweep-kernel col_span across every step of a series
            # (union-sized spans compiled one kernel per union width)
            parts = ((jnp.asarray(ti), jnp.asarray(tj),
                      jnp.asarray(_first_occ_mask(ti, tj))),)
            return parts, ((0, min(span_cap, ncb)),)
        ti_f = np.asarray(ti, dtype=np.int32).reshape(-1)
        tj_f = np.asarray(tj, dtype=np.int32).reshape(-1)
        keep = np.ones(len(ti_f), dtype=bool)
        keep[1:] = (ti_f[1:] != ti_f[:-1]) | (tj_f[1:] != tj_f[:-1])
        ti_f, tj_f = ti_f[keep], tj_f[keep]
        parts, windows = [], []
        for base in range(0, nub, span_cap):
            span = min(span_cap, nub - base)
            sel = (tj_f >= base) & (tj_f < base + span)
            if not sel.any():
                continue
            ti_p, tj_p = _chunk_flat(ti_f[sel], tj_f[sel])
            parts.append((jnp.asarray(ti_p), jnp.asarray(tj_p),
                          jnp.asarray(_first_occ_mask(ti_p, tj_p))))
            windows.append((base, span))
        return tuple(parts), tuple(windows)

    def _union_size(self, n_below):
        """Union prefix: power-of-two col-block count >= n_below keeps the
        scatter/gather arrays small at low thresholds while bounding
        compile variety."""
        nub = 1 << int(np.ceil(np.log2(
            max(-(-n_below // self.col_block), 1))))
        return min(nub * self.col_block, self.n_pad)

    def _upload(self, labels):
        """Host labels -> device, replicated over the mesh when present
        (multi-process safe)."""
        if self.mesh is not None:
            from ..parallel.mesh import replicated
            return replicated(np.asarray(labels), self.mesh)
        return jnp.asarray(labels)

    def _fetch(self, labels_dev):
        if self.mesh is not None:
            from ..parallel.mesh import fetch
            return fetch(labels_dev)
        return np.asarray(jax.device_get(labels_dev))

    def _split_tiles_per_device(self, ti, tj):
        """Balance the global tile chunks round-robin over devices (the
        mesh sweep merges proposals with a pmin, so any device may sweep
        any tile; min-label sweeps are idempotent, so repeat-padding is
        safe). Keeps GLOBAL row-block indices."""
        from . import pruning
        ti_dev, tj_dev, _ = pruning.split_tiles_balanced(
            ti, tj, self._n_dev, pad_mode="repeat")
        return ti_dev, tj_dev


@jax.jit
def _seed_update(labels, seeds, lo):
    """Write hd-edge seed labels into the device-resident vector at
    dynamic offset ``lo`` (one fused dispatch)."""
    return jax.lax.dynamic_update_slice(labels, seeds, (lo,))


@functools.partial(jax.jit, static_argnames=("fetch_len", "nbytes"))
def _labels_prefix_packed(labels_dev, fetch_len, nbytes):
    """Admitted-prefix label download, narrowed by VALUE range: every
    label in [:fetch_len] is a component min-position (or identity pad)
    < fetch_len, so the int32 vector packs loss-lessly into ``nbytes``
    uint8 byte planes (2 when fetch_len <= 2^16, 3 <= 2^24) -- half /
    three-quarters the postlude's label transfer. Returns (nbytes,
    fetch_len) uint8; the host ORs the planes back."""
    lab = labels_dev[:fetch_len]
    return jnp.stack([(lab >> (8 * b)) & 0xFF
                      for b in range(nbytes)]).astype(jnp.uint8)


class ThresholdSeriesScreener:
    """Screening runner specialized for a known -T threshold series.

    Frames are laid out in (threshold-band, Morton) order: the prefix below
    every series threshold stays contiguous (band k == frames first
    admitted at threshold t_k, bit-exact with the fe <= t comparison), while
    Morton ordering inside each band keeps tile bounding boxes spatially
    tight -- so the bbox pruning that makes the pops kernel fast applies to
    the screening sweeps as well (FE order scatters frames across basins
    and defeats it). Cluster naming still follows the reference exactly:
    components are ranked by their minimal FE-sorted frame rank
    (reference: density_clustering.cpp:437-456 over FE order).
    """

    def __init__(self, coords, free_energy, thresholds,
                 row_block=DEFAULT_ROW_BLOCK, col_block=DEFAULT_COL_BLOCK,
                 backend="auto", mesh=None, hd_neighbors=None):
        from . import pruning
        coords = np.asarray(coords, dtype=np.float32)
        fe = np.asarray(free_energy, dtype=np.float32)
        self.thresholds = [np.float32(t) for t in thresholds]
        if any(a >= b for a, b in zip(self.thresholds,
                                      self.thresholds[1:])):
            # the band layout (searchsorted below) silently miscounts on
            # unsorted or duplicate thresholds
            raise ValueError("thresholds must be strictly ascending, got "
                             f"{[float(t) for t in self.thresholds]}")
        n = len(fe)
        # band k = first series threshold at or above this frame's fe
        band = np.searchsorted(self.thresholds, fe, side="left")
        morton = np.argsort(pruning.morton_order(coords), kind="stable")
        # order: by band, then morton rank (stable)
        self.order = np.lexsort((morton, band))
        self.n_below_per_band = np.cumsum(
            np.bincount(band, minlength=len(self.thresholds) + 1)
        )[:len(self.thresholds)]
        # FE-sorted rank of every frame (for reference-order naming)
        fe_order = np.argsort(fe, kind="stable")
        self.fe_rank = np.empty(n, dtype=np.int64)
        self.fe_rank[fe_order] = np.arange(n)
        # series positions listed in FE-ascending frame order: the prefix
        # filter (< nb) walks any step's admitted frames by FE rank, so
        # per-component min ranks fall out of one unique(return_index)
        self._series_rank = np.empty(n, dtype=np.int64)
        self._series_rank[self.order] = np.arange(n)
        self._fe_asc_pos = self._series_rank[fe_order]
        self.engine = ScreeningEngine(coords[self.order],
                                      row_block=row_block,
                                      col_block=col_block, backend=backend,
                                      mesh=mesh)
        self.n = n
        self._prev_nb = 0
        self._labels_dev = None
        self._last_out = None
        self._last_future = None
        # hd_neighbors = (hd_idx, hd_dist2) per original frame from the NN
        # stage: a frame's nearest-higher-density edge below 4*sigma^2 is a
        # genuine screening-graph edge whose endpoint is always admitted
        # first (strictly lower fe), so newly-admitted frames can seed
        # their labels with it -- components are unchanged, the fixpoint
        # just starts mostly converged (the insight behind the reference
        # CPU path's lump_initial_clusters, density_clustering.cpp:506).
        self._hd_pos = None
        # per-step engine stats dicts of the current series run (the
        # postlude worker fills in t_wait/t_fetch/t_norm as each step
        # drains); bench.py aggregates them into the screening stage's
        # sub-stage breakdown
        self.per_step_stats = []
        if hd_neighbors is not None:
            self.set_hd_neighbors(hd_neighbors)

    def set_hd_neighbors(self, hd_neighbors):
        """Attach the NN stage's nearest-higher-density edges after
        construction. Everything else in ``__init__`` depends only on
        (coords, fe, thresholds), so the CLI builds the screener on a
        worker thread WHILE the NN stage runs on device and attaches
        the hd edges here once they exist."""
        hd_j = np.asarray(hd_neighbors[0], dtype=np.int64)
        hd_d = np.asarray(hd_neighbors[1], dtype=np.float32)
        self._hd_pos = (self._series_rank[hd_j[self.order]]
                        .astype(np.int32))
        self._hd_d = hd_d[self.order]

    def precompile(self, max_dist2, compile_only=False):
        """Best-effort warm of every step's fixpoint program.

        Each step's tile-list shapes, union size and partition windows
        are fully determined by (fe, thresholds, max_dist2) -- all known
        at construction -- so a daemon thread can compile the per-step
        while_loop programs concurrently ahead of the steps (the remote
        TPU compiler parallelizes across threads; each distinct program
        otherwise costs ~3-5s on the cold CLI path). The warm call runs
        the real fixpoint from identity labels and discards the result;
        device time is the step's own (dirty-gated) sweep cost. Shared
        plan caches are guarded by the engine's plan lock.

        ``compile_only`` warms through jit.lower().compile() instead of
        executing -- zero device time, so the CLI can run this DURING
        the NN stage with an ESTIMATED max_dist2 (the band phase's nh
        bound mean, within ~1% of the real sigma2): the fixpoint
        programs are keyed on quantized shapes, not the threshold value,
        so a near-miss estimate still hits the same compiled programs
        when the real steps run. Never raises."""
        try:
            from .pallas_kernels import DISPATCH_CHUNK_GROUP
            eng = self.engine
            if eng.backend != "pallas" or eng.mesh is not None:
                return
            prev = 0
            warmed = set()
            for k in range(len(self.thresholds)):
                nb = int(self.n_below_per_band[k])
                row_lo, prev = prev, nb
                if nb <= row_lo:
                    continue
                union = eng._union_size(nb)
                fetch_len = min(union, eng.n_pad)
                nbytes = (2 if fetch_len <= (1 << 16)
                          else 3 if fetch_len <= (1 << 24) else 4)
                ident = jnp.arange(eng.n_pad, dtype=jnp.int32)
                if nbytes == 4:
                    # the postlude's plain prefix-slice program
                    ident[:fetch_len]
                elif compile_only:
                    _labels_prefix_packed.lower(ident, fetch_len,
                                                nbytes).compile()
                else:
                    _labels_prefix_packed(ident, fetch_len, nbytes)
                if not eng._bidir_ok(union):
                    continue
                if eng._device_plan_on():
                    self._precompile_device_step(eng, row_lo, nb,
                                                 max_dist2, union, warmed,
                                                 compile_only=compile_only)
                    continue
                tiles = eng._tile_list(row_lo, nb, max_dist2,
                                       triangular=True)
                if tiles is None or tiles[0].shape[0] > DISPATCH_CHUNK_GROUP:
                    continue
                parts, windows = eng._bidir_partitions(tiles[0], tiles[1],
                                                       union)
                args = (eng._coords_dev,
                        jnp.arange(eng.n_pad, dtype=jnp.int32),
                        jnp.int32(nb), jnp.float32(max_dist2), parts)
                kw = dict(row_block=eng.row_block, col_block=eng.col_block,
                          union_size=union, windows=windows)
                if compile_only:
                    _sparse_fixpoint_bidir.lower(*args, **kw).compile()
                else:
                    _sparse_fixpoint_bidir(*args, **kw)
        except Exception:  # warm miss only delays a compile
            pass

    @staticmethod
    def _precompile_device_step(eng, row_lo, nb, max_dist2, union,
                                warmed, compile_only=False):
        """Warm one device-planned step: the planning programs run for
        real (and their window plans land in the engine's shared
        WIN_CACHE for the actual step); the small-list path warms by
        running its fixpoint from identity labels, the host-groups path
        warms each distinct group program with ALL-CLEAN dirty flags
        (the kernel skips every tile, so the device cost is ~zero --
        the engine's device-plan precompile uses the same trick).
        ``compile_only`` swaps every execution for lower().compile()."""
        from .pallas_kernels import DISPATCH_CHUNK_GROUP
        win_parts = eng._bidir_windows(row_lo, nb, max_dist2, union)
        if win_parts is None:
            return
        n_chunks_total = sum(p[2].shape[0] for p in win_parts)
        if n_chunks_total <= DISPATCH_CHUNK_GROUP:
            parts = tuple((ti_p, tj_p, fo_p)
                          for _, _, ti_p, tj_p, fo_p in win_parts)
            windows = tuple((base, span)
                            for base, span, *_ in win_parts)
            args = (eng._coords_dev,
                    jnp.arange(eng.n_pad, dtype=jnp.int32),
                    jnp.int32(nb), jnp.float32(max_dist2), parts)
            kw = dict(row_block=eng.row_block, col_block=eng.col_block,
                      union_size=union, windows=windows)
            if compile_only:
                _sparse_fixpoint_bidir.lower(*args, **kw).compile()
            else:
                _sparse_fixpoint_bidir(*args, **kw)
            return
        ncb = eng.n_pad // eng.col_block
        nrb = eng.n_pad // eng.row_block
        zc = jnp.zeros((ncb,), jnp.int32)
        zr = jnp.zeros((nrb,), jnp.int32)
        lab = jnp.arange(eng.n_pad, dtype=jnp.int32)
        for base, span, gs in _group_win_parts(win_parts,
                                               DISPATCH_CHUNK_GROUP):
            for ti_g, tj_g, fo_g in gs:
                key = (ti_g.shape, span, union)
                if key in warmed:
                    continue
                warmed.add(key)
                args = (eng._coords_dev, lab, jnp.int32(nb),
                        jnp.float32(max_dist2), ti_g, tj_g, zc, zr, base)
                kw = dict(span=span, union_size=union,
                          row_block=eng.row_block,
                          col_block=eng.col_block)
                if compile_only:
                    _sweep_group_bidir.lower(*args, **kw).compile()
                else:
                    _swept_count_bidir(fo_g, ti_g, tj_g, zc, zr)
                    lab = _sweep_group_bidir(*args, **kw)
        if ("union", union) not in warmed:
            warmed.add(("union", union))
            if compile_only:
                _union_step_bidir.lower(
                    lab, lab, union_size=union, col_block=eng.col_block,
                    row_block=eng.row_block).compile()
            else:
                _union_step_bidir(lab, lab, union_size=union,
                                  col_block=eng.col_block,
                                  row_block=eng.row_block)

    def _seed_vals(self, lo, hi, max_dist2):
        """Label seeds for newly-admitted positions [lo, hi): the frame's
        nearest-higher-density edge when it lies below the linking
        distance, else identity. None when hd data is unavailable."""
        if self._hd_pos is None or hi <= lo:
            return None
        hdd = self._hd_d[lo:hi]
        ok = (hdd > 0.0) & (hdd < np.float32(max_dist2))
        return np.where(ok, self._hd_pos[lo:hi],
                        np.arange(lo, hi, dtype=np.int32))

    def step(self, prev_clustering, k, max_dist2):
        """Run series threshold index ``k``; returns the normalized
        clustered trajectory in original frame order.

        When ``prev_clustering`` is the array returned by the previous
        ``step`` call, the seed labels are taken directly from the
        device-resident fixpoint (no host round-trip); any other seed goes
        through the generic host path.
        """
        n = self.n
        nb = int(self.n_below_per_band[k])
        continuing = (prev_clustering is not None
                      and prev_clustering is self._last_out
                      and self._labels_dev is not None)
        if continuing:
            labels_dev, prev_last = self._continuation_seed(nb, max_dist2)
        elif prev_clustering is None:
            labels_dev, prev_last = self._cold_seed(nb, max_dist2)
        else:
            # generic host seed path (arbitrary previous clustering):
            # rebuild first-occurrence pointers from the state names.
            # Unlike a series continuation, an arbitrary seed is NOT known
            # to be a completed fixpoint at this max_dist2, so the sweep
            # must cover all tile pairs (row_lo=0) and may not early-out --
            # old-old edges the seed missed can still merge components.
            prev = np.asarray(prev_clustering, dtype=np.int64)
            ps = prev[self.order]
            ps[nb:] = 0
            zeros = np.flatnonzero(ps == 0)
            prev_last = int(zeros[0]) if len(zeros) else n
            labels0 = np.arange(self.engine.n_pad, dtype=np.int64)
            prefix = ps[:nb]
            seeded = prefix != 0
            if seeded.any():
                vals, first_idx = np.unique(prefix[seeded],
                                            return_index=True)
                seeded_pos = np.flatnonzero(seeded)
                first_occ = seeded_pos[first_idx]
                labels0[seeded_pos] = first_occ[
                    np.searchsorted(vals, prefix[seeded])]
            seeds = self._seed_vals(prev_last, nb, max_dist2)
            if seeds is not None:
                # only positions the previous clustering left unassigned
                # (identity labels) take the hd-edge seed
                seg = labels0[prev_last:nb]
                unassigned = seg == np.arange(prev_last, nb)
                seg[unassigned] = seeds[unassigned]
            labels_dev = self.engine._upload(labels0.astype(np.int32))
            prev_last = 0  # full sweep; seed labels are equivalences only
        if prev_last >= nb:
            # nothing new below this threshold: keep the previous result
            # (reference early-out, density_clustering_cuda.cu:459-463;
            # valid only for series continuations / cold starts, where the
            # prefix is a completed fixpoint at this max_dist2)
            out = (np.zeros(n, dtype=np.int64) if prev_clustering is None
                   else np.asarray(prev_clustering, dtype=np.int64).copy())
            self._last_out = out
            return out
        t0 = time.perf_counter()
        self.engine.last_stats = {}
        labels_dev = self.engine.run_device(labels_dev, nb, max_dist2,
                                            row_lo=prev_last)
        prefetch = self._prefetch_labels(labels_dev, nb)
        self._labels_dev = labels_dev
        self._prev_nb = nb
        st = self.engine.last_stats
        st = st if "sweeps" in st else None
        if st is not None:
            st["threshold_index"] = k
            self.per_step_stats.append(st)
        clustering = self._postlude(labels_dev, nb,
                                    time.perf_counter() - t0, st,
                                    prefetch=prefetch)
        self._last_out = clustering
        return clustering

    def _continuation_seed(self, nb, max_dist2):
        """Seed the newly-admitted positions [prev_nb, nb) of the
        device-resident labels with their hd edges (one fused dispatch);
        returns (labels_dev, row_lo)."""
        prev_last = int(self._prev_nb)
        labels_dev = self._labels_dev
        seeds = self._seed_vals(prev_last, nb, max_dist2)
        if seeds is not None:
            # pad to a power of two with identity values (positions
            # beyond nb still hold identity labels) so a handful of
            # compiled update shapes serve the whole series
            lo, length = prev_last, nb - prev_last
            cap = 1 << int(np.ceil(np.log2(max(length, 1))))
            cap = min(cap, self.engine.n_pad - lo)
            if cap > length:
                seeds = np.concatenate(
                    [seeds, np.arange(lo + length, lo + cap,
                                      dtype=np.int32)])
            labels_dev = _seed_update(labels_dev, jnp.asarray(seeds),
                                      jnp.int32(lo))
        return labels_dev, prev_last

    def _cold_seed(self, nb, max_dist2):
        """Identity labels with hd-edge seeds on [0, nb); returns
        (labels_dev, row_lo=0)."""
        labels0 = np.arange(self.engine.n_pad, dtype=np.int32)
        seeds = self._seed_vals(0, nb, max_dist2)
        if seeds is not None:
            labels0[:nb] = seeds
        return self.engine._upload(labels0), 0

    def _prefetch_labels(self, labels_dev, nb):
        """Dispatch the postlude's label download RIGHT BEHIND the step's
        fixpoint on the device queue and start the D2H asynchronously.
        Dispatched from the postlude worker instead (round 4), the slice
        program landed AFTER the next steps' sweep dispatches, so every
        step's fetch serialized behind later steps' compute (measured
        t_fetch 0.13-0.2s/step at 2^20 even for tiny prefixes); enqueued
        here it streams while the next threshold sweeps. The transfer is
        narrowed by VALUE range (_labels_prefix_packed): labels in
        [:fetch_len] are min-positions < fetch_len, so 2 byte planes
        suffice below 2^16 admitted frames, 3 below 2^24, int32 beyond.
        Returns (packed_dev, nbytes) for _postlude, or None (mesh /
        non-pallas paths keep the in-postlude fetch;
        CLUSTERING_TPU_SCREEN_PREFETCH=0 forces the old path for paired
        A/Bs)."""
        if self.engine.backend != "pallas" or self.engine.mesh is not None:
            return None
        if os.environ.get("CLUSTERING_TPU_SCREEN_PREFETCH") == "0":
            return None
        fetch_len = min(self.engine._union_size(max(nb, 1)),
                        self.engine.n_pad)
        nbytes = (2 if fetch_len <= (1 << 16)
                  else 3 if fetch_len <= (1 << 24) else 4)
        if nbytes == 4:
            packed = labels_dev[:fetch_len]
        else:
            packed = _labels_prefix_packed(labels_dev, fetch_len, nbytes)
        try:
            packed.copy_to_host_async()
        except Exception:  # backends without async D2H: fetch later
            pass
        return packed, nbytes

    def _postlude(self, labels_dev, nb, t_fix, st=None, prefetch=None):
        """Fetch the fixpoint labels and normalize component names;
        returns the clustered trajectory in original frame order.

        ``st`` is the step's engine stats dict: coercing its lazy device
        ``sweeps`` scalar FIRST is a device-done barrier (a ~33ms scalar
        readback through the tunnel), splitting the step into kernel
        wait (t_wait) vs label download (t_fetch) vs host normalize
        (t_norm) -- measured on the postlude worker thread, so the
        series pipeline is unaffected (the waits overlap the next
        step's dispatches and can sum past the series wall)."""
        t1 = time.perf_counter()
        if st is not None and "sweeps" in st:
            st["sweeps"] = int(st["sweeps"])
            st["swept_tiles"] = float(st["swept_tiles"])
            st["t_wait"] = time.perf_counter() - t1
            t1 = time.perf_counter()
        # only labels[:nb] are consumed below: download just the admitted
        # prefix (quantized to the union-size ladder so a handful of
        # compiled slice programs serve the whole series) -- the full
        # (N_pad,) fetch cost 64MB per step at 16M frames even for
        # near-empty early thresholds. The series drivers pre-dispatch
        # the narrowed prefix (_prefetch_labels); arbitrary-seed and
        # mesh paths fetch here.
        if prefetch is not None:
            packed, nbytes = prefetch
            got = np.asarray(packed)
            if nbytes == 4:
                final = got
            else:
                final = got[0].astype(np.int32)
                for b in range(1, nbytes):
                    final |= got[b].astype(np.int32) << (8 * b)
        else:
            fetch_len = (self.engine._union_size(max(nb, 1))
                         if self.engine.mesh is None else self.engine.n_pad)
            if fetch_len < self.engine.n_pad:
                final = np.asarray(jax.device_get(labels_dev[:fetch_len]))
            else:
                final = self.engine._fetch(labels_dev)
        t2 = time.perf_counter()
        # normalize names by each component's minimal FE-sorted rank:
        # walk the admitted positions in FE-ascending order (precomputed
        # filter, no per-step sort of ranks); a component's FIRST
        # appearance in that walk is its min rank, so one
        # unique(return_index) replaces the np.minimum.at scatter-min
        # (buffered ufunc.at measured 0.7-4s at 1M frames in-situ)
        comp = final[:nb].astype(np.int64)
        fe_asc = self._fe_asc_pos[self._fe_asc_pos < nb]
        comp_vals, first_at = np.unique(comp[fe_asc], return_index=True)
        names = np.empty(len(comp_vals), dtype=np.int64)
        names[np.argsort(first_at, kind="stable")] = \
            np.arange(1, len(comp_vals) + 1)
        clustering = np.zeros(self.n, dtype=np.int64)
        clustering[self.order[:nb]] = names[np.searchsorted(comp_vals,
                                                            comp)]
        # sub-stage wall clocks (fetch/normalize split the host postlude)
        self.last_step_stats = {"t_fix": t_fix, "t_fetch": t2 - t1,
                                "t_norm": time.perf_counter() - t2}
        if st is not None and "sweeps" in st:
            st["t_fetch"] = t2 - t1
            st["t_norm"] = self.last_step_stats["t_norm"]
        return clustering

    def reset(self):
        """Forget all series state (device labels, pending postludes);
        the next step runs as a cold start. Lets one screener instance
        re-run its series (benchmark repetitions)."""
        self._prev_nb = 0
        self._labels_dev = None
        self._last_out = None
        self._last_future = None
        self.per_step_stats = []

    def step_submit(self, k, max_dist2, pool):
        """Series-order step with a deferred host postlude.

        Runs threshold index ``k``'s device fixpoint synchronously, hands
        the label download + FE-rank name normalization to ``pool``, and
        returns the Future of the normalized clustered trajectory (what
        ``step`` returns). Driving the series through this method
        overlaps every step's host postlude -- a full-length device
        fetch plus the component renaming, 0.1-0.3s each at 1M frames
        through a remote tunnel -- with the NEXT threshold's device
        sweeps: the continuation seed needs only the device-resident
        fixpoint labels, never the previous step's normalized output.

        Only valid when the whole series is driven in ascending order
        through this method from a fresh (or ``reset``) screener;
        ``step`` remains the synchronous / arbitrary-seed API. Results
        are bit-identical to ``step`` (tests/test_pallas_interpret.py
        pins the equality, including empty-band early-outs)."""
        import concurrent.futures
        nb = int(self.n_below_per_band[k])
        cold = self._labels_dev is None
        if cold:
            labels_dev, prev_last = self._cold_seed(nb, max_dist2)
        else:
            labels_dev, prev_last = self._continuation_seed(nb, max_dist2)
        if prev_last >= nb:
            # nothing new below this threshold (reference early-out,
            # density_clustering_cuda.cu:459-463): repeat the previous
            # step's output (zeros on a cold start). Chain on the
            # previous postlude without occupying a pool slot.
            prev_fut = self._last_future
            out = concurrent.futures.Future()
            if cold or prev_fut is None:
                out.set_result(np.zeros(self.n, dtype=np.int64))
            else:
                def _chain(f):
                    try:
                        out.set_result(f.result().copy())
                    except BaseException as exc:  # propagate, don't hang
                        out.set_exception(exc)
                prev_fut.add_done_callback(_chain)
            self._last_future = out
            return out
        t0 = time.perf_counter()
        self.engine.last_stats = {}
        labels_dev = self.engine.run_device(labels_dev, nb, max_dist2,
                                            row_lo=prev_last)
        prefetch = self._prefetch_labels(labels_dev, nb)
        self._labels_dev = labels_dev
        self._prev_nb = nb
        st = self.engine.last_stats
        st = st if "sweeps" in st else None
        if st is not None:
            st["threshold_index"] = k
            self.per_step_stats.append(st)
        fut = pool.submit(self._postlude, labels_dev, nb,
                          time.perf_counter() - t0, st,
                          prefetch=prefetch)
        self._last_future = fut
        return fut


def screening_labels(coords_sorted, initial_labels, n_below, max_dist2,
                     row_block=DEFAULT_ROW_BLOCK,
                     col_block=DEFAULT_COL_BLOCK, backend="auto"):
    """Host wrapper: pad, run the fixpoint, unpad.

    ``coords_sorted`` (N, D) must already be in FE-ascending order and
    ``initial_labels`` (N,) int32 frame pointers with labels[i] <= i.
    """
    engine = ScreeningEngine(coords_sorted, row_block=row_block,
                             col_block=col_block, backend=backend)
    return engine.run(initial_labels, n_below, max_dist2)
