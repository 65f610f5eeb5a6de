"""Multi-chip (mesh-sharded) density ops via shard_map.

Frame-axis SPMD decomposition of the O(N^2) kernels (see
clustering_tpu.parallel.mesh): every chip owns a contiguous row range of the
frame matrix, the (small, N x D) coordinate matrix is replicated so column
blocks stream from local HBM, and results merge with XLA collectives over
ICI:

  * populations / nearest neighbors: row-sharded compute, outputs sharded
    over the same axis (no merge needed beyond the output layout -- the
    TPU-native equivalent of the reference's host-side partial-result
    merges, src/density_clustering_cuda.cu:171-181, 311-327).
  * screening: the connected-component fixpoint keeps the label vector
    replicated; each sweep updates the local row range, an ``all_gather``
    over ICI exchanges the updated slices, and the scatter-min union +
    pointer jumping run replicated (the parallel analog of the reference's
    host merge, src/density_clustering_cuda.cu:501-572).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import density as dops
from ..ops import neighbors as nops
from ..ops import screening as sops
from .mesh import FRAME_AXIS, fetch, mesh_size, replicated

DEFAULT_ROW_BLOCK = 1024
DEFAULT_COL_BLOCK = 4096


def _pad_block(n, n_dev, row_block, col_block):
    """Padded N: divisible by (n_dev * row_block) and col_block."""
    return int(np.lcm(n_dev * row_block, col_block))


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block"))
def _pops_sharded(coords_padded, radii2, n_valid, mesh,
                  row_block=DEFAULT_ROW_BLOCK, col_block=DEFAULT_COL_BLOCK):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(FRAME_AXIS, None), P(None, None), P(None), P()),
        out_specs=P(None, None), check_vma=False)
    def run(rows_shard, coords_all, radii2, n_valid):
        part = dops.counts_row_range(rows_shard, coords_all, radii2,
                                     n_valid, row_block, col_block)
        # replicate so hosts of a multi-process (DCN) mesh can read the
        # result without a cross-host gather
        return jax.lax.all_gather(part, FRAME_AXIS, axis=1, tiled=True)

    return run(coords_padded, coords_padded, radii2, n_valid)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block"))
def _pops_sharded_sparse(coords_t_padded, radii2, n_valid, ti_dev, tj_dev,
                         rmask_dev, mesh, row_block=DEFAULT_ROW_BLOCK,
                         col_block=DEFAULT_COL_BLOCK):
    """Mesh-sharded fused Pallas pops over balanced per-device sparse
    tile lists (GLOBAL row/col indices; any device may count any tile).

    Each chip produces a full-length partial count vector (unvisited row
    blocks stay zero via the kernel's aliased init) and the exact total
    is one int32 ``psum`` over ICI -- the load-balanced analog of the
    reference's host-side partial sum (density_clustering_cuda.cu:171-181).
    ``rmask_dev`` carries the per-tile radius bitmask (bit r set = count
    radius r in this tile; 0 = pad, skip the tile body), same as the
    single-chip kernel."""
    from ..ops import pallas_kernels as pk

    n_pad = coords_t_padded.shape[1]
    n_radii = radii2.shape[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None), P(),
                  P(FRAME_AXIS, None, None), P(FRAME_AXIS, None, None),
                  P(FRAME_AXIS, None, None)),
        out_specs=P(None, None), check_vma=False)
    def run(ct, radii2, n_valid, ti_l, tj_l, rm_l):
        def body(acc, tt):
            ti_c, tj_c, rm_c = tt
            part = pk.pops_tiles_sparse(
                ct, radii2, n_valid, ti_c, tj_c, rmask=rm_c,
                row_block=row_block, col_block=col_block)
            return acc + part, None

        init = jnp.zeros((n_radii, n_pad), dtype=jnp.int32)
        acc, _ = jax.lax.scan(body, init, (ti_l[0], tj_l[0], rm_l[0]))
        return jax.lax.psum(acc, FRAME_AXIS)

    return run(coords_t_padded, radii2, n_valid, ti_dev, tj_dev, rmask_dev)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block"))
def _pops_sharded_bidir(coords_t_padded, radii2, n_valid, ti_dev, tj_dev,
                        rmask_dev, mesh, row_block=DEFAULT_ROW_BLOCK,
                        col_block=DEFAULT_COL_BLOCK):
    """Mesh-sharded bidirectional pops over balanced per-device
    upper-triangular-closure tile lists: each chip's partial already
    carries both sides of its tiles' strictly-upper pairs, the int32
    ``psum`` over ICI merges chips, and the diagonal +1 is added once
    after the reduction."""
    from ..ops import pallas_kernels as pk

    n_pad = coords_t_padded.shape[1]
    n_radii = radii2.shape[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None), P(),
                  P(FRAME_AXIS, None, None), P(FRAME_AXIS, None, None),
                  P(FRAME_AXIS, None, None)),
        out_specs=P(None, None), check_vma=False)
    def run(ct, radii2, n_valid, ti_l, tj_l, rm_l):
        def body(acc, tt):
            ti_c, tj_c, rm_c = tt
            part = pk.pops_tiles_sparse_bidir(
                ct, radii2, n_valid, ti_c, tj_c, rm_c,
                row_block=row_block, col_block=col_block)
            return acc + part, None

        init = jnp.zeros((n_radii, n_pad), dtype=jnp.int32)
        acc, _ = jax.lax.scan(body, init, (ti_l[0], tj_l[0], rm_l[0]))
        total = jax.lax.psum(acc, FRAME_AXIS)
        self_cnt = (jnp.arange(n_pad, dtype=jnp.int32)
                    < n_valid)[None, :].astype(jnp.int32)
        return total + self_cnt

    return run(coords_t_padded, radii2, n_valid, ti_dev, tj_dev, rmask_dev)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block",
                                    "col_span"))
def _pops_sharded_bidir_window(coords_t_padded, radii2, n_valid, ti_dev,
                               tj_dev, rmask_dev, col_base, mesh,
                               row_block=DEFAULT_ROW_BLOCK,
                               col_block=DEFAULT_COL_BLOCK, col_span=1):
    """One column-range partition of the mesh bidirectional pops sweep:
    every chip's VMEM column accumulator covers only column blocks
    [col_base, col_base + col_span), so the per-chip scratch is bounded
    regardless of frame count (the mesh analog of
    pops_tiles_bidir_all's partitioning). The per-device tile lists must
    only hold tiles with tj in the window (plus (ti, -1, 0) no-op pads).
    Returns psum-merged (rows (R, N_pad), cols (R, span*col_block));
    the caller places the window and adds the diagonal once."""
    from ..ops import pallas_kernels as pk

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None), P(),
                  P(FRAME_AXIS, None, None), P(FRAME_AXIS, None, None),
                  P(FRAME_AXIS, None, None), P()),
        out_specs=(P(None, None), P(None, None)), check_vma=False)
    def run(ct, radii2, n_valid, ti_l, tj_l, rm_l, cb):
        rows, cols = pk._pops_bidir_group_part(
            ct, radii2, n_valid, ti_l[0], tj_l[0], rm_l[0], cb, col_span,
            row_block=row_block, col_block=col_block)
        return (jax.lax.psum(rows, FRAME_AXIS),
                jax.lax.psum(cols, FRAME_AXIS))

    return run(coords_t_padded, radii2, n_valid, ti_dev, tj_dev,
               rmask_dev, col_base)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block",
                                    "col_span"))
def _nn_sharded_bidir_window(coords_t_padded, fe_padded, oid_padded,
                             n_valid, ti_dev, tj_dev, col_base, mesh,
                             row_block=DEFAULT_ROW_BLOCK,
                             col_block=DEFAULT_COL_BLOCK, col_span=1):
    """One column-range partition of the mesh bidirectional NN sweep
    (per-chip scratch bounded like _pops_sharded_bidir_window; pad tiles
    must repeat a tile INSIDE the window -- idempotent under min). Rows
    and the window's columns each merge with the two-step lexicographic
    pmin; the caller places the window and folds partitions."""
    from ..ops import pallas_kernels as pk

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(None, None), P(),
                  P(FRAME_AXIS, None, None), P(FRAME_AXIS, None, None),
                  P()),
        out_specs=(P(None, None), P(None, None),
                   P(None, None), P(None, None)),
        check_vma=False)
    def run(ct, fe_all, oid_all, n_valid, ti_l, tj_l, cb):
        od, oj, cd, cj = pk._nn_bidir_group_part(
            ct, fe_all, oid_all, n_valid, ti_l[0], tj_l[0], cb, col_span,
            row_block, col_block)

        def pmin_lex(d, j):
            d_min = jax.lax.pmin(d, FRAME_AXIS)
            j_cand = jnp.where(d == d_min, j, jnp.int32(2**31 - 1))
            return d_min, jax.lax.pmin(j_cand, FRAME_AXIS)

        od_m, oj_m = pmin_lex(od, oj)
        cd_m, cj_m = pmin_lex(cd, cj)
        return od_m, oj_m, cd_m, cj_m

    return run(coords_t_padded, fe_padded, oid_padded, n_valid,
               ti_dev, tj_dev, col_base)


def populations(coords, radii, mesh,
                row_block=DEFAULT_ROW_BLOCK, col_block=DEFAULT_COL_BLOCK,
                backend="xla", prune=True):
    """Mesh-sharded multi-radius populations; same semantics as
    clustering_tpu.ops.populations.

    backend='pallas' runs the fused pruned sparse-tile kernel per shard
    (TPU meshes); 'xla' the blockwise jnp kernel (also used for CPU-mesh
    testing).
    """
    coords = np.asarray(coords, dtype=np.float32)
    n = coords.shape[0]
    n_dev = mesh_size(mesh)
    block = _pad_block(n, n_dev, row_block, col_block)
    radii = list(radii)
    radii2 = jnp.asarray([np.float32(r) * np.float32(r) for r in radii],
                         dtype=jnp.float32)
    if backend == "pallas":
        from ..ops import pruning
        order = pruning.morton_order(coords)
        n_pad = -(-n // block) * block
        padded = np.zeros((n_pad, coords.shape[1]), dtype=np.float32)
        padded[:n] = coords[order]
        padded[n:] = np.float32(3e38)
        r_max2 = np.float32(max(radii)) * np.float32(max(radii))
        nrb, ncb = n_pad // row_block, n_pad // col_block
        if prune:
            rmin, rmax = pruning.block_bboxes(padded, row_block)
            cmin, cmax = pruning.block_bboxes(padded, col_block)
            active = pruning.bbox_dist2(rmin, rmax, cmin, cmax) <= r_max2
        else:
            active = np.ones((nrb, ncb), dtype=bool)
        from ..ops.pallas_kernels import INTERPRET_MODE
        bidir = (col_block % row_block == 0
                 and len(radii) * n_pad * 4 <= 64 << 20
                 and (INTERPRET_MODE() or col_block % 128 == 0))
        if bidir:
            active = pruning.bidir_closure(active, row_block, col_block)
        ti, tj = np.nonzero(active)
        ti_dev, tj_dev, _ = pruning.split_tiles_balanced(
            ti, tj, n_dev, pad_mode="noop")
        # pads (tj = -1) carry mask 0 and skip the whole tile body
        rmask_dev = np.where(tj_dev >= 0,
                             np.int32((1 << len(radii)) - 1),
                             np.int32(0))
        fn = _pops_sharded_bidir if bidir else _pops_sharded_sparse
        counts = fn(
            replicated(padded.T, mesh), radii2, jnp.int32(n),
            replicated(ti_dev, mesh), replicated(tj_dev, mesh),
            replicated(rmask_dev, mesh), mesh,
            row_block=row_block, col_block=col_block)
        counts = fetch(counts)[:, :n]
        unsorted = np.empty_like(counts)
        unsorted[:, order] = counts
        return {r: unsorted[i].astype(np.int64)
                for i, r in enumerate(radii)}
    n_pad = -(-n // block) * block
    padded_np = np.zeros((n_pad, coords.shape[1]), dtype=np.float32)
    padded_np[:n] = coords
    padded = replicated(padded_np, mesh)
    counts = _pops_sharded(padded, radii2, jnp.int32(n), mesh,
                           row_block=row_block, col_block=col_block)
    counts = fetch(counts)[:, :n].astype(np.int64)
    return {r: counts[i] for i, r in enumerate(radii)}


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block"))
def _nn_sharded_sparse(coords_t_padded, fe_padded, oid_padded, n_valid,
                       ti_dev, tj_dev, mesh,
                       row_block=DEFAULT_ROW_BLOCK,
                       col_block=DEFAULT_COL_BLOCK):
    """Mesh-sharded fused Pallas NN over balanced per-device sparse tile
    lists (GLOBAL indices). Per-chip full-length partials (unvisited rows
    stay +inf/IMAX) merge with an exact lexicographic (d, j) minimum over
    ICI: pmin on distances, then pmin on the indices that achieve them --
    the load-balanced analog of the reference's overwrite-merge
    (density_clustering_cuda.cu:311-327)."""
    from ..ops import pallas_kernels as pk

    n_pad = coords_t_padded.shape[1]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(None, None), P(),
                  P(FRAME_AXIS, None, None), P(FRAME_AXIS, None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False)
    def run(ct, fe_all, oid_all, n_valid, ti_l, tj_l):
        def body(acc, tt):
            ti_c, tj_c = tt
            d1, j1 = pk.nn_tiles_sparse(
                ct, fe_all, oid_all, n_valid, ti_c, tj_c,
                row_block=row_block, col_block=col_block)
            d0, j0 = acc
            upd = (d1 < d0) | ((d1 == d0) & (j1 < j0))
            return (jnp.where(upd, d1, d0), jnp.where(upd, j1, j0)), None

        init = (jnp.full((2, n_pad), jnp.inf, dtype=jnp.float32),
                jnp.full((2, n_pad), jnp.int32(2**31 - 1),
                         dtype=jnp.int32))
        (d_loc, j_loc), _ = jax.lax.scan(body, init, (ti_l[0], tj_l[0]))
        d_min = jax.lax.pmin(d_loc, FRAME_AXIS)
        j_cand = jnp.where(d_loc == d_min, j_loc, jnp.int32(2**31 - 1))
        j_min = jax.lax.pmin(j_cand, FRAME_AXIS)
        return d_min, j_min

    return run(coords_t_padded, fe_padded, oid_padded, n_valid,
               ti_dev, tj_dev)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block"))
def _nn_sharded_bidir(coords_t_padded, fe_padded, oid_padded, n_valid,
                      ti_dev, tj_dev, mesh,
                      row_block=DEFAULT_ROW_BLOCK,
                      col_block=DEFAULT_COL_BLOCK):
    """Mesh-sharded bidirectional NN over balanced per-device
    upper-triangular-closure tile lists: each chip's local result already
    folds both orientations of its tiles (nn_tiles_sparse_bidir), and the
    same two-step lexicographic pmin over ICI merges the chips.

    The outer jit is load-bearing: an un-jitted shard_map dispatches its
    body op-by-op, which on a remote-tunneled TPU costs a round-trip per
    op (measured 23.7s vs 0.6s for the whole N=2^18 stage -- found the
    first time this path ran on real hardware, mesh_check.py)."""
    from ..ops import pallas_kernels as pk

    n_pad = coords_t_padded.shape[1]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(None, None), P(),
                  P(FRAME_AXIS, None, None), P(FRAME_AXIS, None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False)
    def run(ct, fe_all, oid_all, n_valid, ti_l, tj_l):
        def body(acc, tt):
            ti_c, tj_c = tt
            d1, j1 = pk.nn_tiles_sparse_bidir(
                ct, fe_all, oid_all, n_valid, ti_c, tj_c,
                row_block=row_block, col_block=col_block)
            d0, j0 = acc
            upd = (d1 < d0) | ((d1 == d0) & (j1 < j0))
            return (jnp.where(upd, d1, d0), jnp.where(upd, j1, j0)), None

        init = (jnp.full((2, n_pad), jnp.inf, dtype=jnp.float32),
                jnp.full((2, n_pad), jnp.int32(2**31 - 1),
                         dtype=jnp.int32))
        (d_loc, j_loc), _ = jax.lax.scan(body, init, (ti_l[0], tj_l[0]))
        d_min = jax.lax.pmin(d_loc, FRAME_AXIS)
        j_cand = jnp.where(d_loc == d_min, j_loc, jnp.int32(2**31 - 1))
        j_min = jax.lax.pmin(j_cand, FRAME_AXIS)
        return d_min, j_min

    return run(coords_t_padded, fe_padded, oid_padded, n_valid,
               ti_dev, tj_dev)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block",
                                    "union_size"))
def _screening_sharded_pallas(coords_t, labels0, n_below, max_dist2,
                              ti_dev, tj_dev, mesh,
                              row_block=DEFAULT_ROW_BLOCK,
                              col_block=DEFAULT_COL_BLOCK,
                              union_size=None):
    """Mesh-sharded sparse-tile screening fixpoint over balanced per-device
    tile lists (GLOBAL indices; any chip may sweep any tile).

    Each sweep: per-chip Gauss-Seidel scan over its chunks, one int32
    ``pmin`` over ICI merges the proposals, then the scatter-min union +
    pointer jumping run replicated -- the parallel analog of the
    reference's host merge (src/density_clustering_cuda.cu:501-572).
    ``union_size`` (static, multiple of col_block, >= n_below) bounds the
    union to the prefix that can actually change, exactly as in the
    single-chip fixpoint (ops/screening.py::_sparse_fixpoint).
    """
    from ..ops import pallas_kernels as pk
    from ..ops.screening import union_rebase

    n_pad = coords_t.shape[1]
    ncb = n_pad // col_block
    if union_size is None:
        union_size = n_pad
    nub = union_size // col_block

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None), P(), P(),
                  P(FRAME_AXIS, None, None), P(FRAME_AXIS, None, None)),
        out_specs=P(None), check_vma=False)
    def run(ct, labels0, nb, md2, ti_l, tj_l):
        ti = ti_l[0]  # (n_chunks, bucket)
        tj = tj_l[0]

        def cond(state):
            return state[1]

        def body(state):
            labels_in, _, dirty = state

            def chunk_body(labels_cur, tt):
                ti_c, tj_c = tt
                mi = pk.label_min_sparse(
                    ct, labels_cur.reshape(1, -1), nb, md2,
                    ti_c, tj_c, dirty=dirty,
                    row_block=row_block, col_block=col_block)[0]
                # Gauss-Seidel across this chip's chunks
                return jnp.minimum(labels_cur, mi), None

            swept_loc, _ = jax.lax.scan(chunk_body, labels_in, (ti, tj))
            labels_cur = jax.lax.pmin(swept_loc, FRAME_AXIS)
            head_in = labels_in[:union_size]
            head_out = union_rebase(head_in, labels_cur[:union_size])
            changed = head_out != head_in
            labels_out = (head_out if union_size == n_pad else
                          jnp.concatenate([head_out,
                                           labels_in[union_size:]]))
            # clean column blocks can only re-propose known equivalences
            dirty_head = jnp.any(changed.reshape(nub, col_block),
                                 axis=1).astype(jnp.int32)
            dirty_next = (dirty_head if nub == ncb else
                          jnp.concatenate([dirty_head,
                                           jnp.zeros(ncb - nub,
                                                     jnp.int32)]))
            return (labels_out, jnp.any(changed), dirty_next)

        labels, _, _ = jax.lax.while_loop(
            cond, body, (labels0, jnp.bool_(True),
                         jnp.ones((ncb,), dtype=jnp.int32)))
        return labels

    return run(coords_t, labels0, n_below, max_dist2, ti_dev, tj_dev)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block",
                                    "union_size"))
def _screening_sharded_pallas_bidir(coords_t, labels0, n_below, max_dist2,
                                    ti_dev, tj_dev, mesh, row_block,
                                    col_block, union_size):
    """Mesh fixpoint over balanced per-device UPPER-TRIANGULAR tile lists
    with the bidirectional sweep kernel: each chip folds its tiles' row
    AND column proposals into its local label vector, one int32 ``pmin``
    over ICI merges all chips' proposals (both directions ride the same
    collective), then union + pointer jumping run replicated. Half the
    per-chip distance work of _screening_sharded_pallas; labels are
    identical (min propagation is schedule-independent at fixpoint)."""
    from ..ops import pallas_kernels as pk
    from ..ops.screening import union_rebase

    n_pad = coords_t.shape[1]
    ncb = n_pad // col_block
    nrb = n_pad // row_block
    nub = union_size // col_block
    nru = union_size // row_block

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None), P(), P(),
                  P(FRAME_AXIS, None, None), P(FRAME_AXIS, None, None)),
        out_specs=P(None), check_vma=False)
    def run(ct, labels0, nb, md2, ti_l, tj_l):
        ti = ti_l[0]  # (n_chunks, bucket)
        tj = tj_l[0]

        def cond(state):
            return state[1]

        def body(state):
            labels_in, _, dirty_col, dirty_row = state

            def chunk_body(labels_cur, tt):
                ti_c, tj_c = tt
                # per-tile dirty gate (kernel SMEM stays chunk-sized)
                dt_c = ((dirty_col[tj_c] != 0)
                        | (dirty_row[ti_c] != 0)).astype(jnp.int32)
                row_p, col_p = pk.label_min_sparse_bidir(
                    ct, labels_cur.reshape(1, -1), nb, md2, ti_c, tj_c,
                    dt_c, union_size,
                    row_block=row_block, col_block=col_block)
                lab = jnp.minimum(labels_cur, row_p[0])
                lab = jnp.concatenate(
                    [jnp.minimum(lab[:union_size], col_p[0]),
                     lab[union_size:]])
                return lab, None

            swept_loc, _ = jax.lax.scan(chunk_body, labels_in, (ti, tj))
            labels_cur = jax.lax.pmin(swept_loc, FRAME_AXIS)
            head_in = labels_in[:union_size]
            head_out = union_rebase(head_in, labels_cur[:union_size])
            changed = head_out != head_in
            labels_out = (head_out if union_size == n_pad else
                          jnp.concatenate([head_out,
                                           labels_in[union_size:]]))
            dc_head = jnp.any(changed.reshape(nub, col_block),
                              axis=1).astype(jnp.int32)
            dirty_col = (dc_head if nub == ncb else
                         jnp.concatenate([dc_head,
                                          jnp.zeros(ncb - nub,
                                                    jnp.int32)]))
            dr_head = jnp.any(changed.reshape(nru, row_block),
                              axis=1).astype(jnp.int32)
            dirty_row = (dr_head if nru == nrb else
                         jnp.concatenate([dr_head,
                                          jnp.zeros(nrb - nru,
                                                    jnp.int32)]))
            return (labels_out, jnp.any(changed), dirty_col, dirty_row)

        labels, _, _, _ = jax.lax.while_loop(
            cond, body, (labels0, jnp.bool_(True),
                         jnp.ones((ncb,), dtype=jnp.int32),
                         jnp.ones((nrb,), dtype=jnp.int32)))
        return labels

    return run(coords_t, labels0, n_below, max_dist2, ti_dev, tj_dev)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block"))
def _sweep_group_sharded(coords_t, labels, n_below, max_dist2,
                         ti_dev, tj_dev, dirty, mesh,
                         row_block=DEFAULT_ROW_BLOCK,
                         col_block=DEFAULT_COL_BLOCK):
    """One bounded group of mesh sweep chunks: per-chip Gauss-Seidel scan,
    pmin merge. Building block of the host-driven mesh fixpoint (the mesh
    analog of ops/screening.py::_sweep_group)."""
    from ..ops import pallas_kernels as pk

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None), P(), P(),
                  P(FRAME_AXIS, None, None), P(FRAME_AXIS, None, None),
                  P(None)),
        out_specs=P(None), check_vma=False)
    def run(ct, labels, nb, md2, ti_l, tj_l, dirty):
        def chunk_body(labels_cur, tt):
            ti_c, tj_c = tt
            mi = pk.label_min_sparse(
                ct, labels_cur.reshape(1, -1), nb, md2, ti_c, tj_c,
                dirty=dirty, row_block=row_block, col_block=col_block)[0]
            return jnp.minimum(labels_cur, mi), None

        swept, _ = jax.lax.scan(chunk_body, labels, (ti_l[0], tj_l[0]))
        return jax.lax.pmin(swept, FRAME_AXIS)

    return run(coords_t, labels, n_below, max_dist2, ti_dev, tj_dev, dirty)


def _sparse_fixpoint_host_mesh(coords_t, labels0, n_below, max_dist2,
                               ti_dev, tj_dev, mesh, row_block, col_block,
                               union_size, group):
    """Host-driven mesh fixpoint for tile lists too long for one device
    program (runtime watchdogs): each sweep is a series of bounded group
    dispatches over the mesh, convergence is one scalar readback per
    sweep. Mirrors ops/screening.py::_sparse_fixpoint_host."""
    from ..ops.screening import _union_step

    ti_dev = np.asarray(ti_dev, dtype=np.int32)
    tj_dev = np.asarray(tj_dev, dtype=np.int32)
    n_pad = coords_t.shape[1]
    ncb = n_pad // col_block
    nb = jnp.int32(n_below)
    md2 = jnp.float32(max_dist2)
    labels = labels0
    dirty = jnp.ones((ncb,), dtype=jnp.int32)
    n_chunks = ti_dev.shape[1]
    iters = 0
    while True:
        swept = labels
        for lo in range(0, n_chunks, group):
            ti_g = ti_dev[:, lo:lo + group]
            tj_g = tj_dev[:, lo:lo + group]
            if ti_g.shape[1] < group:
                pad = group - ti_g.shape[1]
                ti_g = np.concatenate(
                    [ti_g, np.repeat(ti_g[:, -1:], pad, axis=1)], axis=1)
                tj_g = np.concatenate(
                    [tj_g, np.repeat(tj_g[:, -1:], pad, axis=1)], axis=1)
            swept = _sweep_group_sharded(
                coords_t, swept, nb, md2, jnp.asarray(ti_g),
                jnp.asarray(tj_g), dirty, mesh,
                row_block=row_block, col_block=col_block)
        labels, changed, dirty = _union_step(labels, swept,
                                             union_size=union_size,
                                             col_block=col_block)
        iters += 1
        if not bool(changed):
            break
    return labels, iters


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block"))
def _nn_sharded(coords_padded, fe_padded, n_valid, mesh,
                row_block=DEFAULT_ROW_BLOCK, col_block=DEFAULT_COL_BLOCK):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(FRAME_AXIS, None), P(FRAME_AXIS), P(None, None),
                  P(None), P()),
        out_specs=(P(None), P(None), P(None), P(None)), check_vma=False)
    def run(rows_shard, fe_shard, coords_all, fe_all, n_valid):
        parts = nops.nn_row_range(rows_shard, fe_shard, coords_all, fe_all,
                                  n_valid, row_block, col_block)
        return tuple(jax.lax.all_gather(p, FRAME_AXIS, tiled=True)
                     for p in parts)

    return run(coords_padded, fe_padded, coords_padded, fe_padded, n_valid)


def nearest_neighbors(coords, free_energy, mesh,
                      row_block=DEFAULT_ROW_BLOCK,
                      col_block=DEFAULT_COL_BLOCK,
                      backend="xla", prune=True, band_blocks=4):
    """Mesh-sharded joint NN / NN-higher-density search; same semantics as
    clustering_tpu.ops.nearest_neighbors. backend='pallas' uses the fused
    pruned tile kernel per shard (Morton layout, banded bounding pass)."""
    if backend == "pallas":
        return _nearest_neighbors_pallas_mesh(coords, free_energy, mesh,
                                              row_block, col_block,
                                              prune, band_blocks)
    coords = np.asarray(coords, dtype=np.float32)
    fe = np.asarray(free_energy, dtype=np.float32)
    n = coords.shape[0]
    block = _pad_block(n, mesh_size(mesh), row_block, col_block)
    n_pad = -(-n // block) * block
    padded_np = np.zeros((n_pad, coords.shape[1]), dtype=np.float32)
    padded_np[:n] = coords
    fe_np = np.full(n_pad, np.inf, dtype=np.float32)
    fe_np[:n] = fe
    nh_d, nh_j, hd_d, hd_j = _nn_sharded(replicated(padded_np, mesh),
                                         replicated(fe_np, mesh),
                                         jnp.int32(n),
                                         mesh, row_block=row_block,
                                         col_block=col_block)
    nh_d, nh_j, hd_d, hd_j = fetch((nh_d, nh_j, hd_d, hd_j))
    nh_d = nh_d[:n]
    nh_j = nh_j[:n].astype(np.int64)
    hd_d = hd_d[:n]
    hd_j = hd_j[:n].astype(np.int64)
    no_nh = ~np.isfinite(nh_d)
    nh_d[no_nh] = 0.0
    nh_j[no_nh] = 0
    no_hd = ~np.isfinite(hd_d)
    hd_d[no_hd] = 0.0
    hd_j[no_hd] = 0
    return nh_j, nh_d.astype(np.float32), hd_j, hd_d.astype(np.float32)


def _nearest_neighbors_pallas_mesh(coords, free_energy, mesh, row_block,
                                   col_block, prune, band_blocks):
    from ..ops import pruning

    coords = np.asarray(coords, dtype=np.float32)
    fe = np.asarray(free_energy, dtype=np.float32)
    n = coords.shape[0]
    n_dev = mesh_size(mesh)
    block = _pad_block(n, n_dev, row_block, col_block)
    n_pad = -(-n // block) * block
    order = pruning.morton_order(coords)
    padded = np.zeros((n_pad, coords.shape[1]), dtype=np.float32)
    padded[:n] = coords[order]
    padded[n:] = np.float32(3e38)
    fe_padded = np.full(n_pad, np.inf, dtype=np.float32)
    fe_padded[:n] = fe[order]
    oid = np.full(n_pad, np.iinfo(np.int32).max, dtype=np.int32)
    oid[:n] = order
    ct = replicated(padded.T, mesh)
    fe_dev = replicated(fe_padded.reshape(1, n_pad), mesh)
    oid_dev = replicated(oid.reshape(1, n_pad), mesh)
    nrb, ncb = n_pad // row_block, n_pad // col_block

    from ..ops.pallas_kernels import INTERPRET_MODE
    bidir = (col_block % row_block == 0
             and 4 * n_pad * 4 <= 64 << 20
             and (INTERPRET_MODE() or col_block % 128 == 0))

    def run(active):
        if bidir:
            active = pruning.bidir_closure(active, row_block, col_block)
        ti, tj = np.nonzero(active)
        ti_dev, tj_dev, _ = pruning.split_tiles_balanced(
            ti, tj, n_dev, pad_mode="repeat")
        fn = _nn_sharded_bidir if bidir else _nn_sharded_sparse
        return fn(ct, fe_dev, oid_dev, jnp.int32(n),
                  replicated(ti_dev, mesh),
                  replicated(tj_dev, mesh), mesh,
                  row_block=row_block, col_block=col_block)

    if prune and ncb > 2 * band_blocks:
        out1 = run(pruning.band_mask(nrb, ncb, row_block, col_block,
                                     band_blocks * col_block))
        out1_d = fetch(out1[0])
        row_ub = np.maximum(out1_d[0], out1_d[1]).reshape(
            nrb, row_block).max(axis=1)
        rmin, rmax = pruning.block_bboxes(padded, row_block)
        cmin, cmax = pruning.block_bboxes(padded, col_block)
        active = pruning.bbox_dist2(rmin, rmax, cmin, cmax) \
            <= row_ub[:, None]
    else:
        active = np.ones((nrb, ncb), dtype=bool)
    out = run(active)
    out_d, out_j = fetch((out[0], out[1]))
    nh_d, hd_d = out_d[0, :n], out_d[1, :n]
    nh_j = out_j[0, :n].astype(np.int64)
    hd_j = out_j[1, :n].astype(np.int64)
    inv = np.empty_like(order)
    inv[order] = np.arange(n)
    nh_d, nh_j = nh_d[inv], nh_j[inv]
    hd_d, hd_j = hd_d[inv], hd_j[inv]
    no_nh = ~np.isfinite(nh_d)
    nh_d[no_nh] = 0.0
    nh_j[no_nh] = 0
    no_hd = ~np.isfinite(hd_d)
    hd_d[no_hd] = 0.0
    hd_j[no_hd] = 0
    return nh_j, nh_d.astype(np.float32), hd_j, hd_d.astype(np.float32)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block"))
def _screening_sharded(coords_sorted, labels0, n_below, max_dist2, mesh,
                       row_block=DEFAULT_ROW_BLOCK,
                       col_block=DEFAULT_COL_BLOCK):
    n_pad = coords_sorted.shape[0]
    n_dev = mesh_size(mesh)
    n_local = n_pad // n_dev

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None), P(), P()),
        out_specs=P(None), check_vma=False)
    def run(coords_all, labels0, n_below, max_dist2):
        offset = jax.lax.axis_index(FRAME_AXIS).astype(jnp.int32) * n_local

        def outer_cond(state):
            _, changed = state
            return changed

        def outer_body(state):
            labels_in, _ = state
            labels_cur = sops.sweep_row_range(
                coords_all, labels_in, offset, n_local, n_below, max_dist2,
                row_block, col_block)
            local = jax.lax.dynamic_slice_in_dim(labels_cur, offset,
                                                 n_local, axis=0)
            full = jax.lax.all_gather(local, FRAME_AXIS, tiled=True)
            labels_out = sops.union_rebase(labels_in, full)
            return (labels_out, jnp.any(labels_out != labels_in))

        labels, _ = jax.lax.while_loop(outer_cond, outer_body,
                                       (labels0, jnp.bool_(True)))
        return labels

    return run(coords_sorted, labels0, n_below, max_dist2)


def screening_labels(coords_sorted, initial_labels, n_below, max_dist2,
                     mesh, row_block=DEFAULT_ROW_BLOCK,
                     col_block=DEFAULT_COL_BLOCK, backend="xla"):
    """Mesh-sharded screening fixpoint; same semantics as
    clustering_tpu.ops.screening_labels. backend='pallas' distributes
    sparse active-tile sweeps over the mesh."""
    coords_sorted = np.asarray(coords_sorted, dtype=np.float32)
    n = coords_sorted.shape[0]
    n_dev = mesh_size(mesh)
    block = _pad_block(n, n_dev, row_block, col_block)
    n_pad = -(-n // block) * block
    labels = np.asarray(initial_labels, dtype=np.int32)
    if n_pad != n:
        labels = np.concatenate(
            [labels, np.arange(n, n_pad, dtype=np.int32)])
    if backend == "pallas":
        from ..ops import pruning
        padded = np.zeros((n_pad, coords_sorted.shape[1]),
                          dtype=np.float32)
        padded[:n] = coords_sorted
        padded[n:] = np.float32(3e38)
        rmin, rmax = pruning.block_bboxes(padded, row_block)
        cmin, cmax = pruning.block_bboxes(padded, col_block)
        d2b = pruning.bbox_dist2(rmin, rmax, cmin, cmax)
        nrb, ncb = d2b.shape
        ri = np.arange(nrb)[:, None]
        cj = np.arange(ncb)[None, :]
        active = (d2b < np.float32(max_dist2)) \
            & (ri * row_block < n_below) & (cj * col_block < n_below)
        from ..ops.pallas_kernels import INTERPRET_MODE
        union_size = n_pad
        bidir = (col_block % row_block == 0
                 and union_size * 4 <= 64 << 20
                 and (INTERPRET_MODE() or col_block % 128 == 0))
        if bidir:
            active = pruning.bidir_closure(active, row_block, col_block)
        ti, tj = np.nonzero(active)
        # devices with no active tiles redundantly re-sweep tile (0, 0)
        # -- harmless under the idempotent min ('repeat' pad mode)
        ti_dev, tj_dev, _ = pruning.split_tiles_balanced(
            ti, tj, n_dev, pad_mode="repeat")
        fn = (_screening_sharded_pallas_bidir if bidir
              else _screening_sharded_pallas)
        out = fn(
            replicated(padded.T, mesh), replicated(labels, mesh),
            jnp.int32(n_below),
            jnp.float32(max_dist2), replicated(ti_dev, mesh),
            replicated(tj_dev, mesh), mesh,
            row_block=row_block, col_block=col_block,
            union_size=union_size)
        return fetch(out)[:n]
    padded_np = np.zeros((n_pad, coords_sorted.shape[1]), dtype=np.float32)
    padded_np[:n] = coords_sorted
    out = _screening_sharded(replicated(padded_np, mesh),
                             replicated(labels, mesh),
                             jnp.int32(n_below),
                             jnp.float32(max_dist2), mesh,
                             row_block=row_block, col_block=col_block)
    return fetch(out)[:n]
