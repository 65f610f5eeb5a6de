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
from ..ops.pairwise import pad_rows
from .mesh import FRAME_AXIS, mesh_size

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
        out_specs=P(None, FRAME_AXIS), check_vma=False)
    def run(rows_shard, coords_all, radii2, n_valid):
        return dops.counts_row_range(rows_shard, coords_all, radii2,
                                     n_valid, row_block, col_block)

    return run(coords_padded, coords_padded, radii2, n_valid)


def populations(coords, radii, mesh,
                row_block=DEFAULT_ROW_BLOCK, col_block=DEFAULT_COL_BLOCK):
    """Mesh-sharded multi-radius populations; same semantics as
    clustering_tpu.ops.populations."""
    coords = jnp.asarray(coords, dtype=jnp.float32)
    n = coords.shape[0]
    block = _pad_block(n, mesh_size(mesh), row_block, col_block)
    padded = pad_rows(coords, block)
    radii = list(radii)
    radii2 = jnp.asarray([r * r for r in radii], dtype=jnp.float32)
    counts = _pops_sharded(padded, radii2, jnp.int32(n), mesh,
                           row_block=row_block, col_block=col_block)
    counts = np.asarray(jax.device_get(counts))[:, :n].astype(np.int64)
    return {r: counts[i] for i, r in enumerate(radii)}


@functools.partial(jax.jit,
                   static_argnames=("mesh", "row_block", "col_block"))
def _nn_sharded(coords_padded, fe_padded, n_valid, mesh,
                row_block=DEFAULT_ROW_BLOCK, col_block=DEFAULT_COL_BLOCK):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(FRAME_AXIS, None), P(FRAME_AXIS), P(None, None),
                  P(None), P()),
        out_specs=(P(FRAME_AXIS), P(FRAME_AXIS), P(FRAME_AXIS),
                   P(FRAME_AXIS)), check_vma=False)
    def run(rows_shard, fe_shard, coords_all, fe_all, n_valid):
        return nops.nn_row_range(rows_shard, fe_shard, coords_all, fe_all,
                                 n_valid, row_block, col_block)

    return run(coords_padded, fe_padded, coords_padded, fe_padded, n_valid)


def nearest_neighbors(coords, free_energy, mesh,
                      row_block=DEFAULT_ROW_BLOCK,
                      col_block=DEFAULT_COL_BLOCK):
    """Mesh-sharded joint NN / NN-higher-density search; same semantics as
    clustering_tpu.ops.nearest_neighbors."""
    coords = jnp.asarray(coords, dtype=jnp.float32)
    fe = jnp.asarray(free_energy, dtype=jnp.float32)
    n = coords.shape[0]
    block = _pad_block(n, mesh_size(mesh), row_block, col_block)
    padded = pad_rows(coords, block)
    fe_padded = pad_rows(fe, block, fill=np.inf)
    nh_d, nh_j, hd_d, hd_j = _nn_sharded(padded, fe_padded, jnp.int32(n),
                                         mesh, row_block=row_block,
                                         col_block=col_block)
    nh_d = np.array(jax.device_get(nh_d))[:n]
    nh_j = np.array(jax.device_get(nh_j))[:n].astype(np.int64)
    hd_d = np.array(jax.device_get(hd_d))[:n]
    hd_j = np.array(jax.device_get(hd_j))[:n].astype(np.int64)
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
                     col_block=DEFAULT_COL_BLOCK):
    """Mesh-sharded screening fixpoint; same semantics as
    clustering_tpu.ops.screening_labels."""
    coords_sorted = jnp.asarray(coords_sorted, dtype=jnp.float32)
    labels = jnp.asarray(initial_labels, dtype=jnp.int32)
    n = coords_sorted.shape[0]
    block = _pad_block(n, mesh_size(mesh), row_block, col_block)
    n_pad = -(-n // block) * block
    coords_padded = pad_rows(coords_sorted, block)
    if n_pad != n:
        labels = jnp.concatenate(
            [labels, jnp.arange(n, n_pad, dtype=jnp.int32)])
    out = _screening_sharded(coords_padded, labels, jnp.int32(n_below),
                             jnp.float32(max_dist2), mesh,
                             row_block=row_block, col_block=col_block)
    return np.asarray(jax.device_get(out))[:n]
