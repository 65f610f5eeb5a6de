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

import jax
import jax.numpy as jnp
import numpy as np

from .pairwise import sq_dists, pad_rows

DEFAULT_ROW_BLOCK = 1024
DEFAULT_COL_BLOCK = 4096

_IMAX = jnp.int32(np.iinfo(np.int32).max)


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
    """Compress label chains until table == table[table]."""
    def cond(m):
        return jnp.any(m[m] != m)

    def body(m):
        return m[m]

    return jax.lax.while_loop(cond, body, table)


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
        _, changed = state
        return changed

    def outer_body(state):
        labels_in, _ = state
        labels_cur = sweep_row_range(coords_sorted, labels_in, 0, n_pad,
                                     n_below, max_dist2,
                                     row_block, col_block)
        labels_out = union_rebase(labels_in, labels_cur)
        return (labels_out, jnp.any(labels_out != labels_in))

    labels, _ = jax.lax.while_loop(outer_cond, outer_body,
                                   (labels0, jnp.bool_(True)))
    return labels


@functools.partial(jax.jit, static_argnames=("row_block", "col_block"))
def _screening_fixpoint_pallas(coords_t, labels0, n_below, max_dist2,
                               skip_words, row_block, col_block):
    """Fixpoint with the Pallas neighbor-min sweep (Jacobi proposals +
    scatter-min union); the bbox skip matrix is threshold-independent."""
    from .pallas_kernels import label_min_tiles

    def outer_cond(state):
        _, changed = state
        return changed

    def outer_body(state):
        labels_in, _ = state
        m = label_min_tiles(coords_t, labels_in.reshape(1, -1), n_below,
                            max_dist2, skip_words, row_block=row_block,
                            col_block=col_block)[0]
        labels_cur = jnp.minimum(labels_in, m)
        labels_out = union_rebase(labels_in, labels_cur)
        return (labels_out, jnp.any(labels_out != labels_in))

    labels, _ = jax.lax.while_loop(outer_cond, outer_body,
                                   (labels0, jnp.bool_(True)))
    return labels


class ScreeningEngine:
    """Re-usable screening runner for a threshold series: pads and uploads
    the FE-sorted coordinates once and caches the (threshold-independent)
    bbox skip matrix. Backend 'pallas' uses the fused tile kernel,
    'xla' the blockwise jnp sweep, 'auto' picks by platform."""

    def __init__(self, coords_sorted, row_block=DEFAULT_ROW_BLOCK,
                 col_block=DEFAULT_COL_BLOCK, backend="auto"):
        if backend == "auto":
            backend = "xla" if jax.default_backend() == "cpu" else "pallas"
        self.backend = backend
        self.row_block = row_block
        self.col_block = col_block
        coords_sorted = np.asarray(coords_sorted, dtype=np.float32)
        self.n = coords_sorted.shape[0]
        block = int(np.lcm(row_block, col_block))
        self.n_pad = -(-self.n // block) * block
        padded = np.zeros((self.n_pad, coords_sorted.shape[1]),
                          dtype=np.float32)
        padded[:self.n] = coords_sorted
        padded[self.n:] = np.float32(3e38)
        self._padded_host = padded
        if backend == "pallas":
            self._coords_dev = jnp.asarray(padded.T)
        else:
            self._coords_dev = jnp.asarray(padded)
        self._skip_cache = {}

    def _skip_words(self, max_dist2):
        key = float(max_dist2)
        if key not in self._skip_cache:
            from . import pruning
            # adjacency is strict '<', so tiles at exactly max_dist2 can
            # be skipped too (strict=False)
            self._skip_cache[key], _ = pruning.radius_skip_words(
                self._padded_host, self.row_block, self.col_block,
                np.float32(max_dist2), strict=False)
        return self._skip_cache[key]

    def run(self, initial_labels, n_below, max_dist2):
        labels = np.asarray(initial_labels, dtype=np.int32)
        if self.n_pad != self.n:
            labels = np.concatenate(
                [labels, np.arange(self.n, self.n_pad, dtype=np.int32)])
        labels = jnp.asarray(labels)
        if self.backend == "pallas":
            out = _screening_fixpoint_pallas(
                self._coords_dev, labels, jnp.int32(n_below),
                jnp.float32(max_dist2), self._skip_words(max_dist2),
                row_block=self.row_block, col_block=self.col_block)
        else:
            out = _screening_fixpoint(
                self._coords_dev, labels, jnp.int32(n_below),
                jnp.float32(max_dist2),
                row_block=self.row_block, col_block=self.col_block)
        return np.asarray(jax.device_get(out))[:self.n]


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
