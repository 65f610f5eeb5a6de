"""Device-resident driver for the density pipeline's O(N^2) stages.

Uploads the frame matrix once, caches sort orders, padded/transposed device
copies and bbox pruning structures, and runs the Pallas (or XLA) kernels for
populations and NN search against them. This is the engine behind
``clustering density``: the reference re-reads and re-uploads per stage
(src/density_clustering_cuda.cu:65-99, 200-224); here HBM keeps everything
resident across the whole mode run.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import density as dops
from . import neighbors as nops
from . import pruning

DEFAULT_ROW_BLOCK = 128
DEFAULT_COL_BLOCK = 4096


@jax.jit
def _lex_merge(b_d, b_j, o_d, o_j):
    """Elementwise lexicographic (distance, index) minimum of two stacked
    NN results; one fused dispatch (eager ops would each pay a device
    round-trip)."""
    take_b = (b_d < o_d) | ((b_d == o_d) & (b_j < o_j))
    return jnp.where(take_b, b_d, o_d), jnp.where(take_b, b_j, o_j)


@functools.partial(jax.jit, static_argnames=("qs",))
def _ub_tiers(stacked_d, n, qs):
    """Per-frame tier index from the band pass's stacked [nh; hd] bounds:
    tier k collects frames whose ub lies in (tau_{k-1}, tau_k], with taus
    the ``qs`` quantiles of the finite ubs; frames above the last quantile
    (or with no band neighbor at all) land in the final tier. Returns
    (tier uint8 (N_pad,), taus (len(qs),))."""
    ub = jnp.maximum(stacked_d[0, :], stacked_d[1, :])
    real = (jnp.arange(ub.shape[0]) < n) & jnp.isfinite(ub)
    taus = jnp.nanquantile(jnp.where(real, ub, jnp.nan),
                           jnp.asarray(qs, dtype=jnp.float32))
    tier = jnp.searchsorted(taus, ub, side="left").astype(jnp.uint8)
    return tier, taus


def _host_pair_d2(coords, idx):
    """fp32 squared distances coords[i] -> coords[idx[i]], accumulated per
    dimension in ascending order with numpy ops (one rounding per multiply
    and per add -- bit-identical to the Pallas kernel's VPU arithmetic)."""
    acc = np.zeros(len(idx), dtype=np.float32)
    for k in range(coords.shape[1]):
        diff = coords[:, k] - coords[idx, k]
        acc = acc + diff * diff
    return acc


@functools.partial(jax.jit, static_argnames=("row_block",))
def _row_ub(stacked_d, perm, row_block):
    """Per-row-block upper bounds from a stacked (2, N_pad) band result:
    per-frame max of the [nh; hd] distances, permuted into the candidate
    order, reduced over each row block. Returns (N_pad // row_block,)."""
    ub = jnp.maximum(stacked_d[0, :], stacked_d[1, :])
    return ub[perm].reshape(-1, row_block).max(axis=1)


class DensityEngine:
    def __init__(self, coords, row_block=DEFAULT_ROW_BLOCK,
                 col_block=DEFAULT_COL_BLOCK, backend="auto", mesh=None):
        """``mesh``: a 1-D jax.sharding.Mesh to shard the row axis over
        (multi-chip); None = single device."""
        if backend == "auto":
            backend = "xla" if jax.default_backend() == "cpu" else "pallas"
        self.backend = backend
        self.mesh = mesh
        self.row_block = row_block
        self.col_block = col_block
        self.coords = np.ascontiguousarray(coords, dtype=np.float32)
        self.n, self.d = self.coords.shape
        block = int(np.lcm(row_block, col_block))
        self.n_pad = -(-self.n // block) * block
        self._orders = {}       # name -> (order, padded_host)
        self._dev = {}          # name -> device array ((D, N_pad) or (N_pad, D))
        self._bboxes = {}       # name -> bbox distance matrix

    # -- cached layouts ----------------------------------------------------

    def _padded(self, name):
        if name not in self._orders:
            if name == "orig":
                order = None
                sorted_coords = self.coords
            elif name == "dim0":
                order = np.argsort(self.coords[:, 0], kind="stable")
                sorted_coords = self.coords[order]
            elif name == "morton":
                order = pruning.morton_order(self.coords)
                sorted_coords = self.coords[order]
            else:
                raise ValueError(name)
            padded = np.zeros((self.n_pad, self.d), dtype=np.float32)
            padded[:self.n] = sorted_coords
            padded[self.n:] = np.float32(3e38)
            self._orders[name] = (order, padded)
        return self._orders[name]

    def _device(self, name):
        if name not in self._dev:
            _, padded = self._padded(name)
            if self.backend == "pallas":
                self._dev[name] = jnp.asarray(padded.T)
            else:
                self._dev[name] = jnp.asarray(padded)
        return self._dev[name]

    def _bbox(self, name):
        if name not in self._bboxes:
            _, padded = self._padded(name)
            rmin, rmax = pruning.block_bboxes(padded, self.row_block)
            cmin, cmax = pruning.block_bboxes(padded, self.col_block)
            self._bboxes[name] = pruning.bbox_dist2(rmin, rmax, cmin, cmax)
        return self._bboxes[name]

    def _col_bboxes(self, name):
        """Column-block (mins, maxs) for ``name``'s padded layout."""
        key = ("colbb", name)
        if key not in self._bboxes:
            _, padded = self._padded(name)
            self._bboxes[key] = pruning.block_bboxes(padded, self.col_block)
        return self._bboxes[key]

    def _host_perm(self, src_name, dst_name):
        """Host permutation: position p of ``dst_name`` order -> position
        of the same frame in ``src_name`` order (pads map to themselves)."""
        key = ("hostperm", src_name, dst_name)
        if key not in self._orders:
            src_order, _ = self._padded(src_name)
            dst_order, _ = self._padded(dst_name)
            perm = np.arange(self.n_pad, dtype=np.int64)
            rank_src = np.empty(self.n, dtype=np.int64)
            if src_order is None:
                rank_src[:] = np.arange(self.n)
            else:
                rank_src[src_order] = np.arange(self.n)
            perm[:self.n] = (rank_src if dst_order is None
                             else rank_src[dst_order])
            self._orders[key] = perm
        return self._orders[key]

    def _ub_perm(self, src_name, dst_name):
        """Device int32 permutation mapping positions of ``dst_name`` order
        to positions of ``src_name`` order (padding maps to itself), cached
        -- lets per-frame reductions be re-laid-out on device without
        downloading them."""
        key = ("ubperm", src_name, dst_name)
        if key not in self._dev:
            src_order, _ = self._padded(src_name)
            dst_order, _ = self._padded(dst_name)
            perm = np.arange(self.n_pad, dtype=np.int32)
            rank_src = np.empty(self.n, dtype=np.int32)
            if src_order is None:
                rank_src[:] = np.arange(self.n, dtype=np.int32)
            else:
                rank_src[src_order] = np.arange(self.n, dtype=np.int32)
            perm[:self.n] = (rank_src if dst_order is None
                             else rank_src[dst_order])
            self._dev[key] = jnp.asarray(perm)
        return self._dev[key]

    def _best_sort(self, thresh2):
        """Pick the ordering (dim0 vs morton) with the higher measured tile
        skip fraction at this radius."""
        best, best_frac = None, -1.0
        for name in ("dim0", "morton"):
            frac = float((self._bbox(name) > np.float32(thresh2)).mean())
            if frac > best_frac:
                best, best_frac = name, frac
        return best

    # -- ops ---------------------------------------------------------------

    def populations(self, radii, prune=True):
        if self.mesh is not None:
            from ..parallel import sharded
            return sharded.populations(self.coords, list(radii), self.mesh,
                                       row_block=self.row_block,
                                       col_block=self.col_block,
                                       backend=self.backend, prune=prune)
        radii = list(radii)
        radii2 = jnp.asarray([np.float32(r) * np.float32(r) for r in radii],
                             dtype=jnp.float32)
        if self.backend != "pallas":
            counts = dops._populations_padded(
                self._device("orig"), radii2, jnp.int32(self.n),
                row_block=self.row_block, col_block=self.col_block)
            counts = np.asarray(jax.device_get(counts))[:, :self.n]
            return {r: counts[i].astype(np.int64)
                    for i, r in enumerate(radii)}
        from . import pallas_kernels as pk
        r_max2 = np.float32(max(radii)) * np.float32(max(radii))
        if prune:
            name = self._best_sort(r_max2)
            active = self._bbox(name) <= r_max2
        else:
            name = "orig"
            active = np.ones((self.n_pad // self.row_block,
                              self.n_pad // self.col_block), dtype=bool)
        tiles = pruning.tile_list(active, pad_mode="noop")
        order, _ = self._padded(name)
        # per-tile radius bitmask: a tile whose bbox distance exceeds r^2
        # skips that radius's compare+count in the kernel (bit r unset);
        # pads (tj = -1) carry mask 0 and skip the whole tile body
        if prune:
            d2b = self._bbox(name)
            rmask = np.zeros(tiles[0].shape, dtype=np.int32)
            pad = tiles[1] < 0
            ti_safe = tiles[0]
            tj_safe = np.maximum(tiles[1], 0)
            for r_idx, r in enumerate(radii):
                r2 = np.float32(r) * np.float32(r)
                rmask |= (d2b[ti_safe, tj_safe] <= r2).astype(
                    np.int32) << r_idx
            rmask[pad] = 0
        else:
            rmask = np.where(tiles[1] >= 0,
                             np.int32((1 << len(radii)) - 1), np.int32(0))
        acc = pk.pops_tiles_sparse_all(self._device(name), radii2,
                                       np.int32(self.n),
                                       tiles[0], tiles[1], rmask=rmask,
                                       row_block=self.row_block,
                                       col_block=self.col_block)
        counts = np.asarray(jax.device_get(acc))[:, :self.n]
        if order is not None:
            unsorted = np.empty_like(counts)
            unsorted[:, order] = counts
            counts = unsorted
        return {r: counts[i].astype(np.int64) for i, r in enumerate(radii)}

    def _nn_sparse_chunks(self, order_name, fe_dev, oid_dev, active):
        """Run the sparse NN kernel over the active tiles, merging the
        stacked (2, N_pad) [nh; hd] outputs lexicographically across SMEM
        chunks."""
        from . import pallas_kernels as pk
        tiles = pruning.tile_list(active)
        return pk.nn_tiles_sparse_all(self._device(order_name), fe_dev,
                                      oid_dev, np.int32(self.n),
                                      tiles[0], tiles[1],
                                      row_block=self.row_block,
                                      col_block=self.col_block)

    def _nn_tiered(self, winner, band_name, band_out, fe, layout, tier_qs):
        """Tier-ordered phase 2: rows re-sorted by (ub-quantile tier,
        ``winner`` spatial position) so each row block is tier-homogeneous
        and carries its tier's quantile as the bound -- one cross sweep,
        one download, ~3.5x fewer swept pairs than per-row-block max-ub
        bounds on metastable data. Exact: every frame's bound dominates
        its true ub, so all tiles that can hold its minima stay active.
        Returns (2, N_pad) int32 neighbor ids in winner-position space."""
        from . import pallas_kernels as pk
        n, n_pad = self.n, self.n_pad
        rb = self.row_block
        n_tiers = len(tier_qs) + 1
        tier_dev, taus_dev = _ub_tiers(band_out[0], jnp.int32(n),
                                       qs=tuple(tier_qs))
        tier_b = np.asarray(jax.device_get(tier_dev))
        taus = np.asarray(jax.device_get(taus_dev), dtype=np.float32)
        perm = self._host_perm(band_name, winner)
        tier_w = np.full(n_pad, n_tiers, dtype=np.int64)  # pads last
        tier_w[:n] = tier_b[perm[:n]]
        order_w, padded_w = self._padded(winner)
        _, _, fe_dev_w, oid_dev_w = layout(winner)
        fe_w = np.full(n_pad, np.inf, dtype=np.float32)
        fe_w[:n] = fe if order_w is None else fe[order_w]
        # stable sort by tier keeps winner-order spatial locality inside
        # each tier; pads sink to the tail
        perm_rows = np.argsort(tier_w, kind="stable")
        rows = padded_w[perm_rows]
        fe_rows = fe_w[perm_rows]
        rmin, rmax = pruning.block_bboxes(rows, rb)
        cmin, cmax = self._col_bboxes(winner)
        d2b = pruning.bbox_dist2(rmin, rmax, cmin, cmax)
        # per-row-block bound = its worst member's tier quantile (blocks
        # straddling a tier boundary take the larger tier's bound; the
        # top tier and any pad members mean "unbounded"); blocks with no
        # real member at all are dropped
        tiers_blk = tier_w[perm_rows].reshape(-1, rb)
        bounds = np.concatenate([taus.astype(np.float32),
                                 [np.float32(np.inf)]])
        blk_bound = bounds[np.minimum(tiers_blk.max(axis=1), len(tier_qs))]
        has_real = tiers_blk.min(axis=1) < n_tiers
        active = (d2b <= blk_bound[:, None]) & has_real[:, None]
        tiles = pruning.tile_list(active)
        imax = np.iinfo(np.int32).max
        out_j = np.full((2, n_pad), imax, dtype=np.int32)
        if tiles is None:
            return out_j
        outk = pk.nn_tiles_sparse_all_cross(
            jnp.asarray(rows.T), jnp.asarray(fe_rows).reshape(1, n_pad),
            self._device(winner), fe_dev_w, oid_dev_w, np.int32(n),
            jnp.asarray(tiles[0]), jnp.asarray(tiles[1]),
            row_block=rb, col_block=self.col_block)
        jk = np.asarray(jax.device_get(outk[1]))
        out_j[:, perm_rows] = jk
        return out_j

    def nearest_neighbors(self, free_energy, prune=True, band_blocks=4,
                          order_name="morton", tier_qs=None):
        """Joint NN / NN-higher-density search with two-phase exact
        pruning in Morton (spatially local) frame order:

          1. a banded pass over neighboring sort positions gives every
             frame an upper bound on both neighbor distances;
          2. the full pass skips tiles whose bbox distance exceeds the
             bound -- tiles holding the true minima always survive.

        ``tier_qs`` (e.g. (0.5, 0.9, 0.99)) switches phase 2 to
        ub-quantile-tiered sweeps: frames are partitioned by their bound,
        each tier compacted in spatial order and swept under its own
        quantile bound, so boundary frames with distant higher-density
        neighbors stop widening whole row blocks (per-block max-ub
        inflates swept pairs ~3.5x on metastable trajectories). Exact
        either way. Default None (single per-row-block-bounded pass):
        the tiered path's extra dispatches/transfers only pay off when
        host<->device latency is low (local chips, not remote tunnels).

        The kernel breaks distance ties by smallest *original* index, so
        results are identical to the reference's original-order scan.
        """
        fe = np.asarray(free_energy, dtype=np.float32)
        if self.mesh is not None:
            from ..parallel import sharded
            return sharded.nearest_neighbors(self.coords, fe, self.mesh,
                                             row_block=self.row_block,
                                             col_block=self.col_block,
                                             backend=self.backend,
                                             prune=prune,
                                             band_blocks=band_blocks)
        if self.backend != "pallas":
            return nops.nearest_neighbors(self.coords, fe,
                                          row_block=self.row_block,
                                          col_block=self.col_block,
                                          backend="xla")
        from . import pallas_kernels as pk
        n, n_pad = self.n, self.n_pad

        layouts = {}

        def layout(name):
            if name not in layouts:
                order, padded = self._padded(name)
                fe_padded = np.full(n_pad, np.inf, dtype=np.float32)
                fe_padded[:n] = fe if order is None else fe[order]
                oid = np.full(n_pad, np.iinfo(np.int32).max, dtype=np.int32)
                oid[:n] = (np.arange(n, dtype=np.int32) if order is None
                           else order)
                layouts[name] = (order, padded,
                                 jnp.asarray(fe_padded).reshape(1, n_pad),
                                 jnp.asarray(oid).reshape(1, n_pad))
            return layouts[name]

        nrb, ncb = n_pad // self.row_block, n_pad // self.col_block
        order, padded, fe_dev, oid_dev = layout(order_name)
        band_name, band_out = None, None
        out_j = None
        if prune and ncb > 2 * band_blocks:
            # phase 1: banded pass over sort-neighbors -> per-frame upper
            # bounds (order-independent values)
            band_active = pruning.band_mask(
                nrb, ncb, self.row_block, self.col_block,
                band_blocks * self.col_block)
            out1 = self._nn_sparse_chunks(order_name, fe_dev, oid_dev,
                                          band_active)
            # keep the per-frame bounds on device; per candidate order,
            # permute + reduce there and download only the per-row-block
            # maxima (device->host is the slow, flaky direction through
            # remote-TPU tunnels: nrb floats instead of N)
            best = None
            for name in ("dim0", "morton"):
                row_ub = np.asarray(jax.device_get(_row_ub(
                    out1[0], self._ub_perm(order_name, name),
                    row_block=self.row_block)))
                act = self._bbox(name) <= row_ub[:, None]
                work = float((act & ~band_active).mean()
                             if name == order_name else act.mean())
                if best is None or work < best[0]:
                    best = (work, name, act)
            band_name, band_out = order_name, out1
            _, order_name, active = best
            order, padded, fe_dev, oid_dev = layout(order_name)
            if tier_qs is not None:
                out_j = self._nn_tiered(order_name, band_name, band_out,
                                        fe, layout, tier_qs)
            elif order_name == band_name:
                # the band's minima are exact within its tiles and the merge
                # is an idempotent lexicographic min: skip re-sweeping them
                # and fold the band result in afterwards
                active = active & ~band_active
        else:
            active = np.ones((nrb, ncb), dtype=bool)
        if out_j is None:
            merge_band = band_out is not None and order_name == band_name
            if not active.any():
                out = None
            else:
                out = self._nn_sparse_chunks(order_name, fe_dev, oid_dev,
                                             active)
            if merge_band and out is not None:
                # lexicographic merge on device: one download vs three
                out = _lex_merge(band_out[0], band_out[1], out[0], out[1])
            elif merge_band:
                out = band_out
            if out is None:
                out_j = np.full((2, n_pad), np.iinfo(np.int32).max,
                                dtype=np.int32)
            else:
                # download indices only; distances are recomputed on the
                # host (numpy's per-dimension fp32 accumulation rounds the
                # square and the add separately, exactly like the TPU
                # kernel, so the values are bit-identical at half the
                # transfer volume)
                out_j = np.array(jax.device_get(out[1]))
        nh_j = out_j[0, :n].astype(np.int64)
        hd_j = out_j[1, :n].astype(np.int64)
        if order is not None:
            inv = np.empty_like(order)
            inv[order] = np.arange(n)
            nh_j = nh_j[inv]
            hd_j = hd_j[inv]
        imax = np.iinfo(np.int32).max
        no_nh = nh_j == imax
        nh_j[no_nh] = 0
        no_hd = hd_j == imax
        hd_j[no_hd] = 0
        nh_d = _host_pair_d2(self.coords, nh_j)
        hd_d = _host_pair_d2(self.coords, hd_j)
        nh_d[no_nh] = 0.0
        hd_d[no_hd] = 0.0
        return nh_j, nh_d, hd_j, hd_d
