"""Device-resident driver for the density pipeline's O(N^2) stages.

Uploads the frame matrix once, caches sort orders, padded/transposed device
copies and bbox pruning structures, and runs the Pallas (or XLA) kernels for
populations and NN search against them. This is the engine behind
``clustering density``: the reference re-reads and re-uploads per stage
(src/density_clustering_cuda.cu:65-99, 200-224); here HBM keeps everything
resident across the whole mode run.
"""

import functools
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import density as dops
from . import neighbors as nops
from . import pruning
from ..utils import textio_native

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
    ~the ``qs`` quantiles of the finite ubs; frames above the last tau
    (or with no band neighbor at all) land in the final tier. Returns
    (tier uint8 (N_pad,), taus (len(qs),)).

    taus come from 24 rounds of vectorized histogram bisection, not
    jnp.nanquantile: the quantile's full f32 sort cost a 20s chipless
    AOT compile at 2^20 frames (COLDSTART_r04 ledger) vs 1.2s for the
    bisection, and ANY non-decreasing taus keep the tier pruning exact
    (the layout's block bound taus[max tier] >= every member ub by the
    searchsorted invariant) -- quantile accuracy only balances tiers,
    and 24 halvings land within (hi-lo)*2^-24 of the true cut."""
    ub = jnp.maximum(stacked_d[0, :], stacked_d[1, :])
    real = (jnp.arange(ub.shape[0]) < n) & jnp.isfinite(ub)
    vals = jnp.where(real, ub, jnp.inf)
    m = jnp.sum(real).astype(jnp.float32)
    # degenerate all-inf input: keep taus finite (every frame lands in
    # the final tier whose bound is +inf, exactly like real frames with
    # no band neighbor)
    lo0 = jnp.where(m > 0, jnp.min(vals), jnp.float32(0.0))
    hi0 = jnp.where(m > 0, jnp.max(jnp.where(real, ub, -jnp.inf)),
                    jnp.float32(0.0))
    qarr = jnp.asarray(qs, dtype=jnp.float32)
    target = qarr * jnp.maximum(m - 1.0, 0.0) + 1.0

    def bisect(carry, _):
        los, his = carry
        mid = (los + his) * jnp.float32(0.5)
        cnt = jnp.sum(vals[None, :] <= mid[:, None],
                      axis=1).astype(jnp.float32)
        go_hi = cnt < target
        return (jnp.where(go_hi, mid, los), jnp.where(go_hi, his, mid)), None

    (los, his), _ = jax.lax.scan(
        bisect, (jnp.full((len(qs),), lo0), jnp.full((len(qs),), hi0)),
        None, length=24)
    # the upper end of each bracket: >= the true cut value, so every
    # member ub stays dominated (non-decreasing by bracket ordering)
    taus = his
    tier = jnp.searchsorted(taus, ub, side="left").astype(jnp.uint8)
    return tier, taus


@jax.jit
def _tier_sort_perm(tier_dev, ub_perm, n, n_tiers):
    """Winner-order tier vector (pads -> n_tiers) and its stable (tier,
    position) sort permutation, one fused program: the 1M-frame argsort
    costs a ~10s chipless AOT compile, and keeping it out of
    _tiered_layout_sym means the pack=True/False variants (both occur
    in production: speculative dispatch vs spec-miss re-dispatch)
    compile the cheap remainder instead of two copies of the sort. The
    tier re-layout + pad fill are fused in too (as eager ops their
    convert alone cost a 10.9s compile inside the NN stage,
    COLDSTART_r04 ledger)."""
    n_pad = ub_perm.shape[0]
    tier_w = jnp.where(jnp.arange(n_pad) < n,
                       tier_dev[ub_perm].astype(jnp.int32), n_tiers)
    # stable argsort by tier keeps spatial order inside each tier (the
    # earlier composite key tier * n_pad + position overflowed int32
    # once n_pad * (n_tiers + 1) passed 2^31, ~429M frames at 4 tiers)
    return tier_w, jnp.argsort(tier_w, stable=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("row_block", "col_block",
                                             "n_tiers", "pack"))
def _tiered_layout_sym(coords_t, fe_w, oid_w, tier_w, taus, perm,
                       row_block, col_block, n_tiers, pack=True):
    """Symmetric tiered layout for the BIDIRECTIONAL phase 2: the whole
    frame set is stable-sorted by (ub-tier, spatial position), so row and
    column order coincide and the upper-triangular bidirectional sweep
    applies on top of the tier bounds -- tier pruning (~3.5x fewer swept
    pairs than per-row-block max-ub bounds on metastable data) composes
    with the 2x bidirectional saving. Everything runs on device; the only
    host readback is the bit-packed active mask.

    Returns (rows_t (D, N_pad) permuted, fe (1, N_pad), oid (1, N_pad),
    perm, active words (nrb, ceil(ncb/32)) uint32 -- unpack with
    pruning.unpack_planes). Exact: each row block's bound is its
    tier quantile, which dominates every member frame's true ub, so all
    tiles that can hold a frame's minima stay active; mirrored coverage
    is restored by the caller's bidir_closure."""
    n_dim, n_pad = coords_t.shape
    rows_t = coords_t[:, perm]
    fe_rows = fe_w[perm]
    oid_rows = oid_w[perm]
    tiers_p = tier_w[perm].reshape(-1, row_block)
    rblk = rows_t.reshape(n_dim, -1, row_block)
    rmin = rblk.min(axis=2)  # (D, nrb)
    rmax = rblk.max(axis=2)
    cblk = rows_t.reshape(n_dim, -1, col_block)
    cmin = cblk.min(axis=2).T  # (ncb, D)
    cmax = cblk.max(axis=2).T
    gap1 = rmin.T[:, None, :] - cmax[None, :, :]
    gap2 = cmin[None, :, :] - rmax.T[:, None, :]
    gap = jnp.maximum(jnp.maximum(gap1, gap2), 0.0)
    margin = jnp.float32(1.0 - (n_dim + 8) * 2.0 ** -23)
    big = jnp.float32(np.finfo(np.float32).max) * margin
    d2b = jnp.minimum(jnp.sum(gap * gap, axis=2), big) * margin
    bounds = jnp.concatenate([taus.astype(jnp.float32),
                              jnp.asarray([np.inf], dtype=jnp.float32)])
    blk_bound = bounds[jnp.minimum(tiers_p.max(axis=1), n_tiers - 1)]
    has_real = tiers_p.min(axis=1) < n_tiers
    active = (d2b <= blk_bound[:, None]) & has_real[:, None]
    # pack=False keeps the bool mask on device for the big-N device
    # planner (no download at all); pack=True is the small-N path whose
    # words ride the band activity fetch
    return (rows_t, fe_rows, oid_rows, perm,
            pruning.pack_mask_words(active) if pack else active)


@functools.partial(jax.jit, static_argnames=("row_block", "n_tiers"))
def _tiered_layout(coords_t, fe_w, tier_w, cmin, cmax, taus, row_block,
                   n_tiers):
    """Device-side tiered phase-2 layout: stable-sort rows by (tier,
    spatial position), compute the permuted row-block bboxes and the
    active-tile mask against the cached column bboxes -- no host sort, no
    re-upload of the frame matrix (the host round-trip dominated the
    tiered path through remote-TPU tunnels).

    Returns (rows_t (D, N_pad) permuted, fe_rows (N_pad,), perm_rows,
    active words (nrb, ceil(ncb/32)) uint32)."""
    n_dim, n_pad = coords_t.shape
    # stable argsort by tier keeps spatial order inside each tier (no
    # composite key: tier * n_pad + pos overflowed int32 past ~429M
    # frames)
    perm_rows = jnp.argsort(tier_w.astype(jnp.int32),
                            stable=True).astype(jnp.int32)
    rows_t = coords_t[:, perm_rows]
    fe_rows = fe_w[perm_rows]
    tiers_p = tier_w[perm_rows].reshape(-1, row_block)
    rblk = rows_t.reshape(n_dim, -1, row_block)
    rmin = rblk.min(axis=2)  # (D, nrb)
    rmax = rblk.max(axis=2)
    # bbox distance lower bounds with the same downward margin as the
    # host pruning (pruning.bbox_dist2): fp32 rounding must never push a
    # bound past the threshold and prune a tile holding a true minimum
    gap1 = rmin.T[:, None, :] - cmax[None, :, :]
    gap2 = cmin[None, :, :] - rmax.T[:, None, :]
    gap = jnp.maximum(jnp.maximum(gap1, gap2), 0.0)
    margin = jnp.float32(1.0 - (n_dim + 8) * 2.0 ** -23)
    big = jnp.float32(np.finfo(np.float32).max) * margin
    d2b = jnp.minimum(jnp.sum(gap * gap, axis=2), big) * margin
    bounds = jnp.concatenate([taus.astype(jnp.float32),
                              jnp.asarray([np.inf], dtype=jnp.float32)])
    blk_bound = bounds[jnp.minimum(tiers_p.max(axis=1), n_tiers - 1)]
    has_real = tiers_p.min(axis=1) < n_tiers
    active = (d2b <= blk_bound[:, None]) & has_real[:, None]
    return rows_t, fe_rows, perm_rows, pruning.pack_mask_words(active)


@jax.jit
def _unpermute_cols(out_j, perm_rows):
    """Scatter columns back to pre-permutation positions on device."""
    inv = jnp.zeros_like(perm_rows).at[perm_rows].set(
        jnp.arange(perm_rows.shape[0], dtype=perm_rows.dtype))
    return out_j[:, inv]


@functools.partial(jax.jit, static_argnames=("n",))
def _nn_finish_idx(out_j, inv_pos, n):
    """Re-lay the stacked (2, N_pad) neighbor ids to original frame
    positions on device (fused into the result fetch; saves the host-side
    inverse-permutation gathers). Returns (2, n) int32."""
    return out_j[:, inv_pos[:n]]


@functools.partial(jax.jit, static_argnames=("n",))
def _nn_finish_idx_u24(out_j, inv_pos, n):
    """_nn_finish_idx with the (2, n) int32 ids packed to three uint8
    byte planes per row -- ids are always < 2^24 at supported N, so the
    ids-only host-finish download drops from 8 to 6 bytes/frame
    deterministically (no overflow fallback needed).  The absent
    sentinel INT32_MAX is remapped to 0xFFFFFF, which the caller's
    ``n <= 2^24 - 2`` gate keeps >= n_frames -- the native decoder
    treats any id >= n_frames as absent.  Returns (2, 3, n) uint8."""
    j = out_j[:, inv_pos[:n]]
    imax = jnp.int32(np.iinfo(np.int32).max)
    j = jnp.where(j == imax, jnp.int32(0xFFFFFF), j)
    return jnp.stack([j & 0xFF, (j >> 8) & 0xFF, (j >> 16) & 0xFF],
                     axis=1).astype(jnp.uint8)


def _nn_finish_chunks(n):
    """Chunk count for the streamed host finish: the ids download and the
    native distance recompute overlap chunk-by-chunk (fetch k+1 streams
    while k recomputes), so the host pass hides under the transfer
    instead of following it. Default 1 = off: through the axon tunnel a
    paired best-of-3 A/B at 2^20 measured 4-chunk streaming SLOWER
    (1.70s vs 1.55s total NN) -- each extra D2H round-trip costs more
    than the ~0.1-0.3s recompute it hides. Opt in via
    CLUSTERING_TPU_NN_FINISH_CHUNKS on locally-attached chips at >4M
    frames, where per-transfer latency is ~zero and the recompute
    grows with N."""
    env = os.environ.get("CLUSTERING_TPU_NN_FINISH_CHUNKS")
    if env:
        try:
            k = int(env)
        except ValueError:
            return 1
        # each chunk is a separate program output + D2H fetch + native
        # call; cap so a typo can't compile an n-output program
        return max(min(k, 16, n), 1)
    return 1


@functools.partial(jax.jit, static_argnames=("n", "k_chunks"))
def _nn_finish_idx_chunked(out_j, inv_pos, n, k_chunks):
    """_nn_finish_idx split into ``k_chunks`` frame-range outputs from ONE
    compiled program (separate outputs = separately fetchable buffers; a
    host-side slice of one download could not overlap its transfer)."""
    full = out_j[:, inv_pos[:n]]
    step = -(-n // k_chunks)
    return tuple(full[:, a:min(a + step, n)]
                 for a in range(0, n, step))


def _nn_finish_mode(n):
    """Pick the NN finish: "host" = ids-only download + host distance
    recompute, "device" = fused ids+distances fetch.

    Host wins when the native single-pass recompute is available at
    n >= 512k (halves the fresh-download volume and skips the fused
    path's full-array host conversions for a ~40ms native pass: paired
    A/B at 2^20 through the remote tunnel 1.61s vs 2.69s total NN,
    bit-identical outputs) and unconditionally beyond ~4M frames, where
    the extra distance payload (8B/frame) outweighs even the numpy
    recompute. CLUSTERING_TPU_NN_FINISH overrides either way (device is
    right for locally-attached chips, where 8MB costs ~1ms and any host
    pass loses)."""
    env = os.environ.get("CLUSTERING_TPU_NN_FINISH")
    if env in ("host", "device"):
        return env
    if n > (1 << 22) or (n >= (1 << 19) and textio_native.available()):
        return "host"
    return "device"


@functools.partial(jax.jit, static_argnames=("n",))
def _nn_finish(out_j, inv_pos, coords_t, n):
    """All-device NN finish: re-lay the stacked (2, N_pad) neighbor ids
    to original frame positions and recompute their fp32 squared
    distances with the kernel's own per-dimension ascending mul-then-add
    accumulation (two roundings per term -- the VPU has no fp32 fma, so
    this matches the sweep kernel bit-for-bit; verified bit-identical to
    the host numpy recompute on v5e).

    Finish mode for small N (and for CLUSTERING_TPU_NN_FINISH=device):
    downloads (2, n) f32 distances alongside the ids instead of
    recomputing them on host. Wins on locally-attached chips (PCIe makes
    the extra 8MB at N=2^20 ~1ms) and beat the *numpy* host recompute
    through the remote tunnel (paired A/B: 2.20s vs 2.59s total NN --
    in-situ numpy pays heavy page-fault cost at production N); the
    *native* single-pass recompute (native/textio.cpp::nn_finish_host)
    inverts that decisively (1.61s vs 2.69s at 2^20), so it is the
    default at n >= 512k when the native library loads.

    ``inv_pos`` maps original position -> position in ``out_j``'s layout;
    ``coords_t`` is the (D, N_pad) original-order frame matrix. Returns
    one (4, n) int32 array: rows 0-1 the ids and rows 2-3 the f32 d2
    bitcast to int32, both zeroed where no admissible neighbor exists
    (the reference's no-neighbor convention) -- split host-side with
    ``fused[2:].view(np.float32)``."""
    j = out_j[:, inv_pos[:n]]
    imax = jnp.int32(np.iinfo(np.int32).max)
    absent = j == imax
    j_safe = jnp.where(absent, 0, j)
    acc = jnp.zeros(j.shape, dtype=jnp.float32)
    for k in range(coords_t.shape[0]):
        diff = coords_t[k, :n][None, :] - coords_t[k, j_safe]
        acc = acc + diff * diff
    d = jnp.where(absent, jnp.float32(0.0), acc)
    # one fused (4, n) int32 payload: ids + bitcast distances download in
    # a single transfer instead of two (each device->host fetch through a
    # remote tunnel pays its own round-trip latency); absent frames are
    # zeroed HERE (id 0, d2 0 -- the reference's no-neighbor convention)
    # so the host postlude is a bare astype, not full-array compare+store
    # passes (in-situ numpy at production N pays ~0.5s for those)
    return jnp.concatenate(
        [j_safe, jax.lax.bitcast_convert_type(d, jnp.int32)], axis=0)


def _host_pair_d2(coords, idx):
    """fp32 squared distances coords[i] -> coords[idx[i]], accumulated per
    dimension in ascending order with numpy ops (one rounding per multiply
    and per add -- bit-identical to the Pallas kernel's VPU arithmetic)."""
    acc = np.zeros(len(idx), dtype=np.float32)
    for k in range(coords.shape[1]):
        diff = coords[:, k] - coords[idx, k]
        acc = acc + diff * diff
    return acc


@jax.jit
def _skip_frac(d2b, thresh2):
    return (d2b > thresh2).mean()


@jax.jit
def _band_nh_mean(stacked_d):
    """Mean of the finite per-frame nh distance bounds of a band-phase
    result -- an estimate of compute_sigma2 over the true NN distances
    (the band bound equals the true nh d2 for every frame whose nearest
    neighbor lies within the sort band, i.e. almost all of them on
    spatially-sorted data; pads and band-less frames carry inf and are
    masked)."""
    v = stacked_d[0]
    ok = jnp.isfinite(v)
    s = jnp.sum(jnp.where(ok, v, jnp.float32(0.0)))
    return s / jnp.maximum(jnp.sum(ok).astype(jnp.float32), 1.0)


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _pad_fe(fe_n, n_pad):
    """(n,) f32 free energies -> (1, N_pad) padded with +inf, on device:
    the prefetch thread's host np.full + copy passes cost ~50ms in-situ
    at 1M frames; here the host only enqueues the (n,) upload."""
    n = fe_n.shape[0]
    return jnp.concatenate(
        [fe_n, jnp.full((n_pad - n,), jnp.inf, jnp.float32)]
    ).reshape(1, n_pad)


@jax.jit
def _gather_fe(fe_2d, perm):
    """Re-lay a padded (1, N_pad) fe vector to another frame order via a
    cached device permutation (position p of the target order -> source
    position; pads map to pads, so inf padding is preserved). Bit-exact
    gather -- replaces the thread's host permutation pass + second
    upload."""
    return fe_2d[0][perm].reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("row_block",))
def _row_ub(stacked_d, perm, row_block):
    """Per-row-block upper bounds from a stacked (2, N_pad) band result:
    per-frame max of the [nh; hd] distances, permuted into the candidate
    order, reduced over each row block. Returns (N_pad // row_block,)."""
    ub = jnp.maximum(stacked_d[0, :], stacked_d[1, :])
    return ub[perm].reshape(-1, row_block).max(axis=1)


@functools.partial(jax.jit, static_argnames=("row_block",))
def _row_ub2(stacked_d, perm_a, perm_b, row_block):
    """Both candidate orders' row-block bounds in one dispatch/readback
    (each device->host round-trip costs real latency through remote-TPU
    tunnels). Returns (2, N_pad // row_block)."""
    return jnp.stack([_row_ub(stacked_d, perm_a, row_block),
                      _row_ub(stacked_d, perm_b, row_block)])


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
        # serializes the lazy cache builders below: the precompile warm
        # threads race the main thread to the same layouts, and without
        # this a 4M-frame engine ran the morton sort and the 64MB coords
        # upload TWICE on a single-core host (measured ~5s of warm-on
        # pops regression in WARMAB_r04). Double-checked: hits stay
        # lock-free (dict reads of fully built values are safe).
        self._build_lock = threading.RLock()
        # memoized device-plan products (see _pops_plan_products):
        # shared between the precompile warm thread and the stage
        self._pops_plan_lock = threading.Lock()
        self._pops_plan_cache = {}
        # per-stage compute accounting (computed = post-pruning tiles
        # actually swept; effective = the N^2 the algorithm replaces) --
        # populated by populations()/nearest_neighbors(), consumed by
        # bench.py's MFU reporting and verbose logs
        self.last_stats = {}
        # winning NN frame order of the previous nearest_neighbors call;
        # the speculative tiered dispatch bets on it repeating
        self._nn_spec_name = None
        # per-device real tile counts of the last mesh NN dispatch
        # (balance evidence for dryrun/bench artifacts)
        self._last_mesh_tiles = None
        # stash of an NN band phase dispatched during populations()
        # (consumed at most once by the next nearest_neighbors call)
        self._band_prefetch = None

    # -- cached layouts ----------------------------------------------------

    def _padded(self, name):
        if name not in self._orders:
            with self._build_lock:
                if name in self._orders:
                    return self._orders[name]
                if name == "orig":
                    order = None
                    sorted_coords = self.coords
                elif name == "dim0":
                    order = np.argsort(self.coords[:, 0], kind="stable")
                    sorted_coords = self.coords[order]
                elif name == "morton":
                    # one native pass for order + permuted padded layout
                    # (bit-identical to the numpy path): the numpy
                    # morton keys + 256MB fancy-index permute cost
                    # 32-52s of the pops plan at 16M (BIGN_r05
                    # morton_pad)
                    native = textio_native.morton_order_pad(
                        self.coords, n_pad=self.n_pad)
                    if native is not None:
                        self._orders[name] = native
                        return self._orders[name]
                    order = pruning.morton_order(self.coords)
                    sorted_coords = self.coords[order]
                else:
                    raise ValueError(name)
                padded = np.zeros((self.n_pad, self.d), dtype=np.float32)
                padded[:self.n] = sorted_coords
                padded[self.n:] = np.float32(3e38)
                self._orders[name] = (order, padded)
        return self._orders[name]

    def _put(self, x):
        """Host array -> device; replicated over the mesh when one is
        set (so jitted programs never re-broadcast a single-device
        upload per dispatch, and multi-process jit accepts it)."""
        if self.mesh is not None:
            from ..parallel.mesh import replicated
            return replicated(np.ascontiguousarray(x), self.mesh)
        return jnp.asarray(x)

    def _device(self, name):
        if name not in self._dev:
            with self._build_lock:
                if name not in self._dev:
                    _, padded = self._padded(name)
                    # uploaded ONCE per engine (16MB at 1M x 4); the
                    # stateless mesh path re-uploaded per call
                    self._dev[name] = self._put(
                        padded.T if self.backend == "pallas" else padded)
        return self._dev[name]

    def _get(self, x):
        """Device -> host numpy (accepts a pytree; one fused fetch);
        multi-process-safe when a mesh is set (a replicated global array
        is not fully addressable on DCN meshes, so jax.device_get would
        reject it)."""
        if self.mesh is not None:
            from ..parallel.mesh import fetch
            return fetch(x)
        return jax.tree_util.tree_map(np.asarray, jax.device_get(x))

    def _oid_dev(self, name):
        """Device (1, N_pad) int32 original-id vector for ``name``'s
        layout (pads carry IMAX), cached per engine: it is fe-independent,
        and re-uploading 4MB per layout per nearest_neighbors call was
        measurable on the band-prefetch thread through the tunnel."""
        key = ("oid", name)
        if key not in self._dev:
            with self._build_lock:
                if key not in self._dev:
                    order, _ = self._padded(name)
                    oid = np.full(self.n_pad, np.iinfo(np.int32).max,
                                  dtype=np.int32)
                    oid[:self.n] = (np.arange(self.n, dtype=np.int32)
                                    if order is None else order)
                    self._dev[key] = self._put(oid.reshape(1, self.n_pad))
        return self._dev[key]

    def _d2b_dev(self, name):
        """Device-resident (nrb, ncb) bbox distance matrix for ``name``'s
        layout: the host bbox_dist2 is the cold-start wall at production
        N (~11s per order at 4M frames, minutes at 16M on this host);
        one device dispatch computes it in milliseconds and threshold
        compares download 1/32nd-packed bit planes."""
        key = ("d2b", name)
        if key not in self._dev:
            with self._build_lock:
                if key not in self._dev:
                    if self.backend == "pallas":
                        ct = self._device(name)  # (D, N_pad)
                    else:
                        ct = jnp.asarray(self._padded(name)[1].T)
                    self._dev[key] = pruning.bbox_d2_device(
                        ct, row_block=self.row_block,
                        col_block=self.col_block)
        return self._dev[key]

    def _col_bboxes(self, name):
        """Column-block (mins, maxs) for ``name``'s padded layout."""
        key = ("colbb", name)
        if key not in self._bboxes:
            with self._build_lock:
                if key not in self._bboxes:
                    _, padded = self._padded(name)
                    self._bboxes[key] = pruning.block_bboxes(
                        padded, self.col_block)
        return self._bboxes[key]

    def _host_perm(self, src_name, dst_name):
        """Host permutation: position p of ``dst_name`` order -> position
        of the same frame in ``src_name`` order (pads map to themselves)."""
        key = ("hostperm", src_name, dst_name)
        if key not in self._orders:
            with self._build_lock:
                if key in self._orders:
                    return self._orders[key]
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
            with self._build_lock:
                if key in self._dev:
                    return self._dev[key]
                src_order, _ = self._padded(src_name)
                dst_order, _ = self._padded(dst_name)
                perm = np.arange(self.n_pad, dtype=np.int32)
                rank_src = np.empty(self.n, dtype=np.int32)
                if src_order is None:
                    rank_src[:] = np.arange(self.n, dtype=np.int32)
                else:
                    rank_src[src_order] = np.arange(self.n,
                                                    dtype=np.int32)
                perm[:self.n] = (rank_src if dst_order is None
                                 else rank_src[dst_order])
                self._dev[key] = self._put(perm)
        return self._dev[key]

    def _log_stats(self, stage, st):
        """Verbose compute accounting: computed (post-pruning) tiles vs the
        full N^2 the stage replaces -- the bench's MFU numbers, surfaced in
        the CLI's -v logs."""
        from ..utils.logger import is_verbose, logger
        if not is_verbose():
            return
        computed = st["computed_tiles"] * float(st["tile_pairs"])
        frac = computed / st["effective_pairs"] if st["effective_pairs"] else 0.0
        mode = ("" if "mode" not in st else
                f", {st['mode']} phase 2" if stage == "nn" else
                f", {st['mode']}")
        # tiles cover the padded grid, so the fraction can exceed 100% on
        # toy inputs smaller than one tile row
        logger(f"    [{stage}: {st['computed_tiles']} tiles computed ="
               f" {frac:.1%} of N^2 incl. padding{mode}]")

    def precompile_nn(self, band_blocks=4):
        """Best-effort background warm of the NN path's compiled programs.

        The cold 1M-frame CLI wall is compile-dominated (~3-5s per
        distinct program through a remote-TPU compiler), and the remote
        compiler parallelizes across threads (measured: 2 concurrent
        compiles in the time of a fraction of one serial). Calling this
        from a daemon thread while populations() compiles+runs overlaps
        the NN stage's compiles with the pops stage; the reference's AOT
        binary pays no compile at all (clustering.cpp), so this is how
        the JIT path approaches its cold start.

        Every call here uses freshly built zero arrays with EXACTLY the
        avals the real NN call produces (shape-identical dummy calls
        populate the same jit cache); tile contents are degenerate
        repeats, whose compute the kernels elide, so device time is
        negligible. Data-dependent shapes (phase-2 chunk counts) are
        warmed for the common large-N cases; a miss just compiles lazily
        as before. Never raises."""
        if self.backend != "pallas" or self.mesh is not None:
            return
        try:
            from . import pallas_kernels as pk
            n, n_pad, d = self.n, self.n_pad, self.d
            rb, cb = self.row_block, self.col_block
            nrb, ncb = n_pad // rb, n_pad // cb
            coords0 = jnp.zeros((d, n_pad), jnp.float32)
            fe2d = jnp.zeros((1, n_pad), jnp.float32)
            oid2d = jnp.zeros((1, n_pad), jnp.int32)
            perm0 = jnp.zeros((n_pad,), jnp.int32)
            # band sweep: the band tile list is fe-independent, so its
            # stacked chunk shape (and the scan program) is exact
            if ncb > 2 * band_blocks and self._device_plan_on() \
                    and self._nn_bidir_ok():
                # device planning: warm the windowed group programs with
                # degenerate zero chunks at the production bucket shapes
                # (the host band_mask below would materialize a 537MB
                # matrix at 16M frames just to warm a jit cache)
                span = self._nn_span()
                band_dev = pruning.bidir_closure_device(
                    pruning.band_mask_device(nrb, ncb, rb, cb,
                                             band_blocks * cb), rb, cb)
                wc = self._get(pruning.window_counts_device(band_dev,
                                                            span))
                windows = self._nn_windows_dev(band_dev, wc, span)
                if windows:
                    pk.nn_tiles_bidir_windows(coords0, fe2d, oid2d,
                                              np.int32(n), windows,
                                              row_block=rb, col_block=cb)
                # the big phase-2 lists run full-bucket chunks in
                # DISPATCH_CHUNK_GROUP-sized dispatches (the tail group
                # pads to the same shape); warm that exact program at
                # every production window width -- compile + executable
                # load + first execution are the one-time big-N costs.
                # Zero chunks repeat tile (0, 0), whose compute the
                # kernel elides after the first grid step.
                g = pk.DISPATCH_CHUNK_GROUP
                zg = jnp.zeros((g, pruning.MAX_TILE_ENTRIES), jnp.int32)
                for w in sorted({min(span, ncb - base)
                                 for base in range(0, ncb, span)}):
                    pk.nn_tiles_bidir_windows(
                        coords0, fe2d, oid2d, np.int32(n),
                        [(0, w, zg, zg)], row_block=rb, col_block=cb)
            elif ncb > 2 * band_blocks:
                band = pruning.band_mask(nrb, ncb, rb, cb,
                                         band_blocks * cb)
                if self._nn_bidir_ok():
                    band = pruning.bidir_closure(band, rb, cb)
                tiles = pruning.tile_list(band)
                if tiles is not None:
                    pk.nn_tiles_bidir_all(
                        coords0, fe2d, oid2d, np.int32(n), tiles[0],
                        tiles[1], row_block=rb, col_block=cb,
                        max_acc_bytes=self.NN_BIDIR_SCRATCH_CAP)
                    # phase 2 at production N runs full 2^16 buckets;
                    # warm the 2-chunk scan too when it would differ
                    if tiles[0].shape != (2, 1 << 16) and n >= (1 << 20):
                        z2 = np.zeros((2, 1 << 16), np.int32)
                        pk.nn_tiles_bidir_all(
                            coords0, fe2d, oid2d, np.int32(n), z2, z2,
                            row_block=rb, col_block=cb,
                            max_acc_bytes=self.NN_BIDIR_SCRATCH_CAP)
            # bound reduction + packed planes
            _row_ub2(jnp.zeros((2, n_pad), jnp.float32), perm0, perm0,
                     row_block=rb)
            pruning._pack_le_rows2(jnp.zeros((nrb, ncb), jnp.float32),
                                   jnp.zeros((nrb, ncb), jnp.float32),
                                   jnp.zeros((2, nrb), jnp.float32))
            # tiered-bidir plan + finish programs
            n_tiers = len(self.TIER_QS_DEFAULT) + 1
            _ub_tiers(jnp.zeros((2, n_pad), jnp.float32), jnp.int32(n),
                      qs=tuple(self.TIER_QS_DEFAULT))
            tier0u8 = jnp.zeros((n_pad,), jnp.uint8)
            tier0, perm0_t = _tier_sort_perm(tier0u8, perm0, jnp.int32(n),
                                             jnp.int32(n_tiers))
            taus0 = jnp.zeros((len(self.TIER_QS_DEFAULT),), jnp.float32)
            # both pack variants occur in production (speculative
            # dispatch packs; the spec-miss / device-plan re-dispatch
            # keeps the mask on device) -- warm both, the heavy sort is
            # shared through _tier_sort_perm
            for pk_pack in (True, False):
                _tiered_layout_sym(coords0,
                                   jnp.zeros((n_pad,), jnp.float32),
                                   tier0, tier0, taus0, perm0_t,
                                   row_block=rb, col_block=cb,
                                   n_tiers=n_tiers, pack=pk_pack)
            ids0 = jnp.zeros((2, n_pad), jnp.int32)
            _unpermute_cols(ids0, perm0)
            # warm the finish the real call will select (at production N
            # with the native lib that is the ids-only host finish, not
            # the fused device one)
            if _nn_finish_mode(n) == "host":
                # precompile only runs without a mesh (early return
                # above), so the runtime gate's mesh check is moot here
                k_chunks = _nn_finish_chunks(n)
                if k_chunks > 1 and textio_native.available():
                    _nn_finish_idx_chunked(ids0, perm0, n, k_chunks)
                elif (n <= (1 << 24) - 2
                      and textio_native.has_nn_finish_u24()):
                    _nn_finish_idx_u24(ids0, perm0, n)
                else:
                    _nn_finish_idx(ids0, perm0, n)
            else:
                _nn_finish(ids0, perm0, coords0, n)
        except Exception:  # best-effort: a warm miss only delays compiles
            pass

    def precompile_pops(self, radii, prune=True):
        """Best-effort background warm of the populations path.

        Runs the REAL host plan (best-sort readbacks, packed activity
        planes, tile list + radius masks -- the same device programs the
        main-thread populations() call uses, shared through the jit
        cache and the engine's layout caches) and then compiles the
        bidirectional sweep at the exact stacked chunk shapes against
        zeroed coordinates, so a concurrent populations() finds every
        program warm or co-compiling. Same rationale as precompile_nn:
        the remote-TPU compiler parallelizes across threads and the
        reference's AOT binary pays no compile at all
        (/root/reference/src/clustering.cpp:67). Never raises."""
        if self.backend != "pallas" or self.mesh is not None:
            return
        try:
            from . import pallas_kernels as pk
            radii = list(radii)
            self._warm_pops_download(len(radii))
            radii2 = jnp.asarray(
                [np.float32(r) * np.float32(r) for r in radii],
                dtype=jnp.float32)
            r_max2 = np.float32(max(radii)) * np.float32(max(radii))
            bidir = prune and self._pops_bidir_ok(len(radii))
            if not (prune and bidir):
                return
            if self._device_plan_on():
                # device-plan path (big N): the tile-list shapes are
                # count-dependent (warmed lazily), but the expensive
                # one-time costs ARE warmable -- the windowed sweep
                # programs (compile + executable load + accumulator
                # allocation; ~150s of a cold 16M run, CLAUDE.md) with
                # one group of no-op chunks per production window
                # width, and the plan programs through the engine's
                # cached d2b
                from .pallas_kernels import DISPATCH_CHUNK_GROUP as g
                ncb = self.n_pad // self.col_block
                span = min(max(int(self.POPS_BIDIR_SCRATCH_CAP
                                   // (self.col_block * 4 * len(radii))),
                               1), ncb)
                bucket = pruning.MAX_TILE_ENTRIES
                ti0 = jnp.zeros((g, bucket), jnp.int32)
                tj0 = jnp.full((g, bucket), -1, jnp.int32)
                rm0 = jnp.zeros((g, bucket), jnp.int32)
                coords0 = jnp.zeros((self.d, self.n_pad), jnp.float32)
                widths = sorted({min(span, ncb - base)
                                 for base in range(0, ncb, span)})
                for w in widths:
                    pk.pops_tiles_bidir_windows(
                        coords0, radii2, np.int32(self.n),
                        [(0, w, ti0, tj0, rm0)],
                        row_block=self.row_block,
                        col_block=self.col_block)
                # build the REAL plan products (threshold planes, active
                # mask, window counts, quantized per-window tile lists +
                # radius masks) through the memoized helper: the stage
                # reuses the same device buffers instead of rebuilding
                # (duplicated planning state OOM'd the chip at 16M)
                name = self._best_sort(r_max2)
                self._pops_plan_products(name, radii, r_max2, 0)
                return
            name = self._best_sort(r_max2)
            planes = pruning.active_masks_device(
                self._d2b_dev(name),
                [r_max2] + [np.float32(r) * np.float32(r) for r in radii])
            active = planes[0]
            nrb, ncb = active.shape
            ri = np.arange(nrb)[:, None]
            cj = np.arange(ncb)[None, :]
            active = active & ((cj + 1) * self.col_block
                               > ri * self.row_block)
            tiles = pruning.tile_list(active, pad_mode="noop")
            rmask = self._pops_rmask(tiles[0], tiles[1], planes,
                                     len(radii), prune)
            coords0 = jnp.zeros((self.d, self.n_pad), jnp.float32)
            pk.pops_tiles_bidir_all(
                coords0, radii2, np.int32(self.n), tiles[0], tiles[1],
                rmask, row_block=self.row_block, col_block=self.col_block,
                max_acc_bytes=self.POPS_BIDIR_SCRATCH_CAP)
        except Exception:  # best-effort: a warm miss only delays compiles
            pass

    def _best_sort(self, thresh2):
        """Pick the ordering (dim0 vs morton) with the higher measured tile
        skip fraction at this radius (device compare, scalar readback),
        cached per radius: the warm thread and the main stage ask for the
        same threshold, and each miss costs two tunnel readbacks."""
        key = ("bestsort", float(thresh2))
        if key not in self._orders:
            with self._build_lock:
                if key in self._orders:
                    return self._orders[key]
                best, best_frac = None, -1.0
                # per-order walls for the device-plan breakdown: pad =
                # the host sort order + padded layout, d2b = the bbox
                # matrix dispatch (+ coords upload on a cache miss),
                # frac = the scalar readback that forces it all
                prof = {}
                for name in ("dim0", "morton"):
                    t_p = time.perf_counter()
                    self._padded(name)
                    prof[f"{name}_pad"] = time.perf_counter() - t_p
                    t_p = time.perf_counter()
                    d2b = self._d2b_dev(name)
                    prof[f"{name}_d2b_dispatch"] = time.perf_counter() - t_p
                    t_p = time.perf_counter()
                    frac = float(self._get(_skip_frac(
                        d2b, jnp.float32(thresh2))))
                    prof[f"{name}_frac_fetch"] = time.perf_counter() - t_p
                    if frac > best_frac:
                        best, best_frac = name, frac
                self._best_sort_prof = {k: round(v, 3)
                                        for k, v in prof.items()}
                self._orders[key] = best
        return self._orders[key]

    # VMEM budget for the bidirectional pops kernel's column accumulator
    # (the kernel raises XLA's conservative 16MB scoped limit; v5e
    # accepts >=120MB, measured). Larger runs split into column-range
    # partitions inside pops_tiles_bidir_all -- no frame-count cap.
    POPS_BIDIR_SCRATCH_CAP = 64 << 20

    def _pops_bidir_ok(self, n_radii):
        if self.POPS_BIDIR_SCRATCH_CAP <= 0:
            return False
        from .pallas_kernels import INTERPRET_MODE
        if not INTERPRET_MODE() and self.col_block % 128 != 0:
            return False
        return True

    # -- ops ---------------------------------------------------------------

    def populations(self, radii, prune=True, nn_band_radius=None):
        """``nn_band_radius``: when set to one of ``radii``, the NN band
        phase is prefetched from that radius's counts as soon as the
        pops sweep lands (fe computed host-side bit-equal to
        ops.free_energies), overlapping the counts download and the
        pops->nn inter-stage work; the next nearest_neighbors call
        consumes it only if its fe matches bit-for-bit."""
        if self.mesh is not None and self.backend != "pallas":
            # dense row-ownership XLA program (CPU meshes, smoke runs)
            from ..parallel import sharded
            return sharded.populations(self.coords, list(radii), self.mesh,
                                       row_block=self.row_block,
                                       col_block=self.col_block,
                                       backend=self.backend, prune=prune)
        t0 = time.perf_counter()
        radii = list(radii)
        radii2 = jnp.asarray([np.float32(r) * np.float32(r) for r in radii],
                             dtype=jnp.float32)
        if self.backend != "pallas":
            counts = dops._populations_padded(
                self._device("orig"), radii2, jnp.int32(self.n),
                row_block=self.row_block, col_block=self.col_block)
            return self._pops_finish(np.asarray(jax.device_get(counts)),
                                     None, radii)
        from . import pallas_kernels as pk
        self._warm_pops_download(len(radii))
        r_max2 = np.float32(max(radii)) * np.float32(max(radii))
        bidir = prune and self._pops_bidir_ok(len(radii))
        if prune and bidir and self._device_plan_on():
            # device planning runs under a mesh too (round 5): masks and
            # tile lists stay on device, the per-window lists are dealt
            # round-robin over the chips there, and only the (W,) window
            # counts cross to the host
            return self._populations_device_plan(radii, radii2, r_max2,
                                                 nn_band_radius, t0)
        planes = None
        if prune:
            name = self._best_sort(r_max2)
            # one device dispatch + packed-bit download per threshold:
            # the active mask at r_max and the per-radius planes the
            # rmask gathers from (the host bbox matrix never materializes)
            planes = pruning.active_masks_device(
                self._d2b_dev(name),
                [r_max2] + [np.float32(r) * np.float32(r) for r in radii])
            active = planes[0]
            if bidir:
                # upper-triangular tile list for the bidirectional count
                # kernel: each unordered pair evaluated once
                nrb, ncb = active.shape
                ri = np.arange(nrb)[:, None]
                cj = np.arange(ncb)[None, :]
                active = active & ((cj + 1) * self.col_block
                                   > ri * self.row_block)
        else:
            name = "orig"
            active = np.ones((self.n_pad // self.row_block,
                              self.n_pad // self.col_block), dtype=bool)
        order, _ = self._padded(name)
        if self.mesh is not None:
            return self._pops_dispatch_mesh(name, order, radii, radii2,
                                            active, planes, prune, bidir,
                                            t0)
        tiles = pruning.tile_list(active, pad_mode="noop")
        rmask = self._pops_rmask(tiles[0], tiles[1], planes, len(radii),
                                 prune)
        stats = {
            "computed_tiles": int((tiles[1] >= 0).sum()),
            "tile_pairs": self.row_block * self.col_block,
            "effective_pairs": float(self.n) * self.n,
            "mode": "bidir" if bidir else "symmetric",
        }
        self.last_stats["populations"] = stats
        self._log_stats("pops", stats)
        stats["t_plan"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        if bidir:
            acc = pk.pops_tiles_bidir_all(
                self._device(name), radii2, np.int32(self.n),
                tiles[0], tiles[1], rmask,
                row_block=self.row_block, col_block=self.col_block,
                max_acc_bytes=self.POPS_BIDIR_SCRATCH_CAP)
        else:
            acc = pk.pops_tiles_sparse_all(self._device(name), radii2,
                                           np.int32(self.n),
                                           tiles[0], tiles[1], rmask=rmask,
                                           row_block=self.row_block,
                                           col_block=self.col_block)
        band = None
        if (nn_band_radius in radii and self.mesh is None
                and os.environ.get("CLUSTERING_TPU_NN_PREFETCH") != "0"):
            band = (radii.index(nn_band_radius), name)
        counts_host = self._pops_download(acc, stats, t0, band=band)
        stats["t_sweep"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = self._pops_finish(counts_host, order, radii)
        stats["t_host"] = time.perf_counter() - t0
        return out


    def _pops_plan_products(self, name, radii, r_max2, n_dev):
        """Memoized device-plan products for populations: threshold
        planes, the upper-triangular active mask, the (W,) window-count
        fetch and the per-window quantized tile lists + radius masks.
        Shared between precompile_pops' warm thread and the production
        stage: each building its own copy duplicated ~4GB of device
        planning state at 16M frames and OOM'd the chip -- whoever
        arrives first builds, the other blocks briefly and reuses the
        SAME device buffers. Returns (span, counts_w, windows, prof)."""
        from . import pruning
        key = (name, tuple(float(r) for r in radii), float(r_max2),
               int(n_dev))
        with self._pops_plan_lock:
            hit = self._pops_plan_cache.get(key)
            if hit is not None:
                span, counts_w, windows, prof = hit
                return span, counts_w, windows, dict(prof,
                                                     plan_cache_hit=True)
            prof = {}
            t_seg = time.perf_counter()
            thresh2s = jnp.asarray(
                [r_max2] + [np.float32(r) * np.float32(r) for r in radii],
                dtype=jnp.float32)
            planes_dev = pruning.le_planes_device(self._d2b_dev(name),
                                                  thresh2s)
            active_dev = pruning.upper_tri_device(
                planes_dev[0], self.row_block, self.col_block)
            ncb = self.n_pad // self.col_block
            span = min(max(int(self.POPS_BIDIR_SCRATCH_CAP
                               // (self.col_block * 4 * len(radii))), 1),
                       ncb)
            counts_w = self._get(
                pruning.window_counts_device(active_dev, span))
            prof["t_window_counts"] = time.perf_counter() - t_seg
            t_seg = time.perf_counter()

            def _win_plan(w_base):
                w, base = w_base
                c = int(counts_w[w])
                if c == 0:
                    return None
                width = min(span, ncb - base)
                if n_dev:
                    # per-window round-robin deal over the chips, ON
                    # DEVICE: the host never materializes the O(tiles)
                    # list under a mesh either
                    ti_st, tj_st, _ = pruning.tile_list_device_split(
                        active_dev, c, n_dev, pad_mode="noop", base=base,
                        width=width)
                else:
                    # noop pads tolerate repeat-quantized chunk counts
                    # (tj=-1 entries carry rmask 0 and are skipped), so
                    # the static nonzero total is a power of two:
                    # equal-width windows share ONE compiled tile-list
                    # program instead of one per active-tile count (each
                    # cost a fresh remote compile + first executable
                    # load, 10-40s at 16M -- t_tile_lists 153s in the
                    # first BIGN_r05 probe)
                    ti_st, tj_st = pruning.tile_list_device(
                        active_dev, c, pad_mode="noop", base=base,
                        width=width, quantize_chunks=True)
                rm_st = pruning.rmask_gather_device(planes_dev[1:],
                                                    ti_st, tj_st)
                return (base, width, ti_st, tj_st, rm_st)
            bases = list(enumerate(range(0, ncb, span)))
            if len(bases) > 1:
                # distinct residual programs compile/load CONCURRENTLY
                # (the axon remote compiler parallelizes across threads;
                # dispatch order does not affect result composition)
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(
                        max_workers=min(4, len(bases))) as ex:
                    windows = [win for win in ex.map(_win_plan, bases)
                               if win is not None]
            else:
                windows = [win for win in map(_win_plan, bases)
                           if win is not None]
            prof["t_tile_lists"] = time.perf_counter() - t_seg
            out = (span, counts_w, windows, prof)
            self._pops_plan_cache[key] = out
            while len(self._pops_plan_cache) > 1:
                self._pops_plan_cache.pop(
                    next(iter(self._pops_plan_cache)))
            return span, counts_w, windows, dict(prof)

    def _populations_device_plan(self, radii, radii2, r_max2,
                                 nn_band_radius, t0):
        """Device-planned populations (big N, bidirectional): threshold
        planes, the upper-triangular active mask, per-window tile lists
        and the per-tile radius masks all stay ON DEVICE
        (pruning.tile_list_device / rmask_gather_device); the only
        planning transfer is one (W,) window-count fetch. At 16M frames
        the host plan moved ~270MB of packed planes + built 537MB masks
        (BIGN_r03 big_pops 1027s); this path replaces all of it."""
        from . import pallas_kernels as pk
        # plan sub-stage walls (VERDICT r4 item 6: the 62s device t_plan
        # at 16M shipped as one opaque number). Each segment ends at a
        # host sync or covers pure dispatch, so the deltas are real:
        # best_sort = host sort orders + padded layouts + device bbox
        # matrices + the two skip-fraction readbacks (per-order detail in
        # plan_best_sort_parts), window_counts = mask dispatches + the
        # (W,) count fetch (absorbs all queued device plan work),
        # tile_lists = the per-window nonzero/rmask dispatches (async;
        # any residue here is compile time for count-dependent shapes).
        plan_parts = {}
        t_seg = time.perf_counter()
        name = self._best_sort(r_max2)
        plan_parts["t_best_sort"] = time.perf_counter() - t_seg
        if getattr(self, "_best_sort_prof", None):
            plan_parts["plan_best_sort_parts"] = self._best_sort_prof
        order, _ = self._padded(name)
        n_dev = 0
        if self.mesh is not None:
            from ..parallel.mesh import mesh_size
            n_dev = mesh_size(self.mesh)
        span, counts_w, windows, prof = self._pops_plan_products(
            name, radii, r_max2, n_dev)
        plan_parts.update(prof)
        n_tiles = int(counts_w.sum())
        stats = {
            "computed_tiles": n_tiles,
            "tile_pairs": self.row_block * self.col_block,
            "effective_pairs": float(self.n) * self.n,
            "mode": "bidir-mesh" if n_dev else "bidir",
            "plan": "device",
        }
        if n_dev:
            stats["mesh_devices"] = n_dev
        self.last_stats["populations"] = stats
        self._log_stats("pops", stats)
        stats["t_plan"] = time.perf_counter() - t0
        stats["plan_parts"] = plan_parts
        t0 = time.perf_counter()
        if n_dev:
            # mesh twin of pops_tiles_bidir_windows: each window's split
            # chunks sweep under shard_map, rows+placed cols psum over
            # ICI inside the program, windows compose on device and the
            # diagonal is added once (src/density_clustering_cuda.cu:
            # 139-182 runs the full algorithm per GPU the same way)
            from ..parallel import sharded
            acc = None
            for base, width, ti_st, tj_st, rm_st in windows:
                rows, cols = sharded._pops_sharded_bidir_window(
                    self._device(name), radii2, jnp.int32(self.n),
                    ti_st, tj_st, rm_st, jnp.int32(base), self.mesh,
                    row_block=self.row_block, col_block=self.col_block,
                    col_span=width)
                part = rows + pk._place_cols_sum(
                    cols, base * self.col_block, self.n_pad)
                acc = part if acc is None else acc + part
            if acc is None:
                acc = jnp.zeros((len(radii), self.n_pad), jnp.int32)
            acc = pk._add_self_count(acc, jnp.int32(self.n))
        else:
            acc = pk.pops_tiles_bidir_windows(
                self._device(name), radii2, np.int32(self.n), windows,
                row_block=self.row_block, col_block=self.col_block)
        band = None
        if nn_band_radius in radii and self._band_prefetch_ok():
            band = (radii.index(nn_band_radius), name)
        counts_host = self._pops_download(acc, stats, t0, band=band)
        stats["t_sweep"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = self._pops_finish(counts_host, order, radii)
        stats["t_host"] = time.perf_counter() - t0
        return out

    # counts whose per-radius maximum fits uint16 download at half the
    # bytes (the counts transfer is the pops stage's largest non-kernel
    # cost through remote-TPU tunnels: 12MB -> 6MB at 1M x 3 radii);
    # tests lower this to force the int32 fallback on small inputs
    POPS_COUNTS_NARROW_MAX = np.iinfo(np.uint16).max

    def _warm_pops_download(self, n_radii):
        """Warm the counts-download narrowing programs (per-radius max +
        uint16 copy) on a daemon thread: two tiny compiles that would
        otherwise land serially after the first cold pops sweep (~s each
        through a remote compiler, which parallelizes across threads --
        same rationale as precompile_nn). One-shot per (engine, R)."""
        if self.mesh is not None:
            return
        warmed = getattr(self, "_pops_dl_warmed", None)
        if warmed is None:
            warmed = self._pops_dl_warmed = set()
        if n_radii in warmed:
            return
        warmed.add(n_radii)

        def _warm():
            try:
                acc0 = jnp.zeros((n_radii, self.n_pad), jnp.int32)
                jnp.max(acc0, axis=1)
                acc0.astype(jnp.uint16)
            except Exception:  # best-effort warm
                pass

        import threading
        threading.Thread(target=_warm, daemon=True).start()

    def _pops_download(self, acc, stats, t0, band=None):
        """Fetch the (R, N_pad) int32 count accumulator, narrowed to
        uint16 when every radius's maximum fits: the per-radius maxima
        ride a tiny scalar fetch that doubles as the device-done barrier
        (kernel vs download split), and the u16 copy is dispatched
        before the barrier so the narrow path costs no extra device
        round-trip after the decision.

        ``band`` = (radius_index, layout_name) requests the NN band
        prefetch: that radius's counts row, re-laid-out to the band
        (Morton) order -- gathered from the u16 cast when it exists
        (2 bytes/frame; exact whenever THIS radius's maximum fits, which
        the maxima readback verifies) -- rides the SAME barrier fetch.
        The counts D2H is then requested asynchronously BEFORE the band
        phase dispatches (so the download streams while the band kernel
        runs instead of queueing behind it), and the fe + dispatch half
        runs on a daemon thread off this stage's wall."""
        maxima = jnp.max(acc, axis=1)
        # the u16 copy is speculative; once a call on this engine chose
        # int32 (overflow), later calls skip the wasted (R, N_pad) cast
        # and dispatch it lazily only if their maxima do fit
        acc_u16 = (None if getattr(self, "_pops_counts_wide", False)
                   else acc.astype(jnp.uint16))
        band_row = None
        if band is not None:
            ridx, name = band
            src = acc if acc_u16 is None else acc_u16
            band_row = src[ridx][self._ub_perm(name, "morton")]
        if band_row is None:
            mx = self._get(maxima)
        else:
            mx, row_host = self._get((maxima, band_row))
        if (os.environ.get("CLUSTERING_TPU_PROFILE_SUBSTAGES")
                and "t_kernel" not in stats):
            stats["t_kernel"] = time.perf_counter() - t0
        narrow = int(mx.max()) <= self.POPS_COUNTS_NARROW_MAX
        self._pops_counts_wide = not narrow
        if narrow:
            if acc_u16 is None:
                acc_u16 = acc.astype(jnp.uint16)
            buf = acc_u16
            stats["counts_dtype"] = "uint16"
        else:
            buf = acc
            stats["counts_dtype"] = "int32"
        if band_row is None:
            return self._get(buf)
        # enqueue the counts D2H first (the buffer exists -- its cast
        # ran before the barrier -- so this DMA is not blocked by the
        # band programs the thread is about to dispatch), then start
        # the fe + band-dispatch thread, then complete the download
        buf.copy_to_host_async()
        if (acc_u16 is not None
                and int(mx[band[0]]) > self.POPS_COUNTS_NARROW_MAX):
            # the u16 row truncated THIS radius (dense big-N counts):
            # refetch the exact int32 row instead of dropping the
            # prefetch -- one extra (N_pad,) D2H is far cheaper than
            # running the whole band phase in-stage (BIGN_r04 before
            # this refetch: nn t_band 134.7s at 16M frames because the
            # dropped prefetch pushed every band dispatch + compile
            # onto the NN wall)
            ridx, name = band
            row_host = self._get(
                acc[ridx][self._ub_perm(name, "morton")])
            stats["band_row_refetched"] = True
        if row_host is None:
            return np.asarray(buf)
        # gate the prefetch thread's host work (fe compute, layout
        # upload, band-program tracing) behind the counts download: on
        # this single-core host the thread contended with the transfer
        # handling and taxed pops ~0.27s to save NN 0.49s
        # (PREFETCH_AB_r04). Deferred, the thread's work overlaps the
        # pops host finish + the caller's inter-stage work (fe compute,
        # file writes) instead -- the device is idle during the download
        # either way, so the band kernels still run well before the NN
        # stage's selection fetch needs them.
        # default: dispatch the band phase immediately (no gate) -- the
        # thread's fe passes moved on device (_pad_fe/_gather_fe), so
        # the host contention the round-4 Event gate protected against
        # is gone, and gating only delayed the band kernels into the NN
        # stage. Paired A/B (BANDGATE_AB_r05.json, 2^20 best-of-3):
        # gate-off pops 1.033 vs 1.098, nn 1.225 vs 1.268, pipeline
        # 2.258 vs 2.421s, bit-equal. CLUSTERING_TPU_BAND_GATE=1
        # restores the contention-free download ordering.
        gate = None
        if os.environ.get("CLUSTERING_TPU_BAND_GATE", "0") == "1":
            gate = threading.Event()
        self._band_prefetch_start(row_host, stats, gate=gate)
        try:
            return np.asarray(buf)
        finally:
            if gate is not None:
                gate.set()

    def _pops_finish(self, counts_padded, order, radii):
        """Host postlude of a populations run: scatter-unsort the padded
        (R, N_pad) int32 download to original frame positions and widen
        to int64 -- one native pass when the library loads (the numpy
        scatter + per-radius astype cost 0.3-5s at 1M frames x 3 radii
        on this VM's in-situ numpy), numpy fallback otherwise."""
        res = textio_native.pops_finish(counts_padded, self.n, order)
        if res is not None:
            return {r: res[i] for i, r in enumerate(radii)}
        counts = counts_padded[:, :self.n]
        if order is not None:
            unsorted = np.empty_like(counts)
            unsorted[:, order] = counts
            counts = unsorted
        return {r: counts[i].astype(np.int64) for i, r in enumerate(radii)}

    @staticmethod
    def _pops_rmask(ti, tj, planes, n_radii, prune):
        """Per-tile radius bitmask: a tile whose bbox distance exceeds
        r^2 skips that radius's compare+count in the kernel (bit r
        unset); pads (tj = -1) carry mask 0 and skip the whole tile
        body. Works on tile-index arrays of any shape (chunked lists or
        per-device splits)."""
        if prune:
            rmask = np.zeros(ti.shape, dtype=np.int32)
            pad = tj < 0
            tj_safe = np.maximum(tj, 0)
            for r_idx in range(n_radii):
                rmask |= (planes[1 + r_idx][ti, tj_safe]
                          .astype(np.int32) << r_idx)
            rmask[pad] = 0
        else:
            rmask = np.where(tj >= 0, np.int32((1 << n_radii) - 1),
                             np.int32(0))
        return rmask

    def _pops_dispatch_mesh(self, name, order, radii, radii2, active,
                            planes, prune, bidir, t0):
        """Dispatch the planned populations tile list over the mesh: the
        list is round-robin balanced over chips
        (pruning.split_tiles_balanced, within one tile per device) and
        each chip sweeps its share with the same fused kernel under
        shard_map; one int32 psum over ICI merges the partials -- the
        TPU-native analog of the reference's host-side multi-GPU sum
        (src/density_clustering_cuda.cu:171-181). The planning (device
        bbox matrix, packed-plane downloads, order choice) is shared
        with the single-chip path, and the replicated frame matrix is
        uploaded once per engine, so per-call cost approaches the
        single-chip warm path plus one collective."""
        from . import pallas_kernels as pk
        from ..parallel import sharded
        from ..parallel.mesh import mesh_size, replicated
        ti, tj = np.nonzero(active)
        n_dev = mesh_size(self.mesh)
        ncb = self.n_pad // self.col_block
        # per-chip VMEM column-accumulator budget -> column-range
        # partition width (>= ncb means one full-range dispatch)
        span = ncb
        if bidir:
            span = max(int(self.POPS_BIDIR_SCRATCH_CAP
                           // (self.col_block * 4 * len(radii))), 1)
        stats = {
            "computed_tiles": int(len(ti)),
            "tile_pairs": self.row_block * self.col_block,
            "effective_pairs": float(self.n) * self.n,
            "mode": ("bidir" if bidir else "symmetric") + "-mesh",
            "mesh_devices": n_dev,
        }
        # sub-stage accounting mirrors the single-chip path: planning up
        # to here, sweep from the first dispatch (the windowed path's
        # in-loop balancing/rmask host work lands in the sweep segment)
        stats["t_plan"] = time.perf_counter() - t0
        t_sweep0 = time.perf_counter()
        if bidir and span < ncb:
            # mesh analog of pops_tiles_bidir_all's partitioning: each
            # window dispatches with a bounded per-chip accumulator, the
            # psum-merged windows compose on device -- no frame-count cap
            stats["col_partitions"] = 0
            per_dev_total = np.zeros(n_dev, dtype=np.int64)
            acc = None
            for base, width, sel in pruning.iter_col_windows(tj, ncb,
                                                             span):
                stats["col_partitions"] += 1
                ti_d, tj_d, per_dev = pruning.split_tiles_balanced(
                    ti[sel], tj[sel], n_dev, pad_mode="noop")
                per_dev_total += per_dev
                rmask_d = self._pops_rmask(ti_d, tj_d, planes,
                                           len(radii), prune)
                rows, cols = sharded._pops_sharded_bidir_window(
                    self._device(name), radii2, jnp.int32(self.n),
                    replicated(ti_d, self.mesh),
                    replicated(tj_d, self.mesh),
                    replicated(rmask_d, self.mesh),
                    jnp.int32(base), self.mesh,
                    row_block=self.row_block, col_block=self.col_block,
                    col_span=width)
                part = rows + pk._place_cols_sum(
                    cols, base * self.col_block, self.n_pad)
                acc = part if acc is None else acc + part
            acc = pk._add_self_count(acc, jnp.int32(self.n))
            stats["per_device_tiles"] = per_dev_total.tolist()
            counts_host = self._pops_download(acc, stats, t_sweep0)
            stats["t_sweep"] = time.perf_counter() - t_sweep0
            # log after the download so the line carries the narrowing
            # decision (counts_dtype) and a real kernel/sweep split
            self.last_stats["populations"] = stats
            self._log_stats("pops", stats)
            t_host0 = time.perf_counter()
            out = self._pops_finish(counts_host, order, radii)
            stats["t_host"] = time.perf_counter() - t_host0
            return out
        ti_d, tj_d, per_dev = pruning.split_tiles_balanced(
            ti, tj, n_dev, pad_mode="noop")
        rmask_d = self._pops_rmask(ti_d, tj_d, planes, len(radii), prune)
        stats["per_device_tiles"] = per_dev.tolist()
        fn = (sharded._pops_sharded_bidir if bidir
              else sharded._pops_sharded_sparse)
        acc = fn(self._device(name), radii2, jnp.int32(self.n),
                 replicated(ti_d, self.mesh), replicated(tj_d, self.mesh),
                 replicated(rmask_d, self.mesh), self.mesh,
                 row_block=self.row_block, col_block=self.col_block)
        counts_host = self._pops_download(acc, stats, t_sweep0)
        stats["t_sweep"] = time.perf_counter() - t_sweep0
        self.last_stats["populations"] = stats
        self._log_stats("pops", stats)
        t_host0 = time.perf_counter()
        out = self._pops_finish(counts_host, order, radii)
        stats["t_host"] = time.perf_counter() - t_host0
        return out

    # the bidirectional NN kernel holds 4 (2 x [nh; hd] x [d; j]) column
    # accumulators of N_pad lanes in VMEM; beyond this budget
    # nn_tiles_bidir_all splits the run into column-range partitions, so
    # there is NO frame-count cap (tests force partitioning by shrinking
    # this; 0 disables bidir entirely)
    NN_BIDIR_SCRATCH_CAP = 64 << 20

    def _nn_bidir_ok(self):
        if self.col_block % self.row_block != 0:
            return False
        if self.NN_BIDIR_SCRATCH_CAP <= 0:
            return False
        from .pallas_kernels import INTERPRET_MODE
        if not INTERPRET_MODE() and self.col_block % 128 != 0:
            return False
        return True

    def _nn_sparse_chunks(self, order_name, fe_dev, oid_dev, active,
                          bidir=False):
        """Run the sparse NN kernel over the active tiles, merging the
        stacked (2, N_pad) [nh; hd] outputs lexicographically across SMEM
        chunks. With ``bidir`` the mask must already be an
        upper-triangular closure (pruning.bidir_closure) and every tile
        serves both orientations.

        Under a mesh the SAME tile list is round-robin balanced over the
        chips and dispatched as the shard_map bidir/sparse NN program
        (parallel/sharded.py); partial results merge with the two-step
        lexicographic pmin over ICI, so the return contract is identical."""
        from . import pallas_kernels as pk
        if self.mesh is not None:
            return self._nn_dispatch_mesh(self._device(order_name),
                                          fe_dev, oid_dev, active, bidir)
        tiles = pruning.tile_list(active)
        if bidir:
            return pk.nn_tiles_bidir_all(
                self._device(order_name), fe_dev, oid_dev, np.int32(self.n),
                tiles[0], tiles[1], row_block=self.row_block,
                col_block=self.col_block,
                max_acc_bytes=self.NN_BIDIR_SCRATCH_CAP)
        return pk.nn_tiles_sparse_all(self._device(order_name), fe_dev,
                                      oid_dev, np.int32(self.n),
                                      tiles[0], tiles[1],
                                      row_block=self.row_block,
                                      col_block=self.col_block)

    # big-N device planning: above this padded frame count the host
    # planners' (nrb, ncb) boolean masks and packed-plane downloads are
    # the dominant cost (BIGN_r03 at 16M: t_plan 760s + t_band 1502s of
    # a 43-minute NN, ~537MB per mask and 67MB per plane through the
    # tunnel), so masks stay ON DEVICE and tile lists compact there
    # (pruning.tile_list_device); only scalar window counts cross to the
    # host. CLUSTERING_TPU_DEVICE_PLAN=1/0 forces it on/off (tests pin
    # bit-equality against the host planner by forcing both).
    DEVICE_PLAN_MIN_FRAMES = 1 << 22

    def _device_plan_on(self):
        env = os.environ.get("CLUSTERING_TPU_DEVICE_PLAN")
        if env == "0":
            return False
        if env == "1":
            return True
        return self.n_pad >= self.DEVICE_PLAN_MIN_FRAMES

    def _band_prefetch_ok(self):
        """The NN band prefetch dispatches device programs from a daemon
        thread; under a mesh those are COLLECTIVE programs, and
        multi-controller (DCN) runs need a deterministic cross-process
        dispatch order -- a thread racing the main thread's collectives
        can interleave differently per process and deadlock. Prefetch is
        therefore on for any single-process topology (one chip, or a
        whole single-host mesh) and off across processes."""
        if os.environ.get("CLUSTERING_TPU_NN_PREFETCH") == "0":
            return False
        return self.mesh is None or jax.process_count() == 1

    def _nn_span(self):
        """Column-window width (in col blocks) of the bidirectional NN
        sweeps' VMEM accumulator partitioning -- must mirror
        pallas_kernels.nn_tiles_bidir_all's policy so device planning
        emits the same windows."""
        ncb = self.n_pad // self.col_block
        return min(max(int(self.NN_BIDIR_SCRATCH_CAP
                           // (self.col_block * 16)), 1), ncb)

    def _nn_windows_dev(self, mask_dev, counts_w, span):
        """Per-column-window device tile chunks from a device closure
        mask and its host window counts (one prior scalar fetch)."""
        ncb = self.n_pad // self.col_block
        windows = []
        for w, base in enumerate(range(0, ncb, span)):
            c = int(counts_w[w])
            if c == 0:
                continue
            width = min(span, ncb - base)
            tiles = pruning.tile_list_device(mask_dev, c, base=base,
                                             width=width)
            windows.append((base, width, tiles[0], tiles[1]))
        return windows

    def _nn_windows_sweep(self, coords_dev, fe_dev, oid_dev, mask_dev,
                          counts_w, span):
        """Sweep a device-planned bidirectional NN closure mask by column
        windows. Single chip batches every window's device tile chunks
        into one nn_tiles_bidir_windows dispatch; under a mesh each
        window's row-major tile list is round-robin dealt over the chips
        ON DEVICE (pruning.tile_list_device_split -- no O(tiles) host
        list) and swept through the shard_map windowed kernel, partials
        folding through the idempotent lexicographic min exactly like
        _nn_dispatch_mesh. Returns stacked ((2, N_pad) d, (2, N_pad) j)
        or None when the mask is empty."""
        from . import pallas_kernels as pk
        if self.mesh is None:
            windows = self._nn_windows_dev(mask_dev, counts_w, span)
            if not windows:
                return None
            return pk.nn_tiles_bidir_windows(
                coords_dev, fe_dev, oid_dev, np.int32(self.n), windows,
                row_block=self.row_block, col_block=self.col_block)
        from ..parallel import sharded
        from ..parallel.mesh import mesh_size
        n_dev = mesh_size(self.mesh)
        ncb = self.n_pad // self.col_block
        out = None
        for w, base in enumerate(range(0, ncb, span)):
            c = int(counts_w[w])
            if c == 0:
                continue
            width = min(span, ncb - base)
            ti_d, tj_d, _ = pruning.tile_list_device_split(
                mask_dev, c, n_dev, pad_mode="repeat", base=base,
                width=width)
            od, oj, cd, cj = sharded._nn_sharded_bidir_window(
                coords_dev, fe_dev, oid_dev, jnp.int32(self.n),
                ti_d, tj_d, jnp.int32(base), self.mesh,
                row_block=self.row_block, col_block=self.col_block,
                col_span=width)
            placed = pk._place_cols(cd, cj, base * self.col_block,
                                    self.n_pad)
            part = pk._lex_min2((od, oj), placed)
            out = part if out is None else pk._lex_min2(out, part)
        return out

    def _nn_tiered_run_dev(self, handles, closure_dev, counts_w, span):
        """Device-planned twin of _nn_tiered_bidir_finish's run()."""
        rows_t, fe_rows, oid_rows, perm, _ = handles
        n_pad = self.n_pad

        def run():
            out = self._nn_windows_sweep(
                rows_t, fe_rows.reshape(1, n_pad),
                oid_rows.reshape(1, n_pad), closure_dev, counts_w, span)
            if out is None:
                return None
            return _unpermute_cols(out[1], perm)

        return run

    def _nn_tiered_plan_dev(self, winner, band_name, band_out, layout,
                            tier_qs, span):
        """Device-planned tiered phase 2 for a spec miss / forced tiers:
        dispatch the tiered layout with the mask kept as a device bool,
        close + window-count it there, fetch only the counts."""
        handles = self._nn_tiered_bidir_dispatch(
            winner, band_name, band_out, layout, tier_qs, pack=False)
        closure = pruning.bidir_closure_device(
            handles[4], self.row_block, self.col_block)
        counts_w = self._get(pruning.window_counts_device(closure, span))
        est = int(counts_w.sum())
        return est, self._nn_tiered_run_dev(handles, closure, counts_w,
                                            span)

    def _nn_band_dispatch(self, order_name, band_blocks, nn_bidir,
                          layout, speculate):
        """Dispatch every device program of the NN band phase with NO
        host sync: the banded sweep over sort-neighbor tiles (phase-1
        upper bounds), the per-row-block bound reduction, the packed
        activity planes for both candidate orders, and (``speculate``)
        the speculative tiered phase-2 plan on the previous call's
        winning order. Returns the handles the selection half consumes;
        shared by nearest_neighbors' inline path and the populations
        band prefetch (which overlaps all of this with the counts
        download + inter-stage host work).

        With device planning on (big N, bidirectional), every mask stays
        on device and the selection scalars (per-order work metrics,
        per-window closure tile counts, the speculative tiered plan's
        counts) come back in ONE bundled fetch the consumer performs;
        the only sync here is the band's own window-count readback (a
        few ints), which the prefetch path hides entirely."""
        from . import pallas_kernels as pk
        n_pad = self.n_pad
        rb, cb = self.row_block, self.col_block
        nrb, ncb = n_pad // rb, n_pad // cb
        _, _, fe_dev, oid_dev = layout(order_name)
        dev_plan = self._device_plan_on() and nn_bidir
        if dev_plan:
            band_active_dev = pruning.band_mask_device(
                nrb, ncb, rb, cb, band_blocks * cb)
            band_eff_dev = pruning.bidir_closure_device(band_active_dev,
                                                        rb, cb)
            span = self._nn_span()
            wc_band = self._get(
                pruning.window_counts_device(band_eff_dev, span))
            band_tiles = int(wc_band.sum())
            out1 = self._nn_windows_sweep(
                self._device(order_name), fe_dev, oid_dev, band_eff_dev,
                wc_band, span)
            band_active = band_eff = None
        else:
            # phase 1: banded pass over sort-neighbors -> per-frame
            # upper bounds (order-independent values)
            band_active = pruning.band_mask(nrb, ncb, rb, cb,
                                            band_blocks * cb)
            band_eff = (pruning.bidir_closure(band_active, rb, cb)
                        if nn_bidir else band_active)
            band_tiles = int(band_eff.sum())
            out1 = self._nn_sparse_chunks(order_name, fe_dev, oid_dev,
                                          band_eff, bidir=nn_bidir)
        # keep the per-frame bounds on device; per candidate order,
        # permute + reduce there and download only the per-row-block
        # maxima (device->host is the slow, flaky direction through
        # remote-TPU tunnels: nrb floats instead of N)
        row_ubs_dev = _row_ub2(
            out1[0], self._ub_perm(order_name, "dim0"),
            self._ub_perm(order_name, "morton"),
            row_block=rb)
        spec = spec_name = None
        acts_words = dev = None
        if dev_plan:
            # device selection handles: raw per-order activity masks for
            # the work metric, their bidirectional closures for the tile
            # lists, window counts of each closure; the consumer fetches
            # the scalar bundle in one round trip
            closures, works, wcs = {}, [], []
            for idx, nm in enumerate(("dim0", "morton")):
                act = pruning.act_rows_bool_device(self._d2b_dev(nm),
                                                   row_ubs_dev[idx])
                if nm == order_name:
                    act = act & ~band_active_dev
                closures[nm] = pruning.bidir_closure_device(act, rb, cb)
                works.append(jnp.mean(act))
                wcs.append(pruning.window_counts_device(closures[nm],
                                                        span))
            spec_closure = spec_wc = None
            if speculate:
                spec_name = self._nn_spec_name or order_name
                spec = self._nn_tiered_bidir_dispatch(
                    spec_name, order_name, out1, layout,
                    self.TIER_QS_DEFAULT, pack=False)
                spec_closure = pruning.bidir_closure_device(spec[4], rb,
                                                            cb)
                spec_wc = pruning.window_counts_device(spec_closure, span)
            dev = {"closures": closures, "spec_closure": spec_closure,
                   "span": span,
                   "scalars": (jnp.stack(works), wcs[0], wcs[1], spec_wc)}
        else:
            # per-row-bound compare on device; BOTH orders' packed
            # planes in one dispatch + one download (round-trips through
            # the remote tunnel cost ~0.1-0.2s each)
            acts_words = pruning._pack_le_rows2(
                self._d2b_dev("dim0"), self._d2b_dev("morton"),
                row_ubs_dev)
            # speculative tiered plan: its device programs (quantiles,
            # symmetric re-sort, packed mask) run while the acts planes
            # download, and the mask rides the SAME fetch -- when the
            # speculated order wins the whole tiered plan costs zero
            # extra round-trips; a miss just re-dispatches as before
            # (paying the wasted sort in the fetch window). Speculate on
            # the PREVIOUS call's winning order -- stable across reps of
            # a production series -- falling back to the band order on
            # the first call.
            if speculate:
                spec_name = self._nn_spec_name or order_name
                spec = self._nn_tiered_bidir_dispatch(
                    spec_name, order_name, out1, layout,
                    self.TIER_QS_DEFAULT)
        return {"order_name": order_name, "band_blocks": band_blocks,
                "bidir": nn_bidir, "band_active": band_active,
                "band_eff": band_eff, "band_tiles": band_tiles,
                "out1": out1, "acts_words": acts_words, "spec": spec,
                "spec_name": spec_name, "dev": dev}

    def _prefetch_nn_band(self, fe_sorted, band_blocks=4):
        """Dispatch the NN band phase ahead of nearest_neighbors from a
        host free-energy vector already in the band order's frame layout
        (``fe_sorted``: fp32 (n,), MORTON order). All device programs
        are enqueued asynchronously; nearest_neighbors consumes the
        stash only after verifying its fe is bit-equal (fe values gate
        the hd-neighbor comparisons, so approximate matches are not
        admissible)."""
        order_name = "morton"
        n, n_pad = self.n, self.n_pad
        if (self.backend != "pallas"
                or n_pad // self.col_block <= 2 * band_blocks
                or not self._band_prefetch_ok()):
            return
        layouts = {}
        # one (n,) upload; the inf padding and the dim0 re-layout run on
        # device (_pad_fe / _gather_fe are pure data movement, so the
        # stash's fe stays bit-equal to the consumer's host-built
        # layouts). The thread's former host np.full + permutation
        # passes plus the second (1, N_pad) upload were most of its
        # single-core footprint (~0.2-0.3s in-situ at 1M frames) --
        # shrinking them is what makes the prefetch near-free for pops
        # (PREFETCH_AB_r04/r05 measured the on-arm tax).
        fe_band_dev = _pad_fe(self._put(fe_sorted), n_pad)

        def layout(name):
            if name not in layouts:
                order, padded = self._padded(name)
                fe_dev = (fe_band_dev if name == order_name else
                          _gather_fe(fe_band_dev,
                                     self._ub_perm(order_name, name)))
                layouts[name] = (order, padded, fe_dev,
                                 self._oid_dev(name))
            return layouts[name]

        nn_bidir = self._nn_bidir_ok()
        pf = self._nn_band_dispatch(
            order_name, band_blocks, nn_bidir, layout,
            speculate=nn_bidir and n >= self.TIERED_MIN_FRAMES)
        pf["fe_sorted"] = fe_sorted
        pf["layouts"] = layouts
        self._band_prefetch = pf

    def _band_prefetch_start(self, row_host, stats, gate=None):
        """Second half: compute free energies on host EXACTLY as
        ops.free_energies does (same int -> fp32 casts, same np.log, so
        the result is bit-equal to free_energies(pops)[morton_order])
        and dispatch the whole band phase -- on a daemon thread, so the
        host fe + layout uploads + dispatches never sit on the pops
        wall. nearest_neighbors joins the thread before consuming the
        stash. ``gate`` (an Event) defers the thread's work until the
        caller's counts download has landed: concurrent host work taxed
        the single-core download loop ~0.27s (PREFETCH_AB_r04), while
        the deferred thread overlaps the pops host finish and the
        caller's inter-stage work instead. The wait is bounded so an
        aborted download can never hang the consumer's join."""
        n = self.n

        def work():
            try:
                if gate is not None:
                    gate.wait(timeout=600.0)
                counts = row_host[:n]
                # mirror ops.free_energies bit-for-bit (density.py):
                # fp32 max, fp32 division, fp32 log -- int32 counts cast
                # to the same fp32 values as the int64 pops the caller
                # will pass through it
                max_pop = np.float32(counts.max())
                ratio = counts.astype(np.float32) / max_pop
                fe_sorted = (-np.log(ratio.astype(np.float32))
                             ).astype(np.float32)
                self._prefetch_nn_band(fe_sorted)
            except Exception:  # best-effort: a miss only loses overlap
                self._band_prefetch = None

        import threading
        th = threading.Thread(target=work, daemon=True)
        th.start()
        self._band_prefetch_thread = th
        stats["nn_band_prefetch"] = True

    def band_sigma2_estimate(self, timeout=60.0):
        """Estimate of ``compute_sigma2`` (mean squared NN distance) from
        the prefetched NN band phase's per-frame nh upper bounds, WITHOUT
        consuming the prefetch stash. Available between populations(...,
        nn_band_radius=r) and the nearest_neighbors call; returns None
        when no stash exists. The estimate is exact for every frame whose
        true nearest neighbor lies inside the sort band (almost all, on
        spatially-sorted data), so it lands within ~1% of the real
        sigma2 -- close enough that screening tile counts quantize to
        the same compiled shapes (the caller uses it to warm the
        screening fixpoint compiles during the NN stage)."""
        th = getattr(self, "_band_prefetch_thread", None)
        if th is not None:
            th.join(timeout)
        pf = self._band_prefetch
        if pf is None:
            return None
        try:
            val = float(self._get(_band_nh_mean(pf["out1"][0])))
        except Exception:
            return None
        return val if np.isfinite(val) and val > 0.0 else None

    def _nn_dispatch_mesh(self, coords_dev, fe_dev, oid_dev, active,
                          bidir):
        """Balanced shard_map dispatch of an NN tile sweep over ANY
        mesh-replicated (D, N_pad) layout (the identity order or the
        tiered (tier, spatial) re-sort): the tile list is round-robin
        balanced over chips and partial results merge with the two-step
        lexicographic pmin over ICI. Bidirectional sweeps whose per-chip
        column accumulator outgrows NN_BIDIR_SCRATCH_CAP split into
        column-range windows (mesh analog of nn_tiles_bidir_all) whose
        results fold through the idempotent lexicographic min. Returns
        ((2, N_pad) d, (2, N_pad) j) like the single-chip dispatchers."""
        from . import pallas_kernels as pk
        from ..parallel import sharded
        from ..parallel.mesh import mesh_size, replicated
        ti, tj = np.nonzero(active)
        n_dev = mesh_size(self.mesh)
        ncb = self.n_pad // self.col_block
        span = ncb
        if bidir:
            span = max(int(self.NN_BIDIR_SCRATCH_CAP
                           // (self.col_block * 16)), 1)
        self._last_mesh_windows = 1
        if bidir and span < ncb:
            per_dev_total = np.zeros(n_dev, dtype=np.int64)
            out = None
            self._last_mesh_windows = 0
            for base, width, sel in pruning.iter_col_windows(
                    tj, ncb, span):
                self._last_mesh_windows += 1
                # pad/fill tiles must sit INSIDE the window (the
                # column accumulator only spans it)
                fill = (int(ti[sel][0]), int(tj[sel][0]))
                ti_d, tj_d, per_dev = pruning.split_tiles_balanced(
                    ti[sel], tj[sel], n_dev, pad_mode="repeat",
                    fill=fill)
                per_dev_total += per_dev
                od, oj, cd, cj = sharded._nn_sharded_bidir_window(
                    coords_dev, fe_dev, oid_dev, jnp.int32(self.n),
                    replicated(ti_d, self.mesh),
                    replicated(tj_d, self.mesh),
                    jnp.int32(base), self.mesh,
                    row_block=self.row_block,
                    col_block=self.col_block, col_span=width)
                placed = pk._place_cols(cd, cj, base * self.col_block,
                                        self.n_pad)
                part = pk._lex_min2((od, oj), placed)
                out = part if out is None else pk._lex_min2(out, part)
            self._last_mesh_tiles = per_dev_total
            return out
        ti_d, tj_d, per_dev = pruning.split_tiles_balanced(
            ti, tj, n_dev, pad_mode="repeat")
        self._last_mesh_tiles = per_dev
        fn = (sharded._nn_sharded_bidir if bidir
              else sharded._nn_sharded_sparse)
        return fn(coords_dev, fe_dev, oid_dev, jnp.int32(self.n),
                  replicated(ti_d, self.mesh),
                  replicated(tj_d, self.mesh), self.mesh,
                  row_block=self.row_block, col_block=self.col_block)

    def _nn_tiered_plan(self, winner, band_name, band_out, fe, layout,
                        tier_qs):
        """Plan the tier-ordered phase 2: rows re-sorted by (ub-quantile
        tier, ``winner`` spatial position) so each row block is
        tier-homogeneous and carries its tier's quantile as the bound --
        one cross sweep, one download, ~3.5x fewer swept pairs than
        per-row-block max-ub bounds on metastable data. Exact: every
        frame's bound dominates its true ub, so all tiles that can hold
        its minima stay active.

        Returns (n_active_tiles, run) where run() executes the sweep and
        returns (2, N_pad) int32 neighbor ids in winner-position space --
        so the caller can compare the tile count against the
        block-bounded plan before paying for the sweep.
        """
        from . import pallas_kernels as pk
        n, n_pad = self.n, self.n_pad
        rb = self.row_block
        n_tiers = len(tier_qs) + 1
        tier_dev, taus_dev = _ub_tiers(band_out[0], jnp.int32(n),
                                       qs=tuple(tier_qs))
        _, _, fe_dev_w, oid_dev_w = layout(winner)
        # tier per winner position (device gather through the cached
        # permutation; pads take the extra last tier)
        tier_w = jnp.where(
            jnp.arange(n_pad) < n,
            tier_dev[self._ub_perm(band_name, winner)].astype(jnp.int32),
            jnp.int32(n_tiers))
        cmin, cmax = self._col_bboxes(winner)
        rows_t, fe_rows, perm_rows, active_dev = _tiered_layout(
            self._device(winner), fe_dev_w[0], tier_w,
            jnp.asarray(cmin), jnp.asarray(cmax), taus_dev,
            row_block=rb, n_tiers=n_tiers)
        # the only host round-trip of the plan: the packed active mask
        # (1/32nd of the bool matrix through the tunnel)
        active = pruning.unpack_planes(jax.device_get(active_dev),
                                       n_pad // self.col_block)
        n_active = int(active.sum())

        def run():
            tiles = pruning.tile_list(active)
            if tiles is None:
                return None
            outk = pk.nn_tiles_sparse_all_cross(
                rows_t, fe_rows.reshape(1, n_pad),
                self._device(winner), fe_dev_w, oid_dev_w, np.int32(n),
                jnp.asarray(tiles[0]), jnp.asarray(tiles[1]),
                row_block=rb, col_block=self.col_block)
            # device (2, N_pad) ids back at winner positions
            return _unpermute_cols(outk[1], perm_rows)

        return n_active, run

    def _nn_tiered_bidir_dispatch(self, winner, band_name, band_out,
                                  layout, tier_qs, pack=True):
        """Dispatch half of the tiered BIDIRECTIONAL phase-2 plan: all
        device programs (tier quantiles, symmetric (tier, spatial)
        re-sort, packed active mask), NO host sync -- so the caller can
        fold the mask download into another fetch (the band phase's acts
        readback) and the plan costs zero extra round-trips when the
        band order wins. Returns opaque handles for
        _nn_tiered_bidir_finish."""
        n, n_pad = self.n, self.n_pad
        rb, cb = self.row_block, self.col_block
        n_tiers = len(tier_qs) + 1
        tier_dev, taus_dev = _ub_tiers(band_out[0], jnp.int32(n),
                                       qs=tuple(tier_qs))
        _, _, fe_dev_w, oid_dev_w = layout(winner)
        tier_w, perm_dev = _tier_sort_perm(
            tier_dev, self._ub_perm(band_name, winner), jnp.int32(n),
            jnp.int32(n_tiers))
        rows_t, fe_rows, oid_rows, perm, active_dev = _tiered_layout_sym(
            self._device(winner), fe_dev_w[0], oid_dev_w[0], tier_w,
            taus_dev, perm_dev, row_block=rb, col_block=cb,
            n_tiers=n_tiers, pack=pack)
        return rows_t, fe_rows, oid_rows, perm, active_dev

    def _nn_tiered_bidir_finish(self, handles, words=None):
        """Sync half: unpack the (possibly pre-fetched) packed mask, take
        its bidirectional closure, and close over the sweep. Returns
        (n_active_tiles, run); run() yields (2, N_pad) int32 neighbor ids
        at winner positions."""
        from . import pallas_kernels as pk
        n, n_pad = self.n, self.n_pad
        rb, cb = self.row_block, self.col_block
        rows_t, fe_rows, oid_rows, perm, active_dev = handles
        if words is None:
            # the only host round-trip of the plan: the packed active
            # mask (1/32nd of the bool matrix through the tunnel)
            words = self._get(active_dev)
        active = pruning.bidir_closure(
            pruning.unpack_planes(words, n_pad // cb), rb, cb)
        n_active = int(active.sum())

        def run():
            tiles = pruning.tile_list(active)
            if tiles is None:
                return None
            if self.mesh is not None:
                # the tiered layout arrays are replicated mesh-global
                # (jitted from replicated inputs), so the same balanced
                # shard_map dispatch sweeps the re-sorted frame set
                out = self._nn_dispatch_mesh(
                    rows_t, fe_rows.reshape(1, n_pad),
                    oid_rows.reshape(1, n_pad), active, bidir=True)
            else:
                out = pk.nn_tiles_bidir_all(
                    rows_t, fe_rows.reshape(1, n_pad),
                    oid_rows.reshape(1, n_pad), np.int32(n),
                    tiles[0], tiles[1], row_block=rb, col_block=cb,
                    max_acc_bytes=self.NN_BIDIR_SCRATCH_CAP)
            # ids are original frame ids at tiered positions; re-lay to
            # winner positions on device
            return _unpermute_cols(out[1], perm)

        return n_active, run

    def _nn_tiered_bidir_plan(self, winner, band_name, band_out, layout,
                              tier_qs):
        """Tier-ordered BIDIRECTIONAL phase 2: the whole frame set is
        re-sorted by (ub-quantile tier, ``winner`` spatial position) --
        a symmetric order, so the upper-triangular bidirectional sweep
        composes with the tier bounds (the unidirectional tiered pass
        could not, round-2 engine stood tiering down under bidir).
        Returns (n_active_tiles, run) like _nn_tiered_plan; run() yields
        (2, N_pad) int32 neighbor ids at winner positions."""
        return self._nn_tiered_bidir_finish(self._nn_tiered_bidir_dispatch(
            winner, band_name, band_out, layout, tier_qs))

    # auto mode runs the tiered phase 2 when the tiles it prunes off the
    # block-bounded plan are worth more than the tiered path's fixed
    # overhead (one extra device sort/gather program, a 2MB mask
    # readback and the plan dispatches -- measured ~0.3-0.5s through the
    # remote tunnel, i.e. ~5e10 pairs at the v5e kernel ceiling; local
    # chips could lower this)
    TIERED_MIN_SAVED_PAIRS = 6.0e10
    TIERED_MIN_FRAMES = 1 << 19
    TIER_QS_DEFAULT = (0.5, 0.9, 0.99)

    def nearest_neighbors(self, free_energy, prune=True, band_blocks=4,
                          order_name="morton", tier_qs="auto"):
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
        either way. "auto" (default) plans both phase-2 variants and
        takes the tiered one only when its measured tile count saves
        more than the tiered path's fixed dispatch/transfer overhead
        (TIERED_MIN_SAVING, TIERED_MIN_FRAMES); None forces the single
        per-row-block-bounded pass.

        The kernel breaks distance ties by smallest *original* index, so
        results are identical to the reference's original-order scan.
        """
        fe = np.asarray(free_energy, dtype=np.float32)
        if self.mesh is not None and self.backend != "pallas":
            # dense row-ownership XLA program (CPU meshes, smoke runs);
            # the pallas backend keeps the full two-phase pruned path and
            # dispatches its tile sweeps through shard_map
            # (_nn_sparse_chunks)
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
                layouts[name] = (order, padded,
                                 self._put(fe_padded.reshape(1, n_pad)),
                                 self._oid_dev(name))
            return layouts[name]

        nrb, ncb = n_pad // self.row_block, n_pad // self.col_block
        # a band prefetch dispatched during populations() is consumed at
        # most once, and only when its inputs provably match this call
        # (bit-equal fe in the band order, same band/bidir config) --
        # otherwise the normal dispatch below runs and the stale stash
        # is dropped. The fe + dispatch half runs on a daemon thread
        # (off the pops wall); join it before reading the stash.
        th = getattr(self, "_band_prefetch_thread", None)
        if th is not None:
            th.join()
            self._band_prefetch_thread = None
        pf, self._band_prefetch = self._band_prefetch, None
        if pf is not None:
            band_order, _ = self._padded(pf["order_name"])
            if not (prune and ncb > 2 * band_blocks
                    and pf["order_name"] == order_name
                    and pf["band_blocks"] == band_blocks
                    and pf["bidir"] == self._nn_bidir_ok()
                    and np.array_equal(pf["fe_sorted"],
                                       fe if band_order is None
                                       else fe[band_order])):
                pf = None
        if pf is not None:
            layouts.update(pf["layouts"])
        order, padded, fe_dev, oid_dev = layout(order_name)
        band_name, band_out = None, None
        out_idx_dev = None
        stats = {"effective_pairs": float(n) * n,
                 "tile_pairs": self.row_block * self.col_block,
                 "band_tiles": 0, "phase2_tiles": 0, "mode": "dense",
                 "bidir": self._nn_bidir_ok()}
        # sub-stage wall clocks (each segment ends at a host sync, so the
        # deltas are real): band = banded pass + row-ub readback, plan =
        # phase-2 planning incl. tiered-mask readback, sweep = phase-2
        # kernel + index download (incl. the overlapped per-chunk
        # distance recompute when the finish streams), host = the
        # remaining postlude (full recompute when not streamed)
        t0 = time.perf_counter()
        nn_bidir = self._nn_bidir_ok()
        active = None
        if prune and ncb > 2 * band_blocks:
            if pf is not None:
                # the whole band phase (banded sweep, row-ub reduction,
                # activity masks/planes, speculative tiered plan) was
                # dispatched during populations() and overlapped the
                # counts download + inter-stage host work; only the
                # selection fetch below remains on this stage's wall
                bd = pf
                stats["band_prefetched"] = True
            else:
                bd = self._nn_band_dispatch(
                    order_name, band_blocks, nn_bidir, layout,
                    speculate=(tier_qs == "auto" and nn_bidir
                               and n >= self.TIERED_MIN_FRAMES))
                # trace/compile/enqueue wall of the band programs; the
                # rest of t_band is device work + the bundled fetch
                stats["t_band_dispatch"] = time.perf_counter() - t0
            band_active = bd["band_active"]
            out1 = bd["out1"]
            spec, spec_name = bd["spec"], bd["spec_name"]
            stats["band_tiles"] = bd["band_tiles"]
            names = ("dim0", "morton")
            tile_pairs = self.row_block * self.col_block
            if bd["dev"] is not None:
                # device-planned selection (big N): one bundled scalar
                # fetch replaces the packed-plane download; masks and
                # tile lists never leave the device
                dev = bd["dev"]
                stats["plan"] = "device"
                works, wc0, wc1, spec_wc = self._get(dev["scalars"])
                best = None
                for idx, name in enumerate(names):
                    w = float(works[idx])
                    if best is None or w < best[0]:
                        best = (w, name, idx)
                band_name, band_out = order_name, out1
                stats["t_band"] = time.perf_counter() - t0
                t0 = time.perf_counter()
                _, order_name, widx = best
                stats["order"] = self._nn_spec_name = order_name
                order, padded, fe_dev, oid_dev = layout(order_name)
                counts_w = (wc0, wc1)[widx]
                block_tiles = int(counts_w.sum())
                mask_dev = dev["closures"][order_name]
                span = dev["span"]
                plan = None
                plan_worthwhile = (
                    block_tiles * float(tile_pairs) * (1.0 - 1.0 / 3.5)
                    > self.TIERED_MIN_SAVED_PAIRS)
                if (tier_qs == "auto" and n >= self.TIERED_MIN_FRAMES
                        and plan_worthwhile):
                    if spec is not None and order_name == spec_name:
                        # the speculative dispatch was for this exact
                        # winner; its window counts arrived in the
                        # bundled fetch
                        stats["spec_hit"] = True
                        est = int(spec_wc.sum())
                        run_tiered = self._nn_tiered_run_dev(
                            spec, dev["spec_closure"], spec_wc, span)
                    else:
                        est, run_tiered = self._nn_tiered_plan_dev(
                            order_name, band_name, band_out, layout,
                            self.TIER_QS_DEFAULT, span)
                    if ((block_tiles - est) * float(tile_pairs)
                            > self.TIERED_MIN_SAVED_PAIRS):
                        plan = (est, run_tiered)
                elif tier_qs not in (None, "auto"):
                    plan = self._nn_tiered_plan_dev(
                        order_name, band_name, band_out, layout,
                        tuple(tier_qs), span)
                stats["t_plan"] = time.perf_counter() - t0
                t0 = time.perf_counter()
                if plan is not None:
                    stats["phase2_tiles"], run_tiered = plan
                    stats["mode"] = "tiered"
                    out_idx_dev = run_tiered()
                else:
                    stats["phase2_tiles"] = block_tiles
                    stats["mode"] = "block-bound"
                    out = self._nn_windows_sweep(
                        self._device(order_name), fe_dev, oid_dev,
                        mask_dev, counts_w, span)
                    if order_name == band_name and out is not None:
                        out = _lex_merge(band_out[0], band_out[1],
                                         out[0], out[1])
                    elif order_name == band_name:
                        out = band_out
                    if out is not None:
                        out_idx_dev = out[1]
                # the tail host-sweep block is device-handled above
                # (``active`` stays None)
            else:
                band_eff = bd["band_eff"]
                acts_words = bd["acts_words"]
                spec_words = None
                if spec is not None and tier_qs == "auto":
                    acts_host, spec_words = self._get((acts_words,
                                                       spec[4]))
                else:
                    acts_host = self._get(acts_words)
                acts = pruning.unpack_planes(acts_host, ncb)
                best = None
                for idx, name in enumerate(names):
                    act = acts[idx]
                    work = float((act & ~band_active).mean()
                                 if name == order_name else act.mean())
                    if best is None or work < best[0]:
                        best = (work, name, act)
                band_name, band_out = order_name, out1
                stats["t_band"] = time.perf_counter() - t0
                t0 = time.perf_counter()
                _, order_name, active = best
                stats["order"] = self._nn_spec_name = order_name
                order, padded, fe_dev, oid_dev = layout(order_name)
                if order_name == band_name:
                    # the band's minima are exact within its tiles and
                    # the merge is an idempotent lexicographic min: skip
                    # re-sweeping them and fold the band result in after
                    active = active & ~band_active
                if nn_bidir:
                    active = pruning.bidir_closure(active, self.row_block,
                                                   self.col_block)
                block_tiles = int(active.sum())
                plan = None
                # planning the tiered layout itself costs dispatches + a
                # mask readback (~0.3-0.5s through the remote tunnel), so
                # only plan when even a typical-best (~3.5x, measured on
                # metastable data) reduction of the block-bound work
                # could clear the profitability threshold
                plan_worthwhile = (
                    block_tiles * float(tile_pairs) * (1.0 - 1.0 / 3.5)
                    > self.TIERED_MIN_SAVED_PAIRS)
                # under bidirectional sweeps tiering uses the SYMMETRIC
                # (tier, spatial) re-sort so the upper-triangular sweep
                # composes with the tier bounds; unidirectional sweeps
                # use the row-only re-sort against the cached winner
                # columns. The BIDIRECTIONAL tiered plan runs under a
                # mesh too (its device programs are jitted from
                # replicated inputs and its sweep goes through
                # _nn_dispatch_mesh); the unidirectional cross-sweep
                # variant stays single-device, so a mesh without bidir
                # keeps the block-bound phase 2
                if (tier_qs == "auto" and n >= self.TIERED_MIN_FRAMES
                        and plan_worthwhile
                        and (nn_bidir or self.mesh is None)):
                    if (nn_bidir and spec is not None
                            and order_name == spec_name):
                        # the speculative dispatch was for this exact
                        # winner and its mask already arrived with the
                        # acts fetch
                        stats["spec_hit"] = True
                        est, run_tiered = self._nn_tiered_bidir_finish(
                            spec, words=spec_words)
                    elif nn_bidir:
                        est, run_tiered = self._nn_tiered_bidir_plan(
                            order_name, band_name, band_out, layout,
                            self.TIER_QS_DEFAULT)
                    else:
                        est, run_tiered = self._nn_tiered_plan(
                            order_name, band_name, band_out, fe, layout,
                            self.TIER_QS_DEFAULT)
                    if ((block_tiles - est) * float(tile_pairs)
                            > self.TIERED_MIN_SAVED_PAIRS):
                        plan = (est, run_tiered)
                elif (tier_qs not in (None, "auto")
                        and (nn_bidir or self.mesh is None)):
                    if nn_bidir:
                        plan = self._nn_tiered_bidir_plan(
                            order_name, band_name, band_out, layout,
                            tier_qs)
                    else:
                        plan = self._nn_tiered_plan(order_name, band_name,
                                                    band_out, fe, layout,
                                                    tier_qs)
                stats["t_plan"] = time.perf_counter() - t0
                t0 = time.perf_counter()
                if plan is not None:
                    stats["phase2_tiles"], run_tiered = plan
                    stats["mode"] = "tiered"
                    out_idx_dev = run_tiered()
                else:
                    stats["phase2_tiles"] = block_tiles
                    stats["mode"] = "block-bound"
        else:
            active = np.ones((nrb, ncb), dtype=bool)
            if nn_bidir:
                active = pruning.bidir_closure(active, self.row_block,
                                               self.col_block)
            stats["phase2_tiles"] = int(active.sum())
        if (out_idx_dev is None and stats["mode"] != "tiered"
                and active is not None):
            merge_band = band_out is not None and order_name == band_name
            if not active.any():
                out = None
            else:
                out = self._nn_sparse_chunks(order_name, fe_dev, oid_dev,
                                             active, bidir=nn_bidir)
            if merge_band and out is not None:
                # lexicographic merge on device: one download vs three
                out = _lex_merge(band_out[0], band_out[1], out[0], out[1])
            elif merge_band:
                out = band_out
            if out is not None:
                out_idx_dev = out[1]
        imax = np.iinfo(np.int32).max
        dd = None
        streamed = None
        jj_u24 = None
        if out_idx_dev is None:
            jj = np.zeros((2, n), dtype=np.int32)
            dd = np.zeros((2, n), dtype=np.float32)
        elif _nn_finish_mode(n) == "host":
            # ids-only download; distances recomputed on host
            # (rationale in _nn_finish_mode)
            k_chunks = _nn_finish_chunks(n)
            if (k_chunks > 1 and self.mesh is None
                    and textio_native.available()):
                # streamed finish: every chunk's D2H copy is enqueued
                # up-front, then chunk k's native distance recompute runs
                # while chunk k+1 is still in flight -- the host pass
                # hides under the (tunnel-bound) ids download
                chunks = _nn_finish_idx_chunked(
                    out_idx_dev, self._ub_perm(order_name, "orig"), n,
                    k_chunks)
                for c in chunks:
                    c.copy_to_host_async()
                if os.environ.get("CLUSTERING_TPU_PROFILE_SUBSTAGES"):
                    _ = int(np.asarray(chunks[0][:1, :1])[0, 0])
                    stats["t_kernel"] = time.perf_counter() - t0
                parts, hosts, base = [], [], 0
                for c in chunks:
                    h = np.asarray(c)  # blocks until THIS chunk lands
                    hosts.append(h)
                    parts.append(textio_native.nn_finish(
                        self.coords, h, frame0=base))
                    base += h.shape[1]
                if all(p is not None for p in parts):
                    streamed = tuple(
                        np.concatenate([p[i] for p in parts])
                        for i in range(4))
                    jj = None
                else:  # stale .so without nn_finish_host: numpy path
                    jj = np.concatenate(hosts, axis=1)
            else:
                # u24 byte-plane packing: ids are < 2^24 at supported N,
                # so the download drops 8 -> 6 bytes/frame with no
                # overflow fallback (the sentinel remap needs
                # n <= 2^24 - 2 so 0xFFFFFF stays >= n)
                u24 = (n <= (1 << 24) - 2
                       and textio_native.has_nn_finish_u24())
                if u24:
                    idx_dev = _nn_finish_idx_u24(
                        out_idx_dev, self._ub_perm(order_name, "orig"), n)
                    barrier = idx_dev[:1, :1, :1]
                    stats["ids_format"] = "u24"
                else:
                    idx_dev = _nn_finish_idx(
                        out_idx_dev, self._ub_perm(order_name, "orig"), n)
                    barrier = idx_dev[:1, :1]
                    stats["ids_format"] = "i32"
                if os.environ.get("CLUSTERING_TPU_PROFILE_SUBSTAGES"):
                    # scalar readback = device-done barrier (see the fused
                    # branch below): kernel time vs ids download
                    _ = int(np.asarray(self._get(barrier)).ravel()[0])
                    stats["t_kernel"] = time.perf_counter() - t0
                got = self._get(idx_dev)
                if u24:
                    jj_u24, jj = got, None
                else:
                    jj = got
        else:
            # all-device finish (default): ids + distances in one fused
            # fetch -- paired A/B at N=2^20 through the remote tunnel
            # measured 2.20s vs 2.59s for the host recompute, and on
            # locally-attached chips the extra 8MB costs ~1ms (see
            # _nn_finish)
            fused_dev = _nn_finish(
                out_idx_dev, self._ub_perm(order_name, "orig"),
                self._device("orig"), n)
            if os.environ.get("CLUSTERING_TPU_PROFILE_SUBSTAGES"):
                # scalar readback = device-done barrier (~33ms through the
                # tunnel; block_until_ready is unreliable there): splits
                # the sweep segment into kernel time vs result download
                _ = int(self._get(fused_dev[:1, :1])[0, 0])
                stats["t_kernel"] = time.perf_counter() - t0
            fused = self._get(fused_dev)
            jj = fused[:2]
            dd = fused[2:].view(np.float32)
        stats["t_sweep"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        if streamed is not None:
            # streamed finish: recompute already overlapped the download
            # (counted under t_sweep); only the chunk concatenation is left
            nh_j, hd_j, nh_d, hd_d = streamed
        elif dd is None:
            # host recompute path: ids still carry IMAX for absent frames
            # (u24 packing: decoded ids >= n mean absent)
            native = None
            if jj_u24 is not None:
                native = textio_native.nn_finish_u24(self.coords, jj_u24)
                if native is None:  # stale .so raced away: numpy decode
                    jj = (jj_u24[:, 0].astype(np.int32)
                          | (jj_u24[:, 1].astype(np.int32) << 8)
                          | (jj_u24[:, 2].astype(np.int32) << 16))
                    jj[jj >= len(self.coords)] = imax
            else:
                native = textio_native.nn_finish(self.coords, jj)
            if native is not None:
                nh_j, hd_j, nh_d, hd_d = native
            else:
                nh_j = jj[0].astype(np.int64)
                hd_j = jj[1].astype(np.int64)
                no_nh = nh_j == imax
                nh_j[no_nh] = 0
                no_hd = hd_j == imax
                hd_j[no_hd] = 0
                nh_d = _host_pair_d2(self.coords, nh_j)
                hd_d = _host_pair_d2(self.coords, hd_j)
                nh_d[no_nh] = 0.0
                hd_d[no_hd] = 0.0
        else:
            # device finish already zeroed absent ids and distances
            nh_j = jj[0].astype(np.int64)
            hd_j = jj[1].astype(np.int64)
            nh_d = np.asarray(dd[0])
            hd_d = np.asarray(dd[1])
        stats["t_host"] = time.perf_counter() - t0
        stats["computed_tiles"] = stats["band_tiles"] + stats["phase2_tiles"]
        self.last_stats["nn"] = stats
        self._log_stats("nn", stats)
        return nh_j, nh_d, hd_j, hd_d
