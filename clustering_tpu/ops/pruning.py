"""Block-level spatial pruning for the O(N^2) pair kernels.

TPU-native generalization of the reference's box-grid neighbor search
(src/density_clustering.cpp:41-105, applied there only to the CPU pops path)
and of the 1-D sort-pruning helpers it sketches but never uses
(src/tools.hxx:120-204): the frame matrix is processed in
(row_block x col_block) tiles, each tile pair gets a lower bound on its
pairwise distances from per-block coordinate bounding boxes, and tiles that
cannot contain any pair within the interaction radius are skipped inside the
Pallas kernels via a bit-packed skip matrix held in SMEM.

Pruning is *exact*: a tile is skipped only when its bounding-box distance
strictly exceeds the threshold, so every admissible pair is still visited.

Orders used by the callers:
  * populations: frames sorted by the first coordinate (highest-variance PC)
    -- counts are permutation-invariant, so sorting is free and makes the
    skip structure banded.
  * NN search: original frame order (MD trajectories are temporally
    correlated, hence spatially local) so the reference's smallest-index
    tie-breaking is preserved; a first banded pass produces per-row-block
    distance upper bounds that prune the full pass.
  * screening: FE-sorted order (fixed by the algorithm); the skip matrix is
    reusable across all thresholds since sigma is threshold-independent.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

WORD_BITS = 32


def morton_order(coords):
    """Frame order along a Morton (Z-order) space-filling curve.

    Groups spatially-close frames into the same tile so per-block bounding
    boxes stay tight in every dimension (dim-0 sorting only bounds one).
    Used where results are permutation-invariant (population counts).

    One native pass when the library is available (bit-identical keys +
    stable sort, equality pinned in tests): the numpy bit-interleave
    loop below makes ~60 passes over the key array and cost 30-50s at
    16M frames on the single-core target VM.
    """
    from ..utils import textio_native
    native = textio_native.morton_order_pad(coords)
    if native is not None:
        return native
    c = np.asarray(coords, dtype=np.float64)
    n, d = c.shape
    bits = max(1, 62 // d)
    lo = c.min(axis=0)
    span = c.max(axis=0) - lo
    span[span == 0] = 1.0
    q = ((c - lo) / span * ((1 << bits) - 1)).astype(np.uint64)
    key = np.zeros(n, dtype=np.uint64)
    for b in range(bits):
        for k in range(d):
            key |= ((q[:, k] >> np.uint64(b)) & np.uint64(1)) \
                << np.uint64(b * d + k)
    return np.argsort(key, kind="stable")


def block_bboxes(coords, block):
    """Per-block per-dimension (mins, maxs); coords (N_pad, D) with N_pad a
    multiple of block."""
    c = np.asarray(coords)
    n, d = c.shape
    blocks = c.reshape(n // block, block, d)
    return blocks.min(axis=1), blocks.max(axis=1)


_BBOX_ROW_CHUNK = 16384


def bbox_dist2(row_mins, row_maxs, col_mins, col_maxs):
    """(n_row_blocks, n_col_blocks) lower bounds on the squared distance
    between any row-block frame and any col-block frame.

    Accumulated per dimension and in row chunks so peak memory stays at
    one (chunk, n_col_blocks) float64 matrix (a full 3-D broadcast is
    gigabytes at millions of frames). The float32 result is rounded
    *downward* so it remains a true lower bound -- round-to-nearest could
    push a bound one ulp past a radius threshold and prune a tile that
    holds an admissible boundary pair."""
    nrb, ncb = row_mins.shape[0], col_mins.shape[0]
    n_dim = row_mins.shape[1]
    # contiguous per-dimension vectors: broadcasting over strided column
    # slices of the (n, D) inputs defeats SIMD (measured 3x slower)
    rmin_d = [np.ascontiguousarray(row_mins[:, k], dtype=np.float32)
              for k in range(n_dim)]
    rmax_d = [np.ascontiguousarray(row_maxs[:, k], dtype=np.float32)
              for k in range(n_dim)]
    cmin_d = [np.ascontiguousarray(col_mins[:, k], dtype=np.float32)
              for k in range(n_dim)]
    cmax_d = [np.ascontiguousarray(col_maxs[:, k], dtype=np.float32)
              for k in range(n_dim)]
    # fp32 throughout (the float64 version moves 2x the memory; this is
    # host-side and bandwidth-bound at millions of frames); the final
    # downward scale dominates every accumulated fp32 rounding, keeping
    # the result a true lower bound: 2 + n_dim ops of <= 2^-24 relative
    # error each, margin (n_dim + 8) * 2^-23
    margin = np.float32(1.0 - (n_dim + 8) * 2.0 ** -23)
    big = np.float32(np.finfo(np.float32).max) * margin
    out = np.empty((nrb, ncb), dtype=np.float32)
    with np.errstate(over="ignore"):
        for lo in range(0, nrb, _BBOX_ROW_CHUNK):
            hi = min(lo + _BBOX_ROW_CHUNK, nrb)
            acc = np.zeros((hi - lo, ncb), dtype=np.float32)
            gap = np.empty((hi - lo, ncb), dtype=np.float32)
            g2 = np.empty((hi - lo, ncb), dtype=np.float32)
            for k in range(n_dim):
                np.subtract(rmin_d[k][lo:hi, None], cmax_d[k][None, :],
                            out=gap)
                np.subtract(cmin_d[k][None, :], rmax_d[k][lo:hi, None],
                            out=g2)
                np.maximum(gap, g2, out=gap)
                np.maximum(gap, np.float32(0.0), out=gap)
                np.multiply(gap, gap, out=gap)
                acc += gap
            # padded blocks at 3e38 overflow to +inf: exactly "far"
            np.minimum(acc, big, out=acc)
            acc *= margin
            out[lo:hi] = acc
    return out


def pack_skip_words(skip_bool):
    """Pack a (n_row_blocks, n_col_blocks) boolean skip matrix into
    int32 words, row-major, ``words_per_row`` words per row block.

    Bit layout: word w of row i holds col blocks [w*32, (w+1)*32), col j at
    bit (j % 32)."""
    nrb, ncb = skip_bool.shape
    words_per_row = -(-ncb // WORD_BITS)
    padded = np.zeros((nrb, words_per_row * WORD_BITS), dtype=bool)
    padded[:, :ncb] = skip_bool
    bits = padded.reshape(nrb, words_per_row, WORD_BITS)
    weights = (1 << np.arange(WORD_BITS, dtype=np.uint64))
    words = (bits.astype(np.uint64) * weights).sum(axis=2)
    return words.astype(np.uint32).view(np.int32).reshape(-1), words_per_row


@functools.partial(jax.jit, static_argnames=("row_block", "col_block"))
def bbox_d2_device(coords_t, row_block, col_block):
    """Device-side bbox_dist2 from the (D, N_pad) transposed frame
    matrix: same per-dimension gap accumulation and downward fp32 margin
    as the host version (any valid lower bound preserves exactness; the
    margin absorbs accumulation rounding either way). The host version
    costs ~11s per order at 4M frames and minutes at 16M on this VM's
    single core; one device dispatch does it in milliseconds, and the
    (nrb, ncb) f32 matrix stays in HBM for threshold compares."""
    n_dim, n_pad = coords_t.shape
    rblk = coords_t.reshape(n_dim, -1, row_block)
    rmin, rmax = rblk.min(axis=2), rblk.max(axis=2)   # (D, nrb)
    cblk = coords_t.reshape(n_dim, -1, col_block)
    cmin, cmax = cblk.min(axis=2), cblk.max(axis=2)   # (D, ncb)
    margin = jnp.float32(1.0 - (n_dim + 8) * 2.0 ** -23)
    big = jnp.float32(np.finfo(np.float32).max) * margin
    nrb = n_pad // row_block
    ncb = n_pad // col_block
    acc = jnp.zeros((nrb, ncb), dtype=jnp.float32)
    for k in range(n_dim):
        gap = jnp.maximum(rmin[k][:, None] - cmax[k][None, :],
                          cmin[k][None, :] - rmax[k][:, None])
        gap = jnp.maximum(gap, 0.0)
        acc = acc + gap * gap
    return jnp.minimum(acc, big) * margin


@functools.partial(jax.jit, static_argnames=("strict",))
def _pack_le_planes(d2b, thresh2s, strict=False):
    """(T, nrb, ceil(ncb/32)) uint32 bit planes of d2b <= thresh2s[t]
    (or strict <) -- bit c of word w = column w*32+c, little-endian.
    The strict flag exists because nextafter-based strictness breaks on
    denormal thresholds (XLA flushes them to zero)."""
    nrb, ncb = d2b.shape
    nw = -(-ncb // 32)
    if strict:
        bits = d2b[None, :, :] < thresh2s[:, None, None]
    else:
        bits = d2b[None, :, :] <= thresh2s[:, None, None]
    if nw * 32 != ncb:
        bits = jnp.pad(bits, ((0, 0), (0, 0), (0, nw * 32 - ncb)))
    w = bits.reshape(bits.shape[0], nrb, nw, 32).astype(jnp.uint32)
    return (w << jnp.arange(32, dtype=jnp.uint32)).sum(
        axis=-1, dtype=jnp.uint32)


@jax.jit
def _pack_le_rows(d2b, row_ub):
    """Packed bit plane of d2b <= row_ub[:, None] (per-row thresholds)."""
    nrb, ncb = d2b.shape
    nw = -(-ncb // 32)
    bits = d2b <= row_ub[:, None]
    if nw * 32 != ncb:
        bits = jnp.pad(bits, ((0, 0), (0, nw * 32 - ncb)))
    w = bits.reshape(nrb, nw, 32).astype(jnp.uint32)
    return (w << jnp.arange(32, dtype=jnp.uint32)).sum(
        axis=-1, dtype=jnp.uint32)


def unpack_planes(words, ncb):
    """Host-side inverse of _pack_le_planes/_pack_le_rows: (..., W)
    uint32 words -> (..., ncb) bool."""
    w = np.ascontiguousarray(np.asarray(words))
    bits = np.unpackbits(w.view(np.uint8), axis=-1, bitorder="little")
    return bits[..., :ncb].astype(bool)


def active_masks_device(d2b_dev, thresh2s, strict=False):
    """Threshold the device-resident bbox matrix and download packed
    bits (1/32nd of the bool matrix -- 67MB instead of 2.1GB at 16M
    frames). Returns a (T, nrb, ncb) bool numpy array of d2b <= t (or
    strict < with ``strict``)."""
    ncb = d2b_dev.shape[1]
    words = _pack_le_planes(d2b_dev, jnp.asarray(thresh2s,
                                                 dtype=jnp.float32),
                            strict=strict)
    return unpack_planes(jax.device_get(words), ncb)


def active_mask_rows_device(d2b_dev, row_ub_dev):
    """Per-row-threshold active mask from device-resident inputs."""
    ncb = d2b_dev.shape[1]
    words = _pack_le_rows(d2b_dev, row_ub_dev)
    return unpack_planes(jax.device_get(words), ncb)


@jax.jit
def pack_mask_words(mask):
    """(nrb, ncb) bool -> (nrb, ceil(ncb/32)) uint32 little-endian bit
    words (the device half of unpack_planes): lets device-computed
    active-tile masks download at 1/32nd the bool volume."""
    nrb, ncb = mask.shape
    nw = -(-ncb // 32)
    if nw * 32 != ncb:
        mask = jnp.pad(mask, ((0, 0), (0, nw * 32 - ncb)))
    w = mask.reshape(nrb, nw, 32).astype(jnp.uint32)
    return (w << jnp.arange(32, dtype=jnp.uint32)).sum(
        axis=-1, dtype=jnp.uint32)


@jax.jit
def _pack_le_rows2(d2b_a, d2b_b, row_ub_2):
    """Both candidate orders' per-row-threshold planes in ONE dispatch and
    transfer (each device->host round-trip costs real latency through
    remote-TPU tunnels)."""
    return jnp.stack([_pack_le_rows(d2b_a, row_ub_2[0]),
                      _pack_le_rows(d2b_b, row_ub_2[1])])


def bidir_closure(active, row_block, col_block):
    """Upper-triangular closure of an active-tile set for bidirectional
    sweeps: tiles ``upper AND (A OR M)``, where M marks the mirrors of
    active tiles (coarsened to col-block granularity, the finest the
    (row_block, col_block) grid can express for transposed coverage).

    Every ordered pair (x, candidate y) demanded by ``active`` -- i.e.
    active[rowblock(x), colblock(y)] -- is evaluated by exactly one kept
    tile: the upper tile itself when x <= y, else its mirror, which M
    provably covers. Never larger than |active| when active is
    symmetric; at most |active| in general (the closure of A's upper
    half plus coarsened mirrors of its lower half)."""
    nrb, ncb = active.shape
    if col_block % row_block != 0:
        raise ValueError("bidir_closure needs col_block % row_block == 0")
    span = col_block // row_block
    assert nrb == ncb * span
    # col-block-level adjacency: B[u, v] = any active tile whose rows lie
    # in col block u, against col block v
    B = active.reshape(ncb, span, ncb).any(axis=1)
    ri = np.arange(nrb)[:, None]
    cj = np.arange(ncb)[None, :]
    mirror = B[cj, ri // span]
    upper = (cj + 1) * col_block > ri * row_block
    return (active | mirror) & upper


# tile-index lists live in SMEM (1MB); cap each kernel call's list so two
# int32 arrays stay well under it, and chunk longer lists across calls
MAX_TILE_ENTRIES = 1 << 16


def chunk_bucket(n, max_entries=MAX_TILE_ENTRIES):
    """THE per-chunk bucket size for stacked tile lists: the flat length
    rounded up to a power of two with a 1024 floor and ``max_entries``
    cap — bounded compile variety (each grid size compiles once per
    process), at most 2x padding waste. Every re-chunker must use this
    so stacked shapes hit the same compiled programs."""
    return min(1 << int(np.ceil(np.log2(max(min(n, max_entries), 1024)))),
               max_entries)


def tile_list(active, pad_mode="repeat", max_entries=MAX_TILE_ENTRIES):
    """Row-major active-tile index lists as stacked (n_chunks, bucket)
    int32 arrays (ti, tj).

    Each kernel call consumes one chunk (SMEM holds at most ``max_entries``
    indices); callers merge per-chunk results (sum for counts, min for
    reductions). The bucket is the per-chunk length rounded up to a power
    of two so a handful of compiled grid sizes serve many calls.

    pad_mode 'repeat' duplicates the last tile (valid only for idempotent
    reductions); 'noop' pads with (last ti, -1) entries that the counting
    kernels treat as no-ops. Returns None when nothing is active.
    """
    ti_all, tj_all = np.nonzero(active)
    n = len(ti_all)
    if n == 0:
        return None
    bucket = chunk_bucket(n, max_entries)
    n_chunks = -(-n // bucket)
    ti = np.empty((n_chunks, bucket), dtype=np.int32)
    tj = np.empty((n_chunks, bucket), dtype=np.int32)
    for c in range(n_chunks):
        lo, hi = c * bucket, min((c + 1) * bucket, n)
        m = hi - lo
        ti[c, :m] = ti_all[lo:hi]
        tj[c, :m] = tj_all[lo:hi]
        ti[c, m:] = ti_all[hi - 1]
        tj[c, m:] = tj_all[hi - 1] if pad_mode == "repeat" else -1
    return ti, tj


def split_tiles_balanced(ti, tj, n_dev, pad_mode="repeat",
                         max_entries=MAX_TILE_ENTRIES, fill=None):
    """Round-robin a global active-tile list over devices (balanced to
    within one tile per device, unlike row-ownership splits that inherit
    the spatial skew of the pruning) and re-chunk every device's list to
    a common (n_chunks, bucket) shape.

    Valid whenever any device may compute any tile -- i.e. when partial
    results merge with a cross-device reduction (psum for counts, min for
    NN/labels) rather than by row ownership. Keeps ``ti`` GLOBAL row-block
    indices. Each device's subsequence of the row-major-sorted input stays
    row-major sorted, preserving the kernels' first-visit-initializes
    contract. Returns (ti_dev, tj_dev, counts) with counts the per-device
    real (unpadded) tile counts.

    ``fill``: (ti, tj) used for devices that receive ZERO tiles in repeat
    mode (default (0, 0)). Column-windowed dispatches must pass a tile
    inside the window -- the min-merge kernels recompute pad tiles
    idempotently, but their column accumulator only spans the window.
    """
    ti = np.asarray(ti, dtype=np.int32).reshape(-1)
    tj = np.asarray(tj, dtype=np.int32).reshape(-1)
    per_dev = [(ti[d::n_dev], tj[d::n_dev]) for d in range(n_dev)]
    counts = np.asarray([len(a) for a, _ in per_dev], dtype=np.int64)
    longest = max(int(counts.max()) if len(ti) else 0, 1)
    per_chunk = min(longest, max_entries)
    bucket = 1 << int(np.ceil(np.log2(max(per_chunk, 1024))))
    bucket = min(bucket, max_entries)
    n_chunks = -(-longest // bucket)
    fill_i, fill_j = (0, 0) if fill is None else fill
    if pad_mode != "repeat":
        fill_j = -1
    ti_dev = np.full((n_dev, n_chunks, bucket), fill_i, dtype=np.int32)
    tj_dev = np.full((n_dev, n_chunks, bucket), fill_j, dtype=np.int32)
    for d, (a, b) in enumerate(per_dev):
        if not len(a):
            continue
        pad = n_chunks * bucket - len(a)
        pad_j = b[-1] if pad_mode == "repeat" else -1
        ti_dev[d] = np.concatenate(
            [a, np.full(pad, a[-1])]).reshape(n_chunks, bucket)
        tj_dev[d] = np.concatenate(
            [b, np.full(pad, pad_j)]).reshape(n_chunks, bucket)
    return ti_dev, tj_dev, counts


def iter_col_windows(tj, ncb, span):
    """Yield (base, width, sel) for each column-range window
    [base, base+width) of the bidirectional sweeps' accumulator
    partitioning that holds at least one tile of the flat ``tj`` list
    (each real tile lands in exactly one window; empty windows dispatch
    nothing). The one policy shared by the single-chip
    pops/nn_tiles_bidir_all dispatchers and the engine's mesh loops."""
    tj = np.asarray(tj)
    for base in range(0, ncb, span):
        width = min(span, ncb - base)
        sel = (tj >= base) & (tj < base + width)
        if sel.any():
            yield base, width, sel


def no_skip_words(n_row_blocks, n_col_blocks):
    words_per_row = -(-n_col_blocks // WORD_BITS)
    return (np.zeros(n_row_blocks * words_per_row, dtype=np.int32),
            words_per_row)


def radius_skip_words(coords_padded, row_block, col_block, thresh2,
                      strict=True):
    """Skip matrix: tile (i, j) skipped iff bbox_dist2 > thresh2 (or >=
    with strict=False, for the screening kernel's strict '<' adjacency)."""
    rmin, rmax = block_bboxes(coords_padded, row_block)
    cmin, cmax = block_bboxes(coords_padded, col_block)
    d2 = bbox_dist2(rmin, rmax, cmin, cmax)
    skip = d2 > thresh2 if strict else d2 >= thresh2
    return pack_skip_words(skip)


def band_mask(n_row_blocks, n_col_blocks, row_block, col_block, half_width):
    """Keep-matrix for a diagonal band of +-half_width frames (used for
    the NN bounding pass)."""
    row_centers = (np.arange(n_row_blocks) + 0.5) * row_block
    col_lo = (np.arange(n_col_blocks)) * col_block
    col_hi = col_lo + col_block
    return ((col_hi[None, :] >= row_centers[:, None] - half_width)
            & (col_lo[None, :] <= row_centers[:, None] + half_width))


def band_skip_words(n_row_blocks, n_col_blocks, row_block, col_block,
                    half_width):
    """Skip everything except the diagonal band."""
    return pack_skip_words(~band_mask(n_row_blocks, n_col_blocks,
                                      row_block, col_block, half_width))


def ub_skip_words(coords_padded, row_block, col_block, row_ub):
    """Skip tile (i, j) iff its bbox distance strictly exceeds the row
    block's current upper bound ``row_ub[i]`` (+inf disables pruning for
    that row block)."""
    rmin, rmax = block_bboxes(coords_padded, row_block)
    cmin, cmax = block_bboxes(coords_padded, col_block)
    d2 = bbox_dist2(rmin, rmax, cmin, cmax)
    skip = d2 > np.asarray(row_ub, dtype=np.float32)[:, None]
    return pack_skip_words(skip)


# ---------------------------------------------------------------------------
# device-side planning (big N)
#
# Host planning materializes (nrb, ncb) boolean matrices and downloads
# packed activity planes; at 16M frames that is ~537MB per mask and a
# 67MB transfer per plane, and the measured plan walls were minutes
# (BIGN_r03: t_plan 760s, t_band 1502s -- mask algebra, np.nonzero and
# chunking on a page-fault-bound single-core host). These helpers keep
# every mask ON DEVICE and hand the sweeps device-resident stacked tile
# chunks; the only host traffic is a handful of scalar counts (the
# chunk shapes must be static). The emitted tile sets and their
# row-major order are identical to the host planners', so results are
# bit-equal (the reductions are order-invariant anyway).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("strict",))
def le_planes_device(d2b_dev, thresh2s, strict=False):
    """(T, nrb, ncb) bool device planes of d2b <= thresh2s[t] (strict <):
    active_masks_device without the pack + download."""
    t = jnp.asarray(thresh2s, dtype=jnp.float32)[:, None, None]
    return d2b_dev[None] < t if strict else d2b_dev[None] <= t


@functools.partial(jax.jit,
                   static_argnames=("nrb", "ncb", "row_block", "col_block",
                                    "half_width"))
def band_mask_device(nrb, ncb, row_block, col_block, half_width):
    """Device twin of band_mask: the host float comparison rewritten as
    exact integer arithmetic (x2), so the tile set matches the host
    planner bit-for-bit at any N (fp32 iotas would round past 2^24)."""
    rc2 = (2 * jnp.arange(nrb, dtype=jnp.int32) + 1) * row_block
    col_lo2 = 2 * jnp.arange(ncb, dtype=jnp.int32) * col_block
    col_hi2 = col_lo2 + 2 * col_block
    hw2 = 2 * half_width
    return ((col_hi2[None, :] >= rc2[:, None] - hw2)
            & (col_lo2[None, :] <= rc2[:, None] + hw2))


@functools.partial(jax.jit, static_argnames=("row_block", "col_block"))
def bidir_closure_device(active, row_block, col_block):
    """Device twin of bidir_closure (same tile set)."""
    nrb, ncb = active.shape
    if col_block % row_block != 0:
        raise ValueError("bidir_closure needs col_block % row_block == 0")
    span = col_block // row_block
    assert nrb == ncb * span
    B = active.reshape(ncb, span, ncb).any(axis=1)
    # host: mirror[i, j] = B[j, i // span] == repeat_rows(B.T, span)
    mirror = jnp.repeat(B.T, span, axis=0)
    ri = jnp.arange(nrb, dtype=jnp.int32)[:, None]
    cj = jnp.arange(ncb, dtype=jnp.int32)[None, :]
    upper = (cj + 1) * col_block > ri * row_block
    return (active | mirror) & upper


@jax.jit
def upper_tri_device(active, row_block, col_block):
    """active & upper-triangular (the bidir pops tile filter)."""
    nrb, ncb = active.shape
    ri = jnp.arange(nrb, dtype=jnp.int32)[:, None]
    cj = jnp.arange(ncb, dtype=jnp.int32)[None, :]
    return active & ((cj + 1) * col_block > ri * row_block)


@functools.partial(jax.jit, static_argnames=("span",))
def window_counts_device(active, span):
    """Per-column-window active-tile counts, (W,) int32 -- the one
    scalar-sized fetch device planning needs before shaping tile lists
    (W = ceil(ncb / span))."""
    nrb, ncb = active.shape
    w = -(-ncb // span)
    a = active
    if w * span != ncb:
        a = jnp.pad(a, ((0, 0), (0, w * span - ncb)))
    return a.reshape(nrb, w, span).sum(axis=(0, 2), dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("total", "pad_mode", "width"))
def _tile_list_dev_call(active, n_tiles_dev, total, pad_mode, base, width):
    # ``base`` is traced (dynamic_slice_in_dim accepts a traced start),
    # so all column windows of the same width share ONE compiled
    # program -- per-base programs cost ~3-5s each through the remote
    # compiler and are exactly the ones precompile cannot warm
    win = active if width is None else \
        jax.lax.dynamic_slice_in_dim(active, base, width, axis=1)
    ti, tj = jnp.nonzero(win, size=total, fill_value=0)
    ar = jnp.arange(total, dtype=jnp.int32)
    valid = ar < n_tiles_dev
    last = jnp.maximum(n_tiles_dev - 1, 0)
    ti = jnp.where(valid, ti, jnp.take(ti, last)).astype(jnp.int32)
    tj = jnp.asarray(tj, jnp.int32) + (0 if width is None else base)
    if pad_mode == "repeat":
        tj = jnp.where(valid, tj, jnp.take(tj, last))
    else:
        tj = jnp.where(valid, tj, -1)
    return ti, tj


def tile_list_device(active_dev, n_tiles, pad_mode="repeat",
                     max_entries=MAX_TILE_ENTRIES, base=0, width=None,
                     quantize_chunks=False):
    """Device twin of tile_list: same row-major order, same (n_chunks,
    bucket) stacking, tiles stay on device. ``n_tiles`` is the host
    count (from window_counts_device); ``base``/``width`` restrict to a
    column window, with GLOBAL tj emitted. Returns None when empty.

    ``quantize_chunks`` rounds the chunk count up to a power of two by
    repeat-padding (valid for idempotent consumers only): the static
    ``total`` in the compiled nonzero program then takes O(log^2)
    distinct values instead of one per active-tile count -- at big N
    each distinct total is a fresh ~3-5s remote compile."""
    if n_tiles == 0:
        return None
    bucket = chunk_bucket(n_tiles, max_entries)
    n_chunks = -(-n_tiles // bucket)
    if quantize_chunks and n_chunks > 1:
        n_chunks = 1 << int(np.ceil(np.log2(n_chunks)))
    ti, tj = _tile_list_dev_call(active_dev, jnp.int32(n_tiles),
                                 n_chunks * bucket, pad_mode,
                                 jnp.int32(base), width)
    return ti.reshape(n_chunks, bucket), tj.reshape(n_chunks, bucket)


def tile_list_device_split(active_dev, n_tiles, n_dev, pad_mode="repeat",
                           max_entries=MAX_TILE_ENTRIES, base=0,
                           width=None):
    """Device twin of split_tiles_balanced over an (optional) column
    window: the row-major window tile list is round-robin dealt over
    ``n_dev`` devices ON DEVICE (element k -> device k % n_dev, the same
    assignment as the host splitter) and stacked to a common (n_dev,
    n_chunks, bucket) shape -- the host never materializes the O(tiles)
    list. Each device's subsequence stays row-major sorted; repeat pads
    copy the window's LAST real tile (in-window, idempotent under the
    min-merge kernels -- devices dealt zero real tiles are all-pad),
    noop pads carry tj = -1. The bucket policy matches the host splitter
    (sized by the longest per-device share). Returns (ti_dev, tj_dev,
    counts) with counts the per-device real tile counts (host int64,
    derived from ``n_tiles`` alone), or None when empty."""
    if n_tiles == 0:
        return None
    longest = -(-n_tiles // n_dev)
    per_chunk = min(max(longest, 1), max_entries)
    bucket = 1 << int(np.ceil(np.log2(max(per_chunk, 1024))))
    bucket = min(bucket, max_entries)
    n_chunks = -(-longest // bucket)
    total = n_dev * n_chunks * bucket
    ti, tj = _tile_list_dev_call(active_dev, jnp.int32(n_tiles), total,
                                 pad_mode, jnp.int32(base), width)
    # flat element k lands at reshape row k // n_dev, column k % n_dev:
    # transposing gives device d the strided subsequence k = d (mod
    # n_dev) in original (row-major) order
    ti_dev = ti.reshape(n_chunks * bucket, n_dev).T.reshape(
        n_dev, n_chunks, bucket)
    tj_dev = tj.reshape(n_chunks * bucket, n_dev).T.reshape(
        n_dev, n_chunks, bucket)
    counts = np.asarray([-(-(n_tiles - d) // n_dev) if d < n_tiles else 0
                         for d in range(n_dev)], dtype=np.int64)
    return ti_dev, tj_dev, counts


@jax.jit
def rmask_gather_device(planes, ti, tj):
    """Per-tile radius bitmask gathered from (R, nrb, ncb) device planes
    (device twin of DensityEngine._pops_rmask): bit r set iff the tile
    is admissible at radius r; pad entries (tj < 0) carry mask 0."""
    tj_safe = jnp.maximum(tj, 0)
    bits = planes[:, ti, tj_safe].astype(jnp.int32)
    weights = (1 << jnp.arange(planes.shape[0], dtype=jnp.int32))
    rmask = jnp.tensordot(weights, bits, axes=1)
    return jnp.where(tj >= 0, rmask, 0).astype(jnp.int32)


@jax.jit
def act_rows_bool_device(d2b, row_ub):
    """Device bool activity mask d2b <= row_ub[:, None] (the unpacked
    twin of _pack_le_rows, for the big-N device planner)."""
    return d2b <= row_ub[:, None]
