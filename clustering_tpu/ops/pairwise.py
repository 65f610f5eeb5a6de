"""Blockwise pairwise squared-distance primitives.

The N x N frame-pair interaction is the FLOP core of density clustering
(reference hot loops: src/density_clustering.cpp:155-193 [pops],
:256-286 [NN]; CUDA tiles: src/density_clustering_cuda_kernels.cu:9-130).
On TPU we never materialize the N x N matrix in HBM: callers stream column
blocks through VMEM-sized tiles and reduce on the fly.

Two distance modes:
  * ``exact``  -- per-dimension accumulation of (x_d - y_d)^2 on the VPU.
    Bitwise-stable order (ascending d), matches the reference's scalar loop
    semantics; the right choice for the typical D <= 16 collective-variable
    inputs where a matmul would waste MXU K-padding anyway.
  * ``mxu``    -- |x|^2 + |y|^2 - 2 x.y via an fp32 matmul on the MXU for
    large D.
"""

import functools

import jax
import jax.numpy as jnp

# use the exact VPU path for D below this, the MXU path above
MXU_MIN_DIM = 24


def sq_dists_exact(x, y):
    """(B, D), (C, D) -> (B, C) squared euclidean distances.

    Per-dimension accumulation in ascending-d order (fp32), mirroring the
    reference inner loop (src/density_clustering.cpp:172-176).
    """
    d = x.shape[1]
    acc = jnp.zeros((x.shape[0], y.shape[0]), dtype=jnp.float32)
    for k in range(d):
        diff = x[:, k][:, None] - y[:, k][None, :]
        acc = acc + diff * diff
    return acc


def sq_dists_mxu(x, y):
    """(B, D), (C, D) -> (B, C) via the |x|^2 + |y|^2 - 2 x.y identity.

    fp32 matmul on the MXU; clamped at zero (the identity can go slightly
    negative under rounding).
    """
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    xy = jax.lax.dot_general(
        x, y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.maximum(xx + yy - 2.0 * xy, 0.0)


def sq_dists(x, y):
    if x.shape[1] >= MXU_MIN_DIM:
        return sq_dists_mxu(x, y)
    return sq_dists_exact(x, y)


def cdiv(a, b):
    return -(-a // b)


def pad_rows(arr, block, fill=0):
    """Pad axis 0 of ``arr`` up to a multiple of ``block``."""
    n = arr.shape[0]
    n_pad = cdiv(n, block) * block - n
    if n_pad == 0:
        return arr
    widths = [(0, n_pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths, constant_values=fill)


del functools
