"""Hardware validation of the mesh/shard_map Pallas path.

Round 2 validated every sharded program (pops / NN / screening bidir
kernels under shard_map, parallel/sharded.py) only on the virtual CPU
mesh, where Pallas runs INTERPRETED -- Mosaic lowering of those kernels
with their VMEM accumulators, CompilerParams and collectives was unproven
on the hardware this project targets. This driver closes that gap on
whatever real devices are attached (a 1-device v5e mesh through the axon
tunnel here; any larger mesh works unchanged):

  * builds ``Mesh(jax.devices()[:n])`` on the REAL platform,
  * runs mesh pops + mesh NN + a 2-threshold
    ``ThresholdSeriesScreener(mesh=..., backend='pallas')`` at N>=2^18,
  * asserts bit-equality with the single-chip ``DensityEngine`` pipeline
    on the same chip,
  * records wall times + equality verdicts in ``MESH_TPU_r03.json``.

The reference's multi-device story runs on its own hardware
(src/density_clustering_cuda.cu:139-182 drives one thread per GPU); this
is the equivalent evidence for the shard_map path.

Usage:  python mesh_check.py            # N=2^18, 1-device mesh
  env:  MESH_N, MESH_DEVICES, MESH_ROW_BLOCK, MESH_COL_BLOCK, MESH_OUT
"""

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("MESH_N", 1 << 18))
D = int(os.environ.get("MESH_D", 4))
N_DEV = int(os.environ.get("MESH_DEVICES", 1))
ROW_BLOCK = int(os.environ.get("MESH_ROW_BLOCK", 128))
COL_BLOCK = int(os.environ.get("MESH_COL_BLOCK", 4096))
OUT = os.environ.get("MESH_OUT", "MESH_TPU_r03.json")
RADII = [0.10, 0.15, 0.20]
THRESHOLDS = [1.0, 2.0]


def _best_of(fn, reps=2):
    fn()  # warm (compile + upload)
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax

    # honor JAX_PLATFORMS even under out-of-tree platform plugins that
    # register regardless (same workaround as cli._setup_jax_runtime)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    from bench import synthetic_fel
    from clustering_tpu import ops
    from clustering_tpu.parallel import mesh as pmesh

    devs = jax.devices()
    platform = devs[0].platform
    mesh = pmesh.make_mesh(devices=devs[:N_DEV])
    print(f"# platform={platform} mesh={mesh}", file=sys.stderr)

    coords = synthetic_fel(N, D)
    result = {
        "n_frames": N,
        "n_devices": N_DEV,
        "platform": platform,
        "device": str(devs[0]),
        "row_block": ROW_BLOCK,
        "col_block": COL_BLOCK,
        "interpret_mode": bool(
            __import__("clustering_tpu.ops.pallas_kernels",
                       fromlist=["INTERPRET_MODE"]).INTERPRET_MODE()),
        "stages": {},
    }

    # --- single-chip oracle (same chip, same blocks) ---
    eng = ops.engine.DensityEngine(coords, row_block=ROW_BLOCK,
                                   col_block=COL_BLOCK, backend="pallas")
    t, pops1 = _best_of(lambda: eng.populations(RADII))
    result["stages"]["pops_single"] = round(t, 3)
    fe = ops.free_energies(pops1[RADII[0]])
    t, nn1 = _best_of(lambda: eng.nearest_neighbors(fe))
    result["stages"]["nn_single"] = round(t, 3)
    max_dist2 = np.float32(4.0 * ops.neighbors.compute_sigma2(nn1[1]))
    series1 = ops.screening.ThresholdSeriesScreener(
        coords, fe, THRESHOLDS, row_block=ROW_BLOCK, col_block=COL_BLOCK,
        backend="pallas", hd_neighbors=(nn1[2], nn1[3]))

    def run_series(series):
        # the production driving mode: postludes overlap the next step
        from concurrent.futures import ThreadPoolExecutor
        series.reset()
        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [series.step_submit(k, max_dist2, pool)
                    for k in range(len(THRESHOLDS))]
            return futs[-1].result()

    t, clust1 = _best_of(lambda: run_series(series1))
    result["stages"]["screening_single"] = round(t, 3)

    # --- mesh path: Mosaic-compiled shard_map programs on hardware ---
    meng = ops.engine.DensityEngine(coords, row_block=ROW_BLOCK,
                                    col_block=COL_BLOCK, backend="pallas",
                                    mesh=mesh)
    t, pops2 = _best_of(lambda: meng.populations(RADII))
    result["stages"]["pops_mesh"] = round(t, 3)
    t, nn2 = _best_of(lambda: meng.nearest_neighbors(fe))
    result["stages"]["nn_mesh"] = round(t, 3)
    # tiered bidirectional phase 2 under the mesh (explicit quantiles;
    # the auto gate needs larger N to deem the plan worthwhile)
    tqs = (0.5, 0.9, 0.99)
    t, nn2t = _best_of(lambda: meng.nearest_neighbors(fe, tier_qs=tqs))
    result["stages"]["nn_mesh_tiered"] = round(t, 3)
    assert meng.last_stats["nn"]["mode"] == "tiered", meng.last_stats["nn"]
    series2 = ops.screening.ThresholdSeriesScreener(
        coords, fe, THRESHOLDS, row_block=ROW_BLOCK, col_block=COL_BLOCK,
        backend="pallas", mesh=mesh, hd_neighbors=(nn2[2], nn2[3]))
    t, clust2 = _best_of(lambda: run_series(series2))
    result["stages"]["screening_mesh"] = round(t, 3)

    # --- column-range-partitioned mesh bidir programs: force the
    # per-chip VMEM scratch budget down so the pops/NN sweeps split into
    # ~4 column windows (the no-frame-count-cap path used beyond ~4-5M
    # frames), and prove the windowed shard_map programs Mosaic-compile
    # and reproduce the full-range results on hardware.
    ncb = meng.n_pad // COL_BLOCK
    win = max(ncb // 4, 1)
    meng2 = ops.engine.DensityEngine(coords, row_block=ROW_BLOCK,
                                     col_block=COL_BLOCK,
                                     backend="pallas", mesh=mesh)
    meng2.POPS_BIDIR_SCRATCH_CAP = win * COL_BLOCK * 4 * len(RADII)
    meng2.NN_BIDIR_SCRATCH_CAP = win * COL_BLOCK * 16
    t, pops3 = _best_of(lambda: meng2.populations(RADII))
    result["stages"]["pops_mesh_partitioned"] = round(t, 3)
    result["pops_mesh_col_partitions"] = \
        meng2.last_stats["populations"].get("col_partitions", 1)
    t, nn3 = _best_of(lambda: meng2.nearest_neighbors(fe))
    result["stages"]["nn_mesh_partitioned"] = round(t, 3)

    # --- collective payloads: the per-device bytes each mesh program
    # moves over ICI, computed from the shapes the programs above actually
    # ran (BASELINE.md's "4-16MB per merge" claim, made concrete). The
    # psum/pmin payload is frame-axis-replicated output state, so it is
    # INDEPENDENT of device count -- scaling to v5e-8 changes only the
    # ring hop count, not these numbers.
    n_pad = meng.n_pad
    result["collectives"] = {
        "pops_psum_bytes": len(RADII) * n_pad * 4,
        "nn_pmin_bytes_per_merge": 2 * n_pad * 4,
        "nn_pmin_merges": 2 * 2,  # (d, j) x (band, phase-2 sweep)
        "screening_pmin_bytes_per_sweep": n_pad * 4,
        "coords_replicate_bytes": D * n_pad * 4,
    }

    checks = {}
    pops_eq = all(np.array_equal(pops1[r], pops2[r]) for r in RADII)
    checks["pops_bit_equal"] = bool(pops_eq)
    checks["nn_idx_equal"] = bool(
        np.array_equal(nn1[0], nn2[0]) and np.array_equal(nn1[2], nn2[2]))
    dist_eq = bool(
        np.array_equal(nn1[1], nn2[1]) and np.array_equal(nn1[3], nn2[3]))
    checks["nn_dist_equal"] = dist_eq
    checks["nn_tiered_idx_equal"] = bool(
        np.array_equal(nn1[0], nn2t[0]) and np.array_equal(nn1[2], nn2t[2]))
    tiered_dist_eq = bool(
        np.array_equal(nn1[1], nn2t[1]) and np.array_equal(nn1[3], nn2t[3]))
    checks["nn_tiered_dist_equal"] = tiered_dist_eq
    checks["screening_bit_equal"] = bool(np.array_equal(clust1, clust2))
    checks["pops_partitioned_bit_equal"] = bool(
        all(np.array_equal(pops1[r], pops3[r]) for r in RADII))
    checks["nn_partitioned_idx_equal"] = bool(
        np.array_equal(nn1[0], nn3[0]) and np.array_equal(nn1[2], nn3[2]))
    part_dist_eq = bool(
        np.array_equal(nn1[1], nn3[1]) and np.array_equal(nn1[3], nn3[3]))
    checks["nn_partitioned_dist_equal"] = part_dist_eq
    if not dist_eq:
        # On real hardware both paths run the same Mosaic kernel and the
        # distances must be bit-identical. Under CPU *interpret* mode the
        # Pallas interpreter lowers through XLA:CPU, whose mul+add
        # contraction can differ between the plain and shard_map-wrapped
        # programs (same 1-ulp class as the TPU<->CPU deviation in
        # docs/PARITY.md); indices and partitions must still agree.
        rel = max(
            float(np.max(np.abs(nn1[1] - nn2[1])
                         / np.maximum(nn1[1], np.float32(1e-30)))),
            float(np.max(np.abs(nn1[3] - nn2[3])
                         / np.maximum(nn1[3], np.float32(1e-30)))))
        result["nn_dist_max_rel_diff"] = rel
        checks["nn_dist_1ulp"] = rel <= 2.4e-7
    result["checks"] = checks
    required = dict(checks)
    if platform == "cpu" and not dist_eq:
        required.pop("nn_dist_equal")
    if platform == "cpu" and not part_dist_eq:
        # same XLA:CPU fma-contraction class as nn_dist_equal above;
        # on real hardware the windowed sweeps must be bit-identical
        required.pop("nn_partitioned_dist_equal")
    if platform == "cpu" and not tiered_dist_eq:
        required.pop("nn_tiered_dist_equal")
    result["ok"] = all(required.values())
    print(json.dumps(result, indent=1))
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    if not result["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
