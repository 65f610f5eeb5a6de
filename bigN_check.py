"""Large-N validation of the column-partitioned bidirectional kernels.

Round 2's bidirectional pops/NN kernels silently fell back to symmetric
sweeps when their VMEM column accumulator outgrew ~64MB (≈4-5M frames) —
losing the 2x evaluation saving exactly where N^2 hurts most. The
kernels now split the accumulator into column-range partitions (see
pops_tiles_bidir_all / nn_tiles_bidir_all), so any N runs
bidirectionally; the reference's tiling has no cap either
(src/density_clustering_cuda_kernels.cu:25-31).

This driver proves it on hardware:
  1. at N=2^21: bidirectional == symmetric bit-exact for pops and NN,
     a forced-partition run (tiny VMEM budget) == the unforced run, and
     (round 4) the DEVICE-PLANNED run (CLUSTERING_TPU_DEVICE_PLAN=1:
     masks + tile lists stay on device, pruning.tile_list_device) == the
     host-planned run;
  2. at N=BIG (default 2^24 = 16M frames): pops + NN run with the
     partitioned bidirectional kernels under the device planner (auto
     above 2^22), wall times + sub-stage breakdown recorded -- round 3's
     host planner spent t_plan 760s + t_band 1502s here.

Writes BIGN_r04.json.  env: BIGN_VERIFY_N, BIGN_BIG_N, BIGN_OUT,
BIGN_SKIP_BIG.
"""

import json
import os
import sys
import time

import numpy as np

VERIFY_N = int(os.environ.get("BIGN_VERIFY_N", 1 << 21))
BIG_N = int(os.environ.get("BIGN_BIG_N", 1 << 24))
OUT = os.environ.get("BIGN_OUT", "BIGN_r04.json")
ROW_BLOCK = 128
COL_BLOCK = 4096
RADII = [0.10, 0.15, 0.20]


def _p(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    from bench import synthetic_fel
    from clustering_tpu import ops

    result = {"device": str(jax.devices()[0]), "stages": {}}

    # --- 1. bit-exact verification at VERIFY_N ---
    coords = synthetic_fel(VERIFY_N, 4)
    result["verify_n"] = VERIFY_N

    def engine(**over):
        eng = ops.engine.DensityEngine(coords, row_block=ROW_BLOCK,
                                       col_block=COL_BLOCK,
                                       backend="pallas")
        for k, v in over.items():
            setattr(eng, k, v)
        return eng

    _p("verify phase: pops bidir")
    t0 = time.perf_counter()
    eng_b = engine()
    pops_b = eng_b.populations(RADII)
    result["stages"]["pops_bidir"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _p("verify phase: pops symmetric")
    pops_s = engine(POPS_BIDIR_SCRATCH_CAP=0).populations(RADII)
    result["stages"]["pops_symmetric"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _p("verify phase: pops partitioned")
    pops_p = engine(POPS_BIDIR_SCRATCH_CAP=8 << 20).populations(RADII)
    result["stages"]["pops_partitioned"] = round(
        time.perf_counter() - t0, 3)
    checks = {
        "pops_bidir_eq_symmetric": bool(all(
            np.array_equal(pops_b[r], pops_s[r]) for r in RADII)),
        "pops_partitioned_eq": bool(all(
            np.array_equal(pops_b[r], pops_p[r]) for r in RADII)),
    }

    fe = ops.free_energies(pops_b[RADII[0]])
    t0 = time.perf_counter()
    _p("verify phase: nn bidir")
    nn_b = eng_b.nearest_neighbors(fe)
    result["stages"]["nn_bidir"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _p("verify phase: nn symmetric")
    nn_s = engine(NN_BIDIR_SCRATCH_CAP=0).nearest_neighbors(fe)
    result["stages"]["nn_symmetric"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _p("verify phase: nn partitioned")
    nn_p = engine(NN_BIDIR_SCRATCH_CAP=8 << 20).nearest_neighbors(fe)
    result["stages"]["nn_partitioned"] = round(time.perf_counter() - t0, 3)
    checks["nn_bidir_eq_symmetric"] = bool(
        all(np.array_equal(a, b) for a, b in zip(nn_b, nn_s)))
    checks["nn_partitioned_eq"] = bool(
        all(np.array_equal(a, b) for a, b in zip(nn_b, nn_p)))

    # device-planned pops + NN (masks/tile lists device-resident) must
    # be bit-equal to the host-planned baseline above
    _p("verify phase: device plan (pops + nn)")
    os.environ["CLUSTERING_TPU_DEVICE_PLAN"] = "1"
    t0 = time.perf_counter()
    eng_d = engine()
    pops_d = eng_d.populations(RADII, nn_band_radius=RADII[0])
    result["stages"]["pops_device_plan"] = round(
        time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    nn_d = eng_d.nearest_neighbors(fe)
    result["stages"]["nn_device_plan"] = round(time.perf_counter() - t0, 3)
    os.environ.pop("CLUSTERING_TPU_DEVICE_PLAN", None)
    checks["pops_device_plan_eq"] = bool(all(
        np.array_equal(pops_b[r], pops_d[r]) for r in RADII))
    checks["nn_device_plan_eq"] = bool(
        all(np.array_equal(a, b) for a, b in zip(nn_b, nn_d)))
    result["nn_device_plan_stats"] = {
        k: v for k, v in eng_d.last_stats["nn"].items()
        if isinstance(v, (int, float, str, bool))}
    result["checks"] = checks

    # --- 2. the 16M-frame partitioned-bidir run ---
    if not os.environ.get("BIGN_SKIP_BIG"):
        del coords, pops_b, pops_s, pops_p, nn_b, nn_s, nn_p, nn_d, \
            pops_d, eng_b, eng_d
        _p(f"big phase: generating {BIG_N} frames")
        coords = synthetic_fel(BIG_N, 4)
        result["big_n"] = BIG_N
        eng = ops.engine.DensityEngine(coords, row_block=ROW_BLOCK,
                                       col_block=COL_BLOCK,
                                       backend="pallas")
        t0 = time.perf_counter()
        _p("big phase: pops (device plan auto, band prefetch)")
        pops = eng.populations(RADII, nn_band_radius=RADII[0])
        result["stages"]["big_pops_bidir"] = round(
            time.perf_counter() - t0, 3)
        result["big_pops_stats"] = {
            k: v for k, v in eng.last_stats["populations"].items()
            if isinstance(v, (int, float, str, bool))}
        result["big_pops_mode"] = eng.last_stats["populations"].get(
            "mode", "bidir")
        fe = ops.free_energies(pops[RADII[0]])
        t0 = time.perf_counter()
        _p("big phase: nn")
        nn = eng.nearest_neighbors(fe)
        result["stages"]["big_nn_bidir"] = round(
            time.perf_counter() - t0, 3)
        result["big_nn_stats"] = {
            k: v for k, v in eng.last_stats["nn"].items()
            if isinstance(v, (int, float, str, bool))}
        result["big_nn_finite"] = bool(np.isfinite(nn[1][:BIG_N]).all())
        st = eng.last_stats["nn"]
        plan_band = st.get("t_band", 0.0) + st.get("t_plan", 0.0)
        result["big_nn_plan_band_frac"] = round(
            plan_band / max(result["stages"]["big_nn_bidir"], 1e-9), 3)

    result["notes"] = (
        "wall times are single cold runs through the remote tunnel: the "
        "first stage of each kind pays every distinct-shape XLA compile "
        "(~3-5s each, remote) and any tunnel stalls (wedges self-recover "
        "in ~3-5min); the bit-equality checks are the artifact's point. "
        "Warm per-stage rates live in BENCH_r*.json.")
    result["ok"] = all(checks.values())
    print(json.dumps(result, indent=1))
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    if not result["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
