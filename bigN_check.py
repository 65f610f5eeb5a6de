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

Writes BIGN_r05.json.  env: BIGN_VERIFY_N, BIGN_BIG_N, BIGN_OUT,
BIGN_SKIP_BIG, BIGN_SKIP_VERIFY (big phase only, for plan-cost probes;
the published artifact must keep the verify phase), BIGN_SKIP_SCREENING,
BIGN_SCR_XLA(_FRAC), BIGN_SCR_THRESHOLDS, BIGN_LEDGER (path: record
per-program compile walls and attach a per-stage summary).
"""

import json
import os
import sys
import time

import numpy as np

VERIFY_N = int(os.environ.get("BIGN_VERIFY_N", 1 << 21))
BIG_N = int(os.environ.get("BIGN_BIG_N", 1 << 24))
OUT = os.environ.get("BIGN_OUT", "BIGN_r05.json")
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

    ledger_path = os.environ.get("BIGN_LEDGER")
    if ledger_path:
        from clustering_tpu.utils import compile_ledger
        compile_ledger.install(ledger_path)

    def ledger_cut(tag, marks={}):
        """Cumulative compile seconds at this point; per-stage deltas
        let the big-phase walls separate in-stage XLA compiles from
        execution/tunnel time."""
        if not ledger_path:
            return
        total = n = 0.0
        try:
            with open(ledger_path) as fh:
                for line in fh:
                    ev = json.loads(line)
                    if "compile" in ev.get("event", ""):
                        total += ev.get("secs", 0.0)
                        n += 1
        except OSError:
            pass
        marks[tag] = {"cum_compile_s": round(total, 1), "programs": int(n)}
        result.setdefault("ledger_marks", marks)

    result = {"device": str(jax.devices()[0]), "stages": {}}
    skip_verify = os.environ.get("BIGN_SKIP_VERIFY") == "1"
    if skip_verify:
        result["verify_skipped"] = True

    # --- 1. bit-exact verification at VERIFY_N ---
    coords = synthetic_fel(VERIFY_N, 4)
    result["verify_n"] = VERIFY_N

    checks = {}
    if not skip_verify:
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

        # screening at VERIFY_N (round 5: the stage had never been validated
        # above 2^20): device-planned pallas vs host-planned pallas vs the
        # independent XLA fallback, identity seeds, one threshold admitting
        # BIGN_SCR_XLA_FRAC of the frames, bit-equal labels required
        md2 = np.float32(4.0 * ops.neighbors.compute_sigma2(nn_b[1]))
        frac = float(os.environ.get("BIGN_SCR_XLA_FRAC", "0.5"))
        order = np.argsort(fe, kind="stable")
        cs = coords[order]
        n_below = int(frac * VERIFY_N)
        labels0 = np.arange(VERIFY_N, dtype=np.int32)
        _p("verify phase: screening pallas (device plan)")
        os.environ["CLUSTERING_TPU_DEVICE_PLAN"] = "1"
        t0 = time.perf_counter()
        lab_d = ops.screening.ScreeningEngine(
            cs, row_block=ROW_BLOCK, col_block=COL_BLOCK,
            backend="pallas").run(labels0, n_below, md2)
        result["stages"]["screening_device_plan"] = round(
            time.perf_counter() - t0, 3)
        _p("verify phase: screening pallas (host plan)")
        os.environ["CLUSTERING_TPU_DEVICE_PLAN"] = "0"
        t0 = time.perf_counter()
        lab_h = ops.screening.ScreeningEngine(
            cs, row_block=ROW_BLOCK, col_block=COL_BLOCK,
            backend="pallas").run(labels0, n_below, md2)
        result["stages"]["screening_host_plan"] = round(
            time.perf_counter() - t0, 3)
        os.environ.pop("CLUSTERING_TPU_DEVICE_PLAN", None)
        checks["screening_device_plan_eq"] = bool(
            np.array_equal(lab_d, lab_h))
        result["screening_verify"] = {"n_below": n_below,
                                      "max_dist2": float(md2)}
        if os.environ.get("BIGN_SCR_XLA", "1") != "0":
            _p("verify phase: screening XLA fallback (same labels required)")
            t0 = time.perf_counter()
            lab_x = ops.screening.ScreeningEngine(
                cs, row_block=ROW_BLOCK, col_block=COL_BLOCK,
                backend="xla").run(labels0, n_below, md2)
            result["stages"]["screening_xla"] = round(
                time.perf_counter() - t0, 3)
            checks["screening_xla_eq"] = bool(np.array_equal(lab_d, lab_x))
            del lab_x
        result["checks"] = checks
        del lab_d, lab_h, cs, order

    # --- 2. the 16M-frame partitioned-bidir run ---
    if not os.environ.get("BIGN_SKIP_BIG"):
        if not skip_verify:
            del pops_b, pops_s, pops_p, nn_b, nn_s, nn_p, nn_d, \
                pops_d, eng_b, eng_d
        del coords
        _p(f"big phase: generating {BIG_N} frames")
        coords = synthetic_fel(BIG_N, 4)
        result["big_n"] = BIG_N
        eng = ops.engine.DensityEngine(coords, row_block=ROW_BLOCK,
                                       col_block=COL_BLOCK,
                                       backend="pallas")
        # the CLI's precompile warms (device-plan windowed sweep
        # programs at the exact production chunk shapes, 96f0583): the
        # r4 16M artifact predates them and carried ~150s/stage of
        # one-time first-execution cost -- this run records the walls
        # WITH the warm threads, like production (VERDICT r5 item 3)
        import threading
        threading.Thread(target=eng.precompile_pops, args=(RADII,),
                         daemon=True).start()
        threading.Thread(target=eng.precompile_nn, daemon=True).start()
        ledger_cut("before_big_pops")
        t0 = time.perf_counter()
        _p("big phase: pops (device plan auto, band prefetch, warm on)")
        pops = eng.populations(RADII, nn_band_radius=RADII[0])
        result["stages"]["big_pops_bidir"] = round(
            time.perf_counter() - t0, 3)
        ledger_cut("after_big_pops")
        result["big_pops_stats"] = {
            k: v for k, v in eng.last_stats["populations"].items()
            if isinstance(v, (int, float, str, bool))}
        # the device-plan sub-stage walls (VERDICT r5 item 6): t_plan =
        # best_sort (host sorts + bbox matrices + skip-frac readbacks,
        # per-order detail) + window_counts (mask dispatch + count
        # fetch) + tile_lists (per-window nonzero/rmask dispatches)
        pp = eng.last_stats["populations"].get("plan_parts")
        if pp:
            result["big_pops_plan_parts"] = {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in pp.items()}
        result["big_pops_mode"] = eng.last_stats["populations"].get(
            "mode", "bidir")
        fe = ops.free_energies(pops[RADII[0]])
        # production-like overlap (models/density.py does the same in
        # the CLI): build the threshold-series screener and compile its
        # fixpoint/planning programs DURING the NN stage -- the build is
        # host work (morton sort) while NN is device-bound, and the
        # early warm is compile-only (jit.lower().compile(): zero device
        # execution) off a band-bound sigma2 estimate that quantizes to
        # the same compiled shapes. The first BIGN_r05 run started the
        # precompile at t0 of the series instead and paid every compile
        # in-stage (plan_frac 0.63).
        thresholds = [np.float32(t) for t in
                      (float(x) for x in os.environ.get(
                          "BIGN_SCR_THRESHOLDS",
                          "0.5,1.0,1.5,2.0").split(","))]
        series_box = {}
        skip_scr = os.environ.get("BIGN_SKIP_SCREENING") == "1"

        def _build_series():
            try:
                # estimate FIRST: the NN stage consumes the band
                # prefetch stash early, and the series build below takes
                # ~2 min at 16M (the first run ordered these backwards
                # and the warm never fired)
                est = eng.band_sigma2_estimate()
                series_box["sigma2_est"] = (None if est is None
                                            else round(est, 6))
                t_b = time.perf_counter()
                s = ops.screening.ThresholdSeriesScreener(
                    coords, fe, thresholds, row_block=ROW_BLOCK,
                    col_block=COL_BLOCK)
                series_box["build_s"] = round(
                    time.perf_counter() - t_b, 3)
                series_box["series"] = s
                if est is not None:
                    t_c = time.perf_counter()
                    s.precompile(np.float32(4.0 * est),
                                 compile_only=True)
                    series_box["early_warm_s"] = round(
                        time.perf_counter() - t_c, 3)
            except Exception as exc:  # pragma: no cover - forensics only
                series_box["error"] = repr(exc)
        if not skip_scr:
            bthread = threading.Thread(target=_build_series, daemon=True)
            bthread.start()
        t0 = time.perf_counter()
        _p("big phase: nn")
        nn = eng.nearest_neighbors(fe)
        result["stages"]["big_nn_bidir"] = round(
            time.perf_counter() - t0, 3)
        ledger_cut("after_big_nn")
        result["big_nn_stats"] = {
            k: v for k, v in eng.last_stats["nn"].items()
            if isinstance(v, (int, float, str, bool))}
        result["big_nn_finite"] = bool(np.isfinite(nn[1][:BIG_N]).all())
        st = eng.last_stats["nn"]
        plan_band = st.get("t_band", 0.0) + st.get("t_plan", 0.0)
        result["big_nn_plan_band_frac"] = round(
            plan_band / max(result["stages"]["big_nn_bidir"], 1e-9), 3)

        # --- 16M screening series (VERDICT r5 item 1: the stage had
        # never run above 2^20 and host-planned its tile lists) ---
        if not skip_scr:
            # free the density engine's device caches first: the bbox
            # matrices alone hold 2GB per order at 16M and the screener
            # needs its own coords upload + transient bbox matrix
            md2_big = np.float32(
                4.0 * ops.neighbors.compute_sigma2(nn[1]))
            eng._dev.clear()
            del eng
            _p(f"big phase: screening series x{len(thresholds)}"
               " (device plan auto, hd seeds)")
            bthread.join(timeout=600)
            if "series" not in series_box:
                raise RuntimeError("series build failed: "
                                   + series_box.get("error", "timeout"))
            series = series_box["series"]
            series.set_hd_neighbors((nn[2], nn[3]))
            t_build = series_box["build_s"]
            result["big_screening_overlap"] = {
                k: v for k, v in series_box.items() if k != "series"}
            threading.Thread(target=series.precompile, args=(md2_big,),
                             daemon=True).start()
            from concurrent.futures import ThreadPoolExecutor
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=2) as pool:
                futs = [series.step_submit(k, md2_big, pool)
                        for k in range(len(thresholds))]
                last = futs[-1].result()
            t_series = time.perf_counter() - t0
            ledger_cut("after_big_screening")
            n_states = int(len(np.unique(last[last > 0])))
            steps = [
                {k2: (round(v, 4) if isinstance(v, float) else v)
                 for k2, v in st.items() if k2 != "tile_pairs"}
                for st in series.per_step_stats]
            t_plan_sum = sum(st.get("t_plan", 0.0)
                             for st in series.per_step_stats)
            result["big_screening"] = {
                "thresholds": [float(t) for t in thresholds],
                "n_below": [int(series.n_below_per_band[k])
                            for k in range(len(thresholds))],
                "build_seconds": round(t_build, 3),
                "series_seconds": round(t_series, 3),
                "plan_seconds_sum": round(t_plan_sum, 3),
                "plan_frac_of_wall": round(
                    t_plan_sum / max(t_series, 1e-9), 4),
                "states_at_last": n_states,
                "per_step": steps,
            }
            result["stages"]["big_screening_series"] = round(
                t_series, 3)

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
