"""Paired hardware A/B of the screening label-download prefetch.

Round-5 change: step/step_submit enqueue the postlude's (value-narrowed)
label download right behind the step's own fixpoint and start the D2H
asynchronously (_prefetch_labels); before, the slice program was
dispatched from the postlude worker AFTER later steps' sweeps were
queued, serializing each step's fetch behind their compute (BENCH_r04
per_step: t_fetch 0.13-0.2s/step even for tiny prefixes).

Runs the production series drive (step_submit + postlude pool) at N
(default 2^20) for a 4-step (bench config) and a 16-step series,
prefetch ON vs OFF (CLUSTERING_TPU_SCREEN_PREFETCH=0, read at runtime),
interleaved best-of-REPS, and verifies every step's clustering is
bit-identical across arms.

Writes SCREEN_AB_r05.json. Usage: python screen_steps_ab.py
"""

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

N = int(os.environ.get("AB_N", 1 << 20))
REPS = int(os.environ.get("AB_REPS", 3))


def main():
    import jax
    from clustering_tpu import ops
    from bench import synthetic_fel

    t00 = time.perf_counter()

    def _p(msg):
        print(f"[{time.perf_counter() - t00:7.1f}s] {msg}", flush=True)

    dev = jax.devices()[0]
    _p(f"device {dev}")
    coords = synthetic_fel(N, 4)
    engine = ops.engine.DensityEngine(coords, row_block=128,
                                      col_block=4096)
    pops = engine.populations([0.10], nn_band_radius=0.10)
    _p("pops done")
    fe = ops.free_energies(pops[0.10])
    nn = engine.nearest_neighbors(fe)
    _p("nn done")
    max_dist2 = np.float32(4.0 * ops.neighbors.compute_sigma2(nn[1]))

    fmax = float(np.nanmax(fe[np.isfinite(fe)]))
    series_cfgs = {
        "steps4": [np.float32(t) for t in (0.5, 1.0, 1.5, 2.0)],
        "steps16": [np.float32(round(fmax * (k + 1) / 17.0, 4))
                    for k in range(16)],
    }

    out = {"device": str(dev), "n": N, "reps": REPS, "series": {}}
    for name, thresholds in series_cfgs.items():
        series = ops.screening.ThresholdSeriesScreener(
            coords, fe, thresholds, row_block=128, col_block=4096,
            hd_neighbors=(nn[2], nn[3]))

        def run_series():
            series.reset()
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=2) as pool:
                futs = [series.step_submit(k, max_dist2, pool)
                        for k in range(len(thresholds))]
                outs = [f.result() for f in futs]
            wall = time.perf_counter() - t0
            return wall, outs, list(series.per_step_stats)

        run_series()  # warm (both arms share every compiled program)
        _p(f"{name}: warm on done")
        os.environ["CLUSTERING_TPU_SCREEN_PREFETCH"] = "0"
        run_series()
        os.environ.pop("CLUSTERING_TPU_SCREEN_PREFETCH", None)
        _p(f"{name}: warm off done")

        rows = {"on": [], "off": []}
        best = {}
        for _ in range(REPS):
            for tag in ("on", "off"):
                if tag == "off":
                    os.environ["CLUSTERING_TPU_SCREEN_PREFETCH"] = "0"
                else:
                    os.environ.pop("CLUSTERING_TPU_SCREEN_PREFETCH", None)
                wall, outs, steps = run_series()
                _p(f"{name}: rep {tag} {wall:.3f}s")
                rows[tag].append(round(wall, 3))
                cur = best.get(tag)
                if cur is None or wall < cur[0]:
                    best[tag] = (wall, outs, steps)
        os.environ.pop("CLUSTERING_TPU_SCREEN_PREFETCH", None)

        equal = all(np.array_equal(a, b)
                    for a, b in zip(best["on"][1], best["off"][1]))

        def _steps(st):
            return [{k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in s.items()
                     if k in ("threshold_index", "sweeps", "swept_tiles",
                              "t_plan", "t_dispatch", "t_wait", "t_fetch",
                              "t_norm")} for s in st]

        ns = len(thresholds)
        out["series"][name] = {
            "n_steps": ns,
            "wall_best_on_s": round(best["on"][0], 3),
            "wall_best_off_s": round(best["off"][0], 3),
            "ms_per_step_on": round(1e3 * best["on"][0] / ns, 1),
            "ms_per_step_off": round(1e3 * best["off"][0] / ns, 1),
            "walls_on": rows["on"], "walls_off": rows["off"],
            "labels_bit_equal": bool(equal),
            "per_step_on": _steps(best["on"][2]),
            "per_step_off": _steps(best["off"][2]),
        }
        print(f"{name}: on {best['on'][0]:.3f}s off {best['off'][0]:.3f}s"
              f" equal={equal}")

    with open("SCREEN_AB_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != 'series'},
                     indent=1))


if __name__ == "__main__":
    main()
