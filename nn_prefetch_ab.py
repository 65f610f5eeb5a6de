"""Paired hardware A/B + bit-equality of the NN band prefetch.

The band prefetch (DensityEngine.populations(nn_band_radius=...)) takes
the NN band phase off the NN stage's critical path by dispatching it
during the pops counts download. This driver measures the real
pops -> fe -> NN pipeline at N (default 2^20) on the actual chip,
prefetch ON vs OFF (CLUSTERING_TPU_NN_PREFETCH=0, read at runtime --
both variants share every compiled program), interleaved best-of-REPS,
and verifies all four NN outputs and the pops counts are bit-identical.

Writes PREFETCH_AB_r05.json. Usage: python nn_prefetch_ab.py
"""

import json
import os
import time

import numpy as np

N = int(os.environ.get("AB_N", 1 << 20))
REPS = int(os.environ.get("AB_REPS", 3))
RADII = [0.10, 0.15, 0.20]


def main():
    import jax
    from clustering_tpu import ops
    from bench import synthetic_fel

    dev = jax.devices()[0]
    coords = synthetic_fel(N, 4)
    engine = ops.engine.DensityEngine(coords, row_block=128,
                                      col_block=4096)

    def pipe():
        t0 = time.perf_counter()
        pops = engine.populations(RADII, nn_band_radius=RADII[0])
        tp = time.perf_counter() - t0
        fe = ops.free_energies(pops[RADII[0]])
        t1 = time.perf_counter()
        nn = engine.nearest_neighbors(fe)
        tn = time.perf_counter() - t1
        st = dict(engine.last_stats.get("nn", {}))
        return tp, tn, pops, nn, st

    # warm both variants (same program set; the flag only gates a
    # host-side dispatch decision)
    pipe()
    os.environ["CLUSTERING_TPU_NN_PREFETCH"] = "0"
    pipe()
    os.environ.pop("CLUSTERING_TPU_NN_PREFETCH", None)

    rows = {"on": [], "off": []}
    best = {}
    for _ in range(REPS):
        for tag in ("on", "off"):
            if tag == "off":
                os.environ["CLUSTERING_TPU_NN_PREFETCH"] = "0"
            else:
                os.environ.pop("CLUSTERING_TPU_NN_PREFETCH", None)
            tp, tn, pops, nn, st = pipe()
            rows[tag].append({"t_pops": round(tp, 3), "t_nn": round(tn, 3),
                              "t_band": round(st.get("t_band", 0.0), 3),
                              "prefetched":
                                  bool(st.get("band_prefetched"))})
            cur = best.get(tag)
            if cur is None or tp + tn < cur[0] + cur[1]:
                best[tag] = (tp, tn, pops, nn)
    os.environ.pop("CLUSTERING_TPU_NN_PREFETCH", None)

    p_on, p_off = best["on"][2], best["off"][2]
    nn_on, nn_off = best["on"][3], best["off"][3]
    pops_equal = all(np.array_equal(p_on[r], p_off[r]) for r in RADII)
    nn_equal = all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(nn_on, nn_off))
    out = {
        "device": str(dev), "n": N, "reps": REPS,
        "pipeline_best_on_s": round(best["on"][0] + best["on"][1], 3),
        "pipeline_best_off_s": round(best["off"][0] + best["off"][1], 3),
        "pops_best_on_s": round(min(r["t_pops"] for r in rows["on"]), 3),
        "pops_best_off_s": round(min(r["t_pops"] for r in rows["off"]), 3),
        "nn_best_on_s": round(min(r["t_nn"] for r in rows["on"]), 3),
        "nn_best_off_s": round(min(r["t_nn"] for r in rows["off"]), 3),
        "t_band_best_on_s": round(min(r["t_band"] for r in rows["on"]), 3),
        "t_band_best_off_s": round(min(r["t_band"] for r in rows["off"]),
                                   3),
        "reps_detail": rows,
        "pops_bit_equal": bool(pops_equal),
        "nn_bit_equal": bool(nn_equal),
        "prefetch_hit_every_on_rep": all(r["prefetched"]
                                         for r in rows["on"]),
    }
    with open("PREFETCH_AB_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
