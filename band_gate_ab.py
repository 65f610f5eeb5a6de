"""Paired hardware A/B of the band-prefetch dispatch gate.

Round 5 gated the prefetch thread's work behind the pops counts
download (Event, PREFETCH_AB_r04 measured 0.27s of host contention);
5c3cb1f then moved the thread's fe passes on device, which shrinks the
contention the gate was built to avoid -- but the gate also delays the
band kernels so they run into the NN stage (BENCH nn t_band 0.415s).
This driver measures gate ON vs OFF (CLUSTERING_TPU_BAND_GATE, read at
runtime; prefetch itself always on), interleaved best-of-REPS in one
process, bit-equality required.

Writes BANDGATE_AB_r05.json.  env: AB_N, AB_REPS.
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
        st = engine.last_stats["nn"]
        return pops, nn, tp, tn, st.get("t_band", 0.0), \
            bool(st.get("band_prefetched"))

    # warm every program once (gate state does not change shapes)
    pipe()
    res = {"on": [], "off": []}
    ref = None
    for rep in range(REPS):
        for arm in ("on", "off"):
            os.environ["CLUSTERING_TPU_BAND_GATE"] = \
                "1" if arm == "on" else "0"
            pops, nn, tp, tn, tb, hit = pipe()
            res[arm].append({"t_pops": round(tp, 3), "t_nn": round(tn, 3),
                             "t_band": round(tb, 3), "prefetched": hit})
            if ref is None:
                ref = (pops, nn)
            else:
                assert all(np.array_equal(ref[0][r], pops[r])
                           for r in RADII), "pops mismatch"
                assert all(np.array_equal(a, b)
                           for a, b in zip(ref[1], nn)), "nn mismatch"
    os.environ.pop("CLUSTERING_TPU_BAND_GATE", None)
    out = {
        "device": str(dev), "n": N, "reps": REPS,
        "pops_best_gate_on_s": min(r["t_pops"] for r in res["on"]),
        "pops_best_gate_off_s": min(r["t_pops"] for r in res["off"]),
        "nn_best_gate_on_s": min(r["t_nn"] for r in res["on"]),
        "nn_best_gate_off_s": min(r["t_nn"] for r in res["off"]),
        "pipe_best_gate_on_s": min(r["t_pops"] + r["t_nn"]
                                   for r in res["on"]),
        "pipe_best_gate_off_s": min(r["t_pops"] + r["t_nn"]
                                    for r in res["off"]),
        "reps_detail": res,
        "bit_equal": True,
        "prefetch_hit_every_rep": all(r["prefetched"]
                                      for a in res.values() for r in a),
    }
    print(json.dumps(out, indent=1))
    with open("BANDGATE_AB_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
