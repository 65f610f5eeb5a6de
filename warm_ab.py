"""Cold-process A/B of the device-plan precompile warm (round 4).

At device-planned N (auto >= 2^22 padded frames) the cold wall of the
first pops/NN call is dominated by one-time program costs: XLA compile,
executable load, and first-touch accumulator allocation (~150s of a
cold 16M run, CLAUDE.md). ``DensityEngine.precompile_pops/_nn`` now warm
the windowed bidirectional sweep programs at the exact production chunk
shapes from daemon threads (the remote compiler parallelizes across
threads), exactly as the CLI does (models/density.py:250-260). The
reference's AOT binary pays none of this (src/clustering.cpp:67).

Each rep is a FRESH subprocess (the jit cache is per-process): the child
first absorbs the axon tunnel's one-time first-program stall with a bare
reduction (proven environmental, COLDSTART_r04.json), then runs the real
pops -> fe -> NN pipeline with the warm threads ON or OFF and reports
stage walls + sub-stage splits + output checksums. The parent alternates
arms, verifies every checksum matches across all runs, and writes
WARMAB_r04.json.

Usage: python warm_ab.py            (parent; env: AB_N, AB_REPS, AB_OUT)
       python warm_ab.py --child N  (internal)
"""

import json
import os
import subprocess
import sys
import time

N = int(os.environ.get("AB_N", 1 << 22))
REPS = int(os.environ.get("AB_REPS", 3))
OUT = os.environ.get("AB_OUT", "WARMAB_r04.json")
RADIUS = 0.10


def child(pre_on):
    os.environ["CLUSTERING_TPU_PROFILE_SUBSTAGES"] = "1"
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # env alone does not disable the axon platform
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((512, 512), jnp.float32)))  # tunnel absorb
    t_tunnel = time.perf_counter() - t0

    from bench import synthetic_fel
    from clustering_tpu import ops

    coords = synthetic_fel(N, 4)
    engine = ops.engine.DensityEngine(coords, row_block=128,
                                      col_block=4096)
    if pre_on:
        import threading
        threading.Thread(target=engine.precompile_pops,
                         args=([RADIUS],), daemon=True).start()
        threading.Thread(target=engine.precompile_nn,
                         daemon=True).start()

    t0 = time.perf_counter()
    pops = engine.populations([RADIUS], nn_band_radius=RADIUS)[RADIUS]
    t_pops = time.perf_counter() - t0
    pops_st = {k: v for k, v in engine.last_stats["populations"].items()
               if isinstance(v, (int, float, str, bool))}
    fe = ops.free_energies(pops)
    t0 = time.perf_counter()
    nn = engine.nearest_neighbors(fe)
    t_nn = time.perf_counter() - t0
    nn_st = {k: v for k, v in engine.last_stats["nn"].items()
             if isinstance(v, (int, float, str, bool))}
    import zlib

    pops_h = np.asarray(pops)
    sums = {
        "pops_sum": int(pops_h.astype(np.int64).sum()),
        "pops_crc": zlib.crc32(pops_h.tobytes()),
        "nn_idx_crc": zlib.crc32(np.asarray(nn[0]).tobytes()),
        "nn_dist_crc": zlib.crc32(np.asarray(nn[1]).tobytes()),
        "nn_hd_idx_crc": zlib.crc32(np.asarray(nn[2]).tobytes()),
        "nn_hd_dist_crc": zlib.crc32(np.asarray(nn[3]).tobytes()),
    }
    print(json.dumps({
        "pre": pre_on, "t_tunnel": round(t_tunnel, 3),
        "t_pops": round(t_pops, 3), "t_nn": round(t_nn, 3),
        "pops_substages": pops_st, "nn_substages": nn_st,
        "checks": sums,
    }), flush=True)


def main():
    runs = []
    order = []
    for r in range(REPS):
        order += [1, 0] if r % 2 == 0 else [0, 1]
    for pre in order:
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(pre)],
            capture_output=True, text=True, timeout=1800)
        wall = time.perf_counter() - t0
        line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
        if out.returncode != 0 or not line.startswith("{"):
            print(out.stdout, file=sys.stderr)
            print(out.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"child pre={pre} failed")
        rec = json.loads(line)
        rec["wall_process"] = round(wall, 3)
        runs.append(rec)
        print(f"# pre={pre} tunnel={rec['t_tunnel']:.1f}s "
              f"pops={rec['t_pops']:.1f}s nn={rec['t_nn']:.1f}s "
              f"(process {wall:.0f}s)", file=sys.stderr, flush=True)

    checks = [r["checks"] for r in runs]
    bit_equal = all(c == checks[0] for c in checks)
    on = [r for r in runs if r["pre"]]
    off = [r for r in runs if not r["pre"]]
    result = {
        "device": "TPU (see runs)", "n": N, "reps_per_arm": REPS,
        "what": ("cold-process pops+NN walls at device-planned N, "
                 "precompile warm threads ON vs OFF; tunnel stall "
                 "absorbed by a bare reduction first"),
        "pipeline_best_on_s": round(min(r["t_pops"] + r["t_nn"]
                                        for r in on), 3),
        "pipeline_best_off_s": round(min(r["t_pops"] + r["t_nn"]
                                         for r in off), 3),
        "pipeline_med_on_s": round(sorted(r["t_pops"] + r["t_nn"]
                                          for r in on)[len(on) // 2], 3),
        "pipeline_med_off_s": round(sorted(r["t_pops"] + r["t_nn"]
                                           for r in off)[len(off) // 2],
                                    3),
        "bit_equal_all_runs": bit_equal,
        "plan_mode": runs[0]["pops_substages"].get("plan"),
        "runs": runs,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "runs"},
                     indent=1))
    if not bit_equal:
        raise SystemExit("outputs differ across runs")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(bool(int(sys.argv[2])))
    else:
        main()
