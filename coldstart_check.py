"""Cold-start CLI walls: fresh-process 1M-frame density runs (r5 item 8).

Round 4 measured cold 1M at 67s through a 40s tunnel stall after moving
every compile off-stage except ~8s of screening fixpoint programs
(COLDSTART_r04.json). Round 5 warms those DURING the NN stage off a
band-bound sigma2 estimate (models/density.py::_early_screen_warm,
DensityEngine.band_sigma2_estimate) -- this driver measures whether the
healthy-tunnel cold 1M wall reaches <= 55s.

Each rep is a fresh subprocess (no jit cache): CLI density at N=2^20 x 4,
-r 0.10, fe + pops + nn outputs and a 3-threshold screening series --
the same shape as the reference's production invocation
(src/clustering.cpp:152-389 option surface). A tiny pre-run heartbeat
program keeps the tunnel warm so the per-process first-program stall
(proven environmental in COLDSTART_r04) is minimized, and each rep
records it separately via the ledger.

Writes COLDSTART_r05.json.  env: COLD_N, COLD_REPS, COLD_OUT,
COLD_WARM_OFF (pass 1 to measure the no-early-warm arm instead).
"""

import json
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

N = int(os.environ.get("COLD_N", 1 << 20))
REPS = int(os.environ.get("COLD_REPS", 3))
OUT = os.environ.get("COLD_OUT", "COLDSTART_r05.json")


def _p(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def heartbeat():
    """One tiny device program in a throwaway process: keeps the axon
    tunnel out of its idle-stall state so the measured rep pays the
    framework's cold cost, not the environment's."""
    code = ("import jax.numpy as jnp;"
            "print(float(jnp.ones((256,256)).sum()))")
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-c", code], capture_output=True,
                   timeout=580)
    return time.perf_counter() - t0


def main():
    workdir = tempfile.mkdtemp(prefix="cold1m_")
    coords_path = os.path.join(workdir, "coords.dat")
    _p(f"generating {N} x 4 coords -> {coords_path}")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # keep gen off-TPU
    from bench import synthetic_fel
    coords = synthetic_fel(N, 4)
    np.savetxt(coords_path, coords, fmt="%.6f")
    del coords

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # CLI reps run on the TPU
    env["CLUSTERING_TPU_PROFILE_SUBSTAGES"] = "1"
    if os.environ.get("COLD_WARM_OFF") == "1":
        env["CLUSTERING_TPU_EARLY_SCREEN_WARM"] = "0"

    reps = []
    for rep in range(REPS):
        hb = heartbeat()
        _p(f"rep {rep}: heartbeat {hb:.1f}s; launching cold CLI run")
        ledger = os.path.join(workdir, f"ledger_{rep}.jsonl")
        env["CLUSTERING_TPU_COMPILE_LEDGER"] = ledger
        out_base = os.path.join(workdir, f"run{rep}")
        cmd = [sys.executable, "-m", "clustering_tpu", "density",
               "-f", coords_path, "-r", "0.10", "-v",
               "-d", out_base + ".fe", "-p", out_base + ".pops",
               "-b", out_base + ".nn",
               "-o", out_base + ".clust", "-T", "0.1", "0.1", "0.3"]
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=900, env=env,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        wall = time.perf_counter() - t0
        stage = dict(re.findall(r"\[([^:\]]+): ([0-9.]+)s\]",
                                proc.stdout))
        compile_total = 0.0
        n_prog = 0
        try:
            with open(ledger) as fh:
                for line in fh:
                    ev = json.loads(line)
                    if "compile" in ev.get("event", ""):
                        compile_total += ev.get("secs", 0.0)
                        n_prog += 1
        except OSError:
            pass
        rec = {
            "wall_s": round(wall, 1),
            "heartbeat_s": round(hb, 1),
            "pops_s": float(stage.get("populations", "nan")),
            "nn_s": float(stage.get("nearest neighbors", "nan")),
            "rc": proc.returncode,
            "ledger_programs": n_prog,
            "ledger_compile_s": round(compile_total, 1),
        }
        _p(f"rep {rep}: wall {rec['wall_s']}s pops {rec['pops_s']}"
           f" nn {rec['nn_s']} (compiles {rec['ledger_compile_s']}s"
           f"/{n_prog})")
        if proc.returncode != 0:
            rec["stderr_tail"] = proc.stderr[-2000:]
        reps.append(rec)

    walls = [r["wall_s"] for r in reps if r["rc"] == 0]
    result = {
        "device": "TPU v5 lite0 (axon remote tunnel)",
        "what": (f"cold CLI density walls, fresh process per rep: N={N}"
                 " x 4D, -r 0.10, fe+pops+nn outputs, 3-threshold"
                 " screening series; early screening warm "
                 + ("OFF" if os.environ.get("COLD_WARM_OFF") == "1"
                    else "ON (compiled during the NN stage)")),
        "n": N,
        "reps": reps,
        "best_wall_s": min(walls) if walls else None,
        "median_wall_s": (sorted(walls)[len(walls) // 2]
                          if walls else None),
        "ok": bool(walls),
    }
    print(json.dumps(result, indent=1))
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
