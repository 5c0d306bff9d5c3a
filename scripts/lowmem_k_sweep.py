"""Lowmem segment-length (K) sweep on-chip (VERDICT round-3 #6).

K=10 was fixed everywhere; the 46% backward share at config_4_b192 is
partly this free parameter. Sweeps K in {5, 10, 15, 20} (sqrt(M)=10 at
M=100, so the sqrt rule coincides with the old default) at config_4 B=192
and config_5 B=32, 3-iteration windows, recording throughput + backward
share per K into BENCH_RESULTS.json under "lowmem_K_sweep" incrementally.

    python scripts/lowmem_k_sweep.py [4|5]
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
PATH = os.path.join(REPO, "BENCH_RESULTS.json")

import run_benchmarks as rb  # noqa: E402


def record(key, value):
    data = json.load(open(PATH)) if os.path.exists(PATH) else {}
    entry = data.setdefault("lowmem_K_sweep", {})
    entry[key] = value
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    print(f"[record] {key} = {json.dumps(value)}", flush=True)


def summarize(r):
    t = r.get("timers", {})
    tot = t.get("total_optimization", r["elapsed_s"]) or r["elapsed_s"]
    return {
        "scenario_iters_per_s": r["scenario_iters_per_s"],
        "backward_share": round(t.get("backward_total", 0.0) / tot, 3),
        "timers": t,
        "newton_solves": r["newton_solves"],
        "mean_final_cost": r["mean_final_cost"],
        "trial_peak_bytes": (r.get("trial_program_memory") or {}).get(
            "peak_memory_in_bytes"),
    }


def main():
    # one (config, K) per PROCESS invocation is the reliable mode: running
    # the four K-variants in one process accumulated device state until a
    # RESOURCE_EXHAUSTED at config-4 B=192 (each variant compiles its own
    # segment-shape programs and the freed buffers are not returned to the
    # allocator promptly under axon). --K=<k> restricts the sweep.
    which = [a for a in sys.argv[1:] if not a.startswith("--")] or ["4", "5"]
    Ks = [5, 10, 15, 20]
    for a in sys.argv[1:]:
        if a.startswith("--K="):
            Ks = [int(a.split("=")[1])]
    if "4" in which:
        for K in Ks:
            t0 = time.perf_counter()
            r = rb.bench_config_4(3, batch=192, lowmem=True, K=K)
            s = summarize(r)
            s["wall_incl_compile_s"] = round(time.perf_counter() - t0, 1)
            record(f"config_4_b192_K{K}", s)
    if "5" in which:
        for K in Ks:
            t0 = time.perf_counter()
            r = rb.bench_config_5(3, batch=32, K=K)
            s = summarize(r)
            s["wall_incl_compile_s"] = round(time.perf_counter() - t0, 1)
            record(f"config_5_b32_K{K}", s)


if __name__ == "__main__":
    main()
