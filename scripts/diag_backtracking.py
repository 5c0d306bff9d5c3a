"""Where the headline bench's backtracking phase goes (round-5 diagnostic).

With the blocked kernels the backward phase fell 14.0 -> 6.7 s and the
optimistic phase 11.4 -> 9.7, leaving backtracking (15.7-17.2 s over 20
iterations at B=512) as the largest phase. This reruns the headline
configuration and prints the search accounting run() already collects:
per-iteration straggler-bucket rounds, the ls_trials distribution, and
the phase timers — to show whether the tail is many rounds, large
buckets, or a few very hard members.

    python scripts/diag_backtracking.py [--b 512] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.parallel.batch import BatchedProblem2D, sweep_2d

    B, iters = args.b, args.iters
    cfg = ForwardSolverConfig2D(Nx=64, Ny=64, T=1.0, dtype="float32",
                                newton_tol=2e-4,
                                forward_matmul_precision="high")
    prob = BatchedProblem2D(cfg)
    b3s = np.linspace(5e-5, 2e-4, max(1, B // 4))
    kss = np.linspace(5e-5, 2e-4, 4)
    sc = sweep_2d(cfg, b3_values=b3s, kappa_values=kss)
    reps = -(-B // sc.batch)
    tile = lambda a: np.concatenate([a] * reps, axis=0)[:B]
    st = lambda a: jax.device_put(jnp.asarray(a, jnp.float32))
    sc = dataclasses.replace(
        sc, phi0=st(tile(sc.phi0)), phi_T=st(tile(sc.phi_T)),
        phi_Q=st(tile(sc.phi_Q)), b1=st(tile(sc.b1)), b2=st(tile(sc.b2)),
        b3=st(tile(sc.b3)), kappa_spar=st(tile(sc.kappa_spar)))

    prob.run(sc, max_iter=1, verbose=False)
    prob.prewarm(sc)
    prob.straggler_rounds = 0
    t0 = time.perf_counter()
    out = prob.run(sc, max_iter=iters, verbose=False, host_results=False)
    el = time.perf_counter() - t0
    lt = out["ls_trials"]
    hist = {str(k): int((lt == k).sum()) for k in sorted(set(lt.tolist()))}
    res = {
        "batch": B, "iters": iters,
        "scenario_iters_per_s": round(B * iters / el, 1),
        "timers": {k: round(v, 2) for k, v in out["timers"].items()},
        "straggler_bucket_rounds_total": int(prob.straggler_rounds),
        "rounds_per_iter": round(prob.straggler_rounds / iters, 2),
        "ls_trials_histogram_cumulative": hist,
        "mean_trials_per_member_per_iter": round(float(lt.mean()) / iters, 3),
    }
    print(json.dumps(res, indent=1))
    path = os.path.join(REPO, "BENCH_RESULTS.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["backtracking_diag_r5"] = res
    json.dump(data, open(path, "w"), indent=1)
    open(path, "a").write("\n")


if __name__ == "__main__":
    main()
