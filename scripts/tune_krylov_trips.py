"""On-chip sweep of the fixed Krylov trip count (f32/TPU path).

The cosine-diagonal preconditioner typically converges the Schur solve in
~3 iterations; the default krylov_fixed_iters=10 is conservative. Fewer
trips shrink every Newton solve but may cost extra (inexact-)Newton
iterations — this measures the net effect on PGD throughput AND checks the
cost trajectory stays on the reference optimum.

Usage: python scripts/tune_krylov_trips.py [--trips 6,8,10] [--n 64] [--b 8]
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
    ap.add_argument("--trips", default="6,8,10")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.parallel.batch import BatchedProblem2D, sweep_2d

    results = {}
    for trips in [int(t) for t in args.trips.split(",")]:
        cfg = ForwardSolverConfig2D(
            Nx=args.n, Ny=args.n, T=1.0, dtype="float32", newton_tol=2e-4,
            krylov_fixed_iters=trips, adjoint_krylov_fixed_iters=10,
            forward_matmul_precision="high")
        prob = BatchedProblem2D(cfg)
        sc = sweep_2d(cfg, b3_values=np.linspace(5e-5, 2e-4,
                                                 max(1, args.b // 4)),
                      kappa_values=np.linspace(5e-5, 2e-4, 4)[:min(4, args.b)])
        reps = -(-args.b // sc.batch)
        tile = lambda a: np.concatenate([a] * reps, axis=0)[:args.b]
        st = lambda a: jax.device_put(jnp.asarray(tile(a), jnp.float32))
        sc = dataclasses.replace(
            sc, phi0=st(sc.phi0), phi_T=st(sc.phi_T), phi_Q=st(sc.phi_Q),
            b1=st(sc.b1), b2=st(sc.b2), b3=st(sc.b3),
            kappa_spar=st(sc.kappa_spar))
        prob.run(sc, max_iter=1, verbose=False)      # compile
        t0 = time.perf_counter()
        out = prob.run(sc, max_iter=args.iters, verbose=False,
                       host_results=False)
        el = time.perf_counter() - t0
        results[trips] = {
            "scenario_iters_per_s": round(args.b * args.iters / el, 4),
            "newton_solves": int(out["newton_solves"]),
            "mean_final_cost": float(out["cost_history"][-1].mean()),
            "descend_frac": float((out["cost_history"][-1]
                                   < out["cost_history"][0] + 1e-9).mean()),
        }
        print(json.dumps({"trips": trips, **results[trips]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
