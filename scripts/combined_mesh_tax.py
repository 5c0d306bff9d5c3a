"""Single-chip throughput tax of the combined (scenarios, gx) mesh path
(VERDICT round-4 #5: "give the combined mesh a performance story").

Runs the SAME 2D batched PGD three ways on one real chip at 128x128:

  fused     — BatchedProblem2D, fused whole-march/adjoint kernels
              (the production path)
  scan      — BatchedProblem2D with fused_march=False (vmapped lax.scan
              marcher — the algorithm the combined mesh runs)
  combined  — GridShardedBatchedProblem2D on a (1, 1) mesh (scenarios=1,
              gx=1): every collective degenerates to a self-copy, so the
              measured gap vs `scan` is the shard_map/batched-collective
              program structure tax, and vs `fused` the full price of
              leaving the fused kernels

The ratio teaches make_batched_problem_2d's member-footprint rule what the
combined mesh costs when it is NOT needed (it exists for grids where one
member outgrows a chip — BASELINE config 5 growth path).

    python scripts/combined_mesh_tax.py [--n 128] [--b 4] [--iters 3]
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
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip", default="",
                    help="comma-separated variants to skip")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.parallel.batch import BatchedProblem2D, sweep_2d
    from vch_tpu.parallel.mesh import BATCH_AXIS
    from vch_tpu.parallel.spatial import GridShardedBatchedProblem2D

    N, B, iters = args.n, args.b, args.iters
    skip = set(filter(None, args.skip.split(",")))
    cfg = ForwardSolverConfig2D(Nx=N, Ny=N, T=1.0, dtype="float32",
                                newton_tol=2e-4,
                                forward_matmul_precision="high")
    mk = lambda: sweep_2d(cfg, b3_values=np.linspace(5e-5, 2e-4, B),
                          kappa_values=[1e-4])

    def stage(sc):
        import dataclasses
        st = lambda a: jax.device_put(jnp.asarray(a, jnp.float32))
        return dataclasses.replace(
            sc, phi0=st(sc.phi0), phi_T=st(sc.phi_T), phi_Q=st(sc.phi_Q),
            b1=st(sc.b1), b2=st(sc.b2), b3=st(sc.b3),
            kappa_spar=st(sc.kappa_spar))

    combined_mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                         (BATCH_AXIS, "gx"))
    builders = {
        "fused": lambda: BatchedProblem2D(cfg),
        "scan": lambda: BatchedProblem2D(cfg, fused_march=False),
        "combined": lambda: GridShardedBatchedProblem2D(
            cfg, mesh=combined_mesh),
    }
    entry = {"grid": f"{N}x{N}", "batch": B, "iters": iters}
    for label, build in builders.items():
        if label in skip:
            continue
        prob = build()
        sc = stage(mk())
        t0 = time.perf_counter()
        prob.run(sc, max_iter=1, verbose=False)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = prob.run(sc, max_iter=iters, verbose=False,
                       host_results=False)
        el = time.perf_counter() - t0
        entry[label] = {
            "scenario_iters_per_s": round(B * iters / el, 3),
            "elapsed_s": round(el, 2),
            "compile_plus_first_iter_s": round(compile_s, 1),
            "newton_solves": int(out["newton_solves"]),
            "mean_final_cost": float(out["cost_history"][-1].mean()),
        }
        print(f"{label:9s} {entry[label]}", flush=True)

    if "fused" in entry and "combined" in entry:
        entry["combined_vs_fused"] = round(
            entry["combined"]["scenario_iters_per_s"]
            / entry["fused"]["scenario_iters_per_s"], 3)
    if "scan" in entry and "combined" in entry:
        entry["combined_vs_scan"] = round(
            entry["combined"]["scenario_iters_per_s"]
            / entry["scan"]["scenario_iters_per_s"], 3)
    print(json.dumps(entry))
    path = os.path.join(REPO, "BENCH_RESULTS.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["combined_mesh_tax_onchip"] = entry
    json.dump(data, open(path, "w"), indent=1)
    open(path, "a").write("\n")


if __name__ == "__main__":
    main()
