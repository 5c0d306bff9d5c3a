"""Single-chip batch-scaling sweep on the fused path, with ONE scenario mix.

Fixes the round-2 WEAK_SCALING curve's confound (the b3 grid size changed
with B, so B=128 solved a harder mix and dipped): a FIXED 32-scenario
(b3, kappa) mix is tiled to every batch size, so all points solve the same
problems replicated. Writes WEAK_SCALING.json `tpu_batch_scaling_fused`.

Usage: python scripts/batch_scaling.py [batch sizes...]
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [32, 64, 128, 256, 512]
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.parallel.batch import BatchedProblem2D, sweep_2d
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from run_benchmarks import _stage, _tile_batch

    cfg = ForwardSolverConfig2D(Nx=64, Ny=64, T=1.0, dtype="float32",
                                newton_tol=2e-4,
                                forward_matmul_precision="high")
    base = sweep_2d(cfg, b3_values=np.linspace(5e-5, 2e-4, 8),
                    kappa_values=np.linspace(5e-5, 2e-4, 4))
    assert base.batch == 32
    runs = {}
    for B in sizes:
        prob = BatchedProblem2D(cfg)
        sc = _stage(_tile_batch(base, B), "float32")
        prob.run(sc, max_iter=1, verbose=False)
        prob.prewarm(sc)
        iters = 3
        t0 = time.perf_counter()
        out = prob.run(sc, max_iter=iters, verbose=False, host_results=False)
        el = time.perf_counter() - t0
        runs[str(B)] = {
            "batch": B,
            "scenario_iters_per_s": round(B * iters / el, 1),
            "newton_solves_per_s": round(out["newton_solves"] / el, 0),
        }
        print(json.dumps(runs[str(B)]), flush=True)
    path = os.path.join(REPO, "WEAK_SCALING.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    bb = cfg.resolved_fused_block()
    key = ("tpu_batch_scaling_blocked" if bb
           else "tpu_batch_scaling_fused")
    data[key] = {
        "n": 64, "T": 1.0, "iters": 3, "dtype": "float32",
        "fused_march_block": bb,
        "note": ("fused whole-march path; ONE fixed 32-scenario (b3, kappa) "
                 "mix tiled to every batch size (round-2 curve confounded "
                 "batch size with mix hardness — the old B=128 dip was a "
                 "harder 32-point b3 grid, not a throughput artifact)."),
        "runs": runs,
    }
    json.dump(data, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
