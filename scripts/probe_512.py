"""Probe the fused-march path at 512x512 on-chip (VERDICT round-3 #7).

The fused solve is stated VMEM-resident "up to ~512x512" but was never run
there. One batched forward march + one full fused PGD iteration at B=2,
recording throughput and the XLA buffer-assignment HBM peak into
BENCH_RESULTS.json under "probe_512" (each stage recorded immediately).

    python scripts/probe_512.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PATH = os.path.join(REPO, "BENCH_RESULTS.json")


def record(key, value):
    data = json.load(open(PATH)) if os.path.exists(PATH) else {}
    entry = data.setdefault("probe_512", {})
    entry[key] = value
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    print(f"[record] {key} = {json.dumps(value)}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
    from vch_tpu.ops.potential import init_phi_random_2d
    from vch_tpu.parallel.batch import BatchedProblem2D, sweep_2d

    N, B = 512, 2
    cfg = ForwardSolverConfig2D(Nx=N, Ny=N, T=1.0, dtype="float32",
                                newton_tol=2e-4)
    prob = BatchedProblem2D(cfg)
    print("fused_march_available:",
          prob.solver.fused_march_available(), flush=True)
    record("fused_march_available", bool(prob.solver.fused_march_available()))

    d = prob.dtype
    phi0 = jnp.asarray(np.stack([
        init_phi_random_2d(N, N, DELTA_SEP, amp=0.1, seed=42 + i)
        for i in range(B)]), d)
    u = jnp.zeros((B, prob.solver.M + 1, N + 1, N + 1), d)

    t0 = time.perf_counter()
    phi, ns = prob._forward_v(u, phi0, None, None)
    jax.block_until_ready(phi)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    phi, ns = prob._forward_v(u, phi0, None, None)
    jax.block_until_ready(phi)
    warm_s = time.perf_counter() - t0
    assert np.isfinite(np.asarray(phi[:, -1])).all()
    record("march_b2", {
        "compile_plus_first_run_s": round(compile_s, 1),
        "warm_march_s": round(warm_s, 3),
        "newton_solves": [int(x) for x in np.asarray(ns)],
        "steps": int(prob.solver.M),
    })

    # one full PGD iteration (fused forward + fused adjoint + search)
    sc = sweep_2d(cfg, b3_values=[1e-4, 2e-4], kappa_values=[1e-4])
    ma = prob.trial_memory_analysis(sc)
    if ma:
        record("trial_program_memory", ma)
    t0 = time.perf_counter()
    out = prob.run(sc, max_iter=1, verbose=False, host_results=False)
    first_iter_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = prob.run(sc, max_iter=1, verbose=False, host_results=False)
    warm_iter_s = time.perf_counter() - t0
    ch = np.asarray(out["cost_history"])
    assert np.isfinite(ch).all() and (ch[-1] <= ch[0] + 1e-9).all()
    record("pgd_iteration_b2", {
        "first_iter_incl_compile_s": round(first_iter_s, 1),
        "warm_iter_s": round(warm_iter_s, 2),
        "scenario_iters_per_s": round(B / warm_iter_s, 3),
        "newton_solves": int(out["newton_solves"]),
        "cost0": [float(c) for c in ch[0]],
        "cost1": [float(c) for c in ch[-1]],
        "note": "512x512 B=2 f32 fused whole-march/adjoint path on one "
                "chip; the BASELINE config-5 growth regime the combined "
                "(scenarios, gx) mesh exists for",
    })


if __name__ == "__main__":
    main()
