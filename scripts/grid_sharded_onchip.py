"""Run the grid-sharded (shard_map halo) program on the REAL TPU chip.

VERDICT round-3 missing #2: all GridSharded* evidence was the 8-virtual-CPU
mesh; the program shape (per-step ppermute/psum_scatter inside
lax.scan+while_loop) is exactly what compiled for minutes and once faulted
the axon runtime on the scenario path. This runs it on-chip under a
1-device mesh, staged smallest-first, recording each stage's compile time
and throughput into BENCH_RESULTS.json under "grid_sharded_onchip"
IMMEDIATELY (a later fault cannot lose earlier stages).

    python scripts/grid_sharded_onchip.py [stage]
    stages: 64 (64x64 march), 128 (128x128 march), pgd (one 128x128 PGD
    iteration); default runs all in order.
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
    entry = data.setdefault("grid_sharded_onchip", {})
    entry[key] = value
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    print(f"[record] {key} = {json.dumps(value)}", flush=True)


def march_stage(n):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.models.forward2d import ForwardSolver2D
    from vch_tpu.parallel.spatial import GridShardedForward2D

    cfg = ForwardSolverConfig2D(Nx=n, Ny=n, T=1.0, dtype="float32",
                                newton_tol=2e-4)
    mesh = Mesh(np.array(jax.devices()[:1]), ("gx",))
    gs = GridShardedForward2D(cfg, mesh=mesh)
    d = gs.dtype
    phi0 = jnp.asarray(
        ForwardSolver2D(cfg).default_initial_phi(), d)
    u = jnp.zeros((gs.M + 1, n + 1, n + 1), d)

    t0 = time.perf_counter()
    phi, ns, bad = gs.march(u, phi0)
    jax.block_until_ready(phi)
    compile_s = time.perf_counter() - t0
    print(f"[{n}] first march (compile+run): {compile_s:.1f}s, "
          f"newton_solves {int(ns)}, first_bad {int(bad)}", flush=True)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        phi, ns, bad = gs.march(u, phi0)
    jax.block_until_ready(phi)
    warm_s = (time.perf_counter() - t0) / reps
    assert np.isfinite(np.asarray(phi)).all()
    assert int(bad) == -1

    # the unsharded spectral scan path at the same config for comparison
    ref = ForwardSolver2D(cfg)
    t0 = time.perf_counter()
    phi_r, st = ref._simulate(u, phi0)
    jax.block_until_ready(phi_r)
    ref_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        phi_r, st = ref._simulate(u, phi0)
    jax.block_until_ready(phi_r)
    ref_warm_s = (time.perf_counter() - t0) / reps
    err = float(np.abs(np.asarray(phi) - np.asarray(phi_r)).max())

    record(f"march_{n}x{n}", {
        "compile_plus_first_run_s": round(compile_s, 1),
        "warm_march_s": round(warm_s, 3),
        "newton_solves": int(ns),
        "scan_path_compile_s": round(ref_compile_s, 1),
        "scan_path_warm_s": round(ref_warm_s, 3),
        "traj_maxdiff_vs_scan": err,
        "steps": int(gs.M),
        "note": "1-device mesh on the real chip; collectives degenerate "
                "but the program shape (halo ppermute + psum_scatter "
                "inside scan/while) is the config-5 scale shape",
    })


def pgd_stage(n=128):
    import jax

    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.parallel.spatial import GridShardedProblem2D
    from jax.sharding import Mesh

    cfg = ForwardSolverConfig2D(Nx=n, Ny=n, T=1.0, dtype="float32",
                                newton_tol=2e-4)
    mesh = Mesh(np.array(jax.devices()[:1]), ("gx",))
    t0 = time.perf_counter()
    prob = GridShardedProblem2D(cfg, mesh=mesh)
    res = prob.optimize(max_iter=1, verbose=False)
    first_iter_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = prob.optimize(max_iter=1, verbose=False)
    warm_iter_s = time.perf_counter() - t0
    costs = [float(c) for c in res.cost_history]
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[0]
    record(f"pgd_iteration_{n}x{n}", {
        "first_iter_incl_compile_s": round(first_iter_s, 1),
        "warm_iter_s": round(warm_iter_s, 2),
        "cost0": costs[0], "cost1": costs[-1],
        "note": "full grid-sharded PGD iteration (forward + adjoint + prox "
                "+ host search) on-chip, 1-device mesh",
    })


def main():
    stages = sys.argv[1:] or ["64", "128", "pgd"]
    for s in stages:
        if s == "pgd":
            pgd_stage()
        else:
            march_stage(int(s))


if __name__ == "__main__":
    main()
