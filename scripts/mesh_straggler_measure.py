"""Quantify per-device straggler bucketing under the scenario mesh.

VERDICT round-3 weak #2: the straggler ladder was hard-gated off under a
mesh, so multi-chip backtracking paid full-batch rounds. The gate is now
replaced by per-DEVICE bucket compaction (shard-local gather/scatter inside
shard_map, parallel/batch.py) — this measures its effect on the
8-virtual-device CPU mesh with a heterogeneous 24-member mix: measured
Newton solves (the FLOP proxy; CPU wall time here is core-contention noise,
see WEAK_SCALING.json) for full-batch masked rounds vs bucketed rounds.
Writes BENCH_RESULTS.json "mesh_straggler_bucketing".

    python scripts/mesh_straggler_measure.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_ENABLE_X64", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.parallel.batch import BatchedProblem2D, sweep_2d
    from vch_tpu.parallel.mesh import make_mesh

    cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.15)
    mk = lambda: sweep_2d(cfg, b3_values=[5e-5, 1e-4, 2e-4, 4e-4],
                          kappa_values=[5e-5, 1e-4, 1.5e-4, 2e-4, 3e-4,
                                        4e-4])
    mesh = make_mesh()

    full = BatchedProblem2D(cfg, alpha_max=2000.0, mesh=mesh)
    t0 = time.perf_counter()
    out_full = full.run(mk(), max_iter=8, verbose=False)
    wall_full = time.perf_counter() - t0

    sub = BatchedProblem2D(cfg, alpha_max=2000.0, mesh=mesh,
                           straggler_batch=1)
    t0 = time.perf_counter()
    out_sub = sub.run(mk(), max_iter=8, verbose=False)
    wall_sub = time.perf_counter() - t0

    assert np.allclose(out_sub["cost_history"], out_full["cost_history"],
                       rtol=1e-11)
    entry = {
        "mesh": "8 virtual CPU devices, B=24 (3 members/device)",
        "mix": "heterogeneous (b3 x kappa sweep), alpha_max=2000 forces "
               "backtracking tails",
        "newton_solves_full_masked": int(out_full["newton_solves"]),
        "newton_solves_bucketed": int(out_sub["newton_solves"]),
        "solve_reduction": round(
            1 - out_sub["newton_solves"] / out_full["newton_solves"], 3),
        "straggler_rounds": int(sub.straggler_rounds),
        "ls_trials_total": int(out_sub["ls_trials"].sum()),
        "wall_full_s": round(wall_full, 1),
        "wall_bucketed_s": round(wall_sub, 1),
        "note": "Per-device bucket compaction (shard-local gather/scatter "
                "inside shard_map, no collectives) replaces the round-3 "
                "mesh hard-gate. Newton solves are the FLOP proxy — CPU "
                "virtual-mesh wall time is core-contention noise (8 "
                "'devices' share the host) and includes per-bucket "
                "compiles; parity is exact "
                "(test_batched_2d_mesh_straggler_bucketing_matches_full).",
    }
    path = os.path.join(REPO, "BENCH_RESULTS.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["mesh_straggler_bucketing"] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    print(json.dumps(entry, indent=1))


if __name__ == "__main__":
    main()
