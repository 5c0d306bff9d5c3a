"""On-chip blocked-vs-per-member fused march measurement (round-5 MXU item).

Runs the full batched forward march through march_fused_2d (per-member
grid cells) and march_fused_2d_blocked (config.fused_march_block member
tiles) at the production settings, checks parity + measured Newton-solve
counts, and records throughput into BENCH_RESULTS.json
("blocked_march_onchip"). Timing uses a host value fetch per run —
block_until_ready is a no-op through the axon tunnel (see
blocked_march_microbench.method).

    python scripts/blocked_march_onchip.py [--n 64] [--b 64] [--bb 8]
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
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--bb", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--solve-prec", default=None,
                    help="override fused_solve_precision (default: config)")
    ap.add_argument("--trips", type=int, default=0,
                    help="override fused_krylov_fixed_iters")
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
    from vch_tpu.models.forward2d import ForwardSolver2D
    from vch_tpu.ops.potential import init_phi_random_2d

    kw = {}
    if args.solve_prec:
        kw["fused_solve_precision"] = args.solve_prec
    if args.trips:
        kw["fused_krylov_fixed_iters"] = args.trips

    def build(block):
        cfg = ForwardSolverConfig2D(Nx=args.n, Ny=args.n, T=1.0,
                                    dtype="float32", newton_tol=2e-4,
                                    fused_march_block=block, **kw)
        s = ForwardSolver2D(cfg)
        f = jax.jit(lambda u, p0: s.march_fused_batch(u, p0))
        return s, f

    N, B = args.n, args.b
    rng = np.random.default_rng(0)
    phi0 = np.stack([init_phi_random_2d(N, N, DELTA_SEP, amp=0.1,
                                        seed=42 + i) for i in range(B)])
    s0, _ = build(0)
    u = jnp.asarray(0.05 * rng.standard_normal(
        (B, s0.M + 1, N + 1, N + 1)), jnp.float32)
    phi0 = jnp.asarray(phi0, jnp.float32)

    results = {}
    outs = {}
    fns = {}
    # compile both, then INTERLEAVE timed runs: shared-chip tenancy drifts
    # on ~minute scales, so back-to-back phases bias the ratio
    for label, block in (("per_member", 0), ("blocked", args.bb)):
        sv, f = build(block)
        t0 = time.perf_counter()
        out = f(u, phi0)
        _ = float(np.asarray(out[1]).sum())        # sync
        fns[label] = f
        results[label] = {
            "compile_plus_first_s": round(time.perf_counter() - t0, 1)}
    walls = {k: [] for k in fns}
    for _i in range(args.reps):
        for label, f in fns.items():
            t0 = time.perf_counter()
            out = f(u, phi0)
            ns = np.asarray(out[1])                # forces execution+fetch
            walls[label].append(time.perf_counter() - t0)
            outs[label] = (np.asarray(out[0][:, -1]), ns)
    for label in fns:
        wall = min(walls[label])
        ns = outs[label][1]
        results[label].update({
            "march_wall_s": round(wall, 4),
            "march_wall_band_s": [round(min(walls[label]), 4),
                                  round(max(walls[label]), 4)],
            "marches_per_s": round(B / wall, 1),
            "newton_solves": int(ns.sum()),
        })
        print(f"{label:10s} wall {wall*1e3:8.1f} ms "
              f"({B / wall:7.1f} member-marches/s) "
              f"solves {int(ns.sum())}", flush=True)

    final_diff = float(np.abs(outs["blocked"][0]
                              - outs["per_member"][0]).max())
    solves_equal = bool((outs["blocked"][1] == outs["per_member"][1]).all())
    speedup = (results["per_member"]["march_wall_s"]
               / results["blocked"]["march_wall_s"])
    entry = {
        "grid": f"{N}x{N}", "batch": B, "block_b": args.bb,
        "solve_prec": args.solve_prec or "config-default",
        **{k: v for k, v in results.items()},
        "final_state_maxdiff": final_diff,
        "newton_solves_sum_equal": int(outs["blocked"][1].sum())
            == int(outs["per_member"][1].sum()),
        "newton_solves_equal": solves_equal,
        "speedup": round(speedup, 3),
    }
    print(json.dumps(entry))
    if args.no_record:
        return
    path = os.path.join(REPO, "BENCH_RESULTS.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data.setdefault("blocked_march_onchip", {})[
        f"n{N}_b{B}_bb{args.bb}" + ("_" + args.solve_prec
                                    if args.solve_prec else "")] = entry
    json.dump(data, open(path, "w"), indent=1)
    open(path, "a").write("\n")


if __name__ == "__main__":
    main()
