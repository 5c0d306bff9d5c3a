"""On-chip microbenchmark for the member-BLOCK-tiled fused-march design.

The fused march (ops/pallas_march.py) runs at 98% of its serial
dependent-matmul floor but ~10% of ideal MXU (BENCH_RESULTS
speed_of_light_fused_march): every (n,n)@(n,n) matmul underfills the MXU
(n=65 pads to (72,128)) and the chain is latency-bound. Tiling B_blk
members per grid cell turns right-multiplies into ONE (B_blk*n, n) matmul,
but left-multiplies then need a member-local transpose (swapaxes through
the rank-3 view) — the operation that sank the round-2 attempt
(bicgstab_schur_pallas_batched, 0.63-0.76x, raw basis + block-ones dots).

This isolates the primitive costs on-chip so the blocked-march decision is
arithmetic, not guesswork. Variants (each ONE pallas kernel, K dependent
ops inside a fori_loop, sequential outer grid to amortize launch):

  member_mm   — unrolled per-member (n,n)@(n,n) matmuls (serial baseline)
  stacked_mm  — one (B_blk*n, n)@(n, n) stacked right-multiply
  swap        — member-local swapaxes(1,2) alone (what a left-mult adds)
  swap_mm     — swapaxes then stacked matmul (the blocked left-multiply)
  gdot        — per-member inner product: lane-reduce + (B_blk, B_blk*n)
                segment-sum matmul + broadcast-back matmul
  member_dot  — unrolled per-member scalar reductions (serial dot baseline)

Usage: python scripts/diag_blocked_microbench.py [--n 64] [--bb 8]
       [--k 64] [--reps 30] [--record]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np


def build(variant: str, n: int, bb: int, k: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    prec = jax.lax.Precision.HIGHEST

    def mm(a, c):
        return jnp.dot(a, c, preferred_element_type=jnp.float32,
                       precision=prec)

    def kernel(C_ref, G_ref, GT_ref, X_ref, out_ref):
        C = C_ref[:]
        G = G_ref[:]
        GT = GT_ref[:]

        def body(_, X):
            if variant == "serial_one":
                # single member's dependent chain: the CURRENT per-member
                # grid-cell design's per-matmul cost
                y = mm(X[:n, :], C)
                return jnp.concatenate([y] + [X[n:, :]], axis=0)
            if variant == "left_mm":
                # per-member LEFT-multiplies as slices+concat
                outs = [mm(C, X[b * n:(b + 1) * n, :]) for b in range(bb)]
                return jnp.concatenate(outs, axis=0)
            if variant == "member_mm":
                outs = [mm(X[b * n:(b + 1) * n, :], C) for b in range(bb)]
                return jnp.concatenate(outs, axis=0)
            if variant == "stacked_mm":
                return mm(X, C)
            if variant == "swap":
                X3 = X.reshape(bb, n, n)
                return jnp.swapaxes(X3, 1, 2).reshape(bb * n, n) * 1.0000001
            if variant == "swap_mm":
                X3 = X.reshape(bb, n, n)
                Xt = jnp.swapaxes(X3, 1, 2).reshape(bb * n, n)
                return mm(Xt, C)
            if variant == "gdot":
                rows = jnp.sum(X * X, axis=1, keepdims=True)
                s = mm(G, rows)          # (bb, 1) per-member sums
                bc = mm(GT, s)           # (bb*n, 1) replicated back
                return X * (1.0 + 1e-12 * bc)
            if variant == "member_dot":
                scal = [jnp.sum(X[b * n:(b + 1) * n, :] ** 2)
                        for b in range(bb)]
                fac = functools.reduce(
                    lambda a, c: a + c, [1e-12 * s for s in scal], 1.0)
                return X * fac
            raise ValueError(variant)

        out_ref[:] = jax.lax.fori_loop(0, k, body, X_ref[:])

    @jax.jit
    def run(C, G, GT, X):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bb * n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(C, G, GT, X)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--bb", type=int, default=8)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n = args.n + 1
    bb = args.bb
    rng = np.random.default_rng(0)
    # orthogonal-ish C keeps the chain bounded (no overflow at k deep)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    C = jnp.asarray(q, jnp.float32)
    Gnp = np.zeros((bb, bb * n), np.float32)
    for b in range(bb):
        Gnp[b, b * n:(b + 1) * n] = 1.0
    G = jnp.asarray(Gnp)
    GT = jnp.asarray(Gnp.T)
    X = jnp.asarray(rng.standard_normal((bb * n, n)) * 0.1, jnp.float32)

    results = {}
    variants = ("serial_one", "member_mm", "left_mm", "stacked_mm", "swap",
                "swap_mm", "gdot", "member_dot")
    for variant in variants:
        run = build(variant, n, bb, args.k)
        out = run(C, G, GT, X)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run(C, G, GT, X)
        jax.block_until_ready(out)
        el = time.perf_counter() - t0
        us_per_op = el / args.reps / args.k * 1e6
        us_per_member_op = us_per_op / (1 if variant == "serial_one" else bb)
        results[variant] = {"us_per_op": round(us_per_op, 4),
                            "us_per_member_op": round(us_per_member_op, 4)}
        print(f"{variant:12s} {us_per_op:9.3f} us/op "
              f"({us_per_member_op:7.4f} us/member-op)", flush=True)

    summary = {"n": n, "bb": bb, "k": args.k, "reps": args.reps,
               "results": results}
    if args.record:
        path = os.path.join(REPO, "BENCH_RESULTS.json")
        data = json.load(open(path)) if os.path.exists(path) else {}
        data.setdefault("blocked_march_microbench", {})[
            f"n{n}_bb{bb}"] = summary
        json.dump(data, open(path, "w"), indent=1)
        open(path, "a").write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
