"""Does interleaving K independent matmul chains beat K sequential chains?

The fused 2D march kernel (ops/pallas_march.py) runs one member per grid
cell; docs/performance.md measured its Newton solve at 98% of the SERIAL
dependent-matmul floor, which itself sits 10x above the ideal-MXU floor
(a 65x65 HIGHEST matmul issues in ~278 ns against ~28 ns of systolic-array
compute). If that gap is issue/result latency rather than occupancy, K
INDEPENDENT chains interleaved in one kernel body should overlap: step t of
chain 2 can issue while step t of chain 1 drains.

This measures a chain of L dependent (n,n)@(n,n) matmuls per member at
interleave widths K = 1, 2, 4, 8 over the same total member count, both at
HIGHEST (6-pass f32) and single-pass bf16 precision.

Usage: python scripts/diag_interleave.py [--n 64] [--members 32] [--len 40]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--members", type=int, default=32)
    ap.add_argument("--len", dest="chain", type=int, default=40)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--loop-mode", action="store_true",
                    help="drive the chain with a fori_loop body instead of "
                         "fully unrolled matmuls (same measurement, "
                         "loop-trip overhead included)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    import vch_tpu  # noqa: F401 - registers the package-global matmul precision

    n = args.n + 1
    B = args.members
    rng = np.random.default_rng(0)
    # orthogonal-ish A keeps the chain norm-stable over L applications
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = jnp.asarray(q * 0.999, jnp.float32)
    X = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)

    loop_mode = args.loop_mode

    def chain_factory(K: int, L: int, prec):
        def kernel(A_ref, *refs):
            xs = [r[0] for r in refs[:K]]
            A_ = A_ref[:]
            dt_ = A_.dtype

            def mm(a, c):
                return jnp.dot(a, c, preferred_element_type=dt_,
                               precision=prec)

            out = tuple(xs)
            if loop_mode:
                out = jax.lax.fori_loop(
                    0, L, lambda i, o: tuple(mm(A_, x) for x in o), out)
            else:
                for _ in range(L):       # unrolled: no loop-trip overhead
                    out = tuple(mm(A_, x) for x in out)
            for o_ref, o in zip(refs[K:], out):
                o_ref[0] = o
        return kernel

    def run(K: int, prec):
        groups = B // K
        kern = chain_factory(K, args.chain, prec)
        xs = [X[k::K][:groups] for k in range(K)]  # (groups, n, n) each

        @jax.jit
        def f(*xs):
            outs = pl.pallas_call(
                kern,
                grid=(groups,),
                in_specs=[pl.BlockSpec((n, n), lambda g: (0, 0))]
                + [pl.BlockSpec((1, n, n), lambda g: (g, 0, 0))] * K,
                out_specs=[pl.BlockSpec((1, n, n),
                                        lambda g: (g, 0, 0))] * K,
                out_shape=[jax.ShapeDtypeStruct((groups, n, n), jnp.float32)
                           for _ in range(K)],
            )(A, *xs)
            return outs

        out = f(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(*xs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        # ns per (member, chain-step) matmul
        return dt / (B * args.chain) * 1e9

    res = {"n": args.n, "members": B, "chain_len": args.chain,
           "body": "fori_loop" if loop_mode else "unrolled"}
    for label, prec in [("highest", jax.lax.Precision.HIGHEST),
                        ("bf16", jax.lax.Precision.DEFAULT)]:
        for K in (1, 2, 4, 8):
            if B % K:
                continue
            try:
                res[f"{label}_K{K}_ns_per_mm"] = round(run(K, prec), 1)
            except Exception as e:  # noqa: BLE001
                res[f"{label}_K{K}_ns_per_mm"] = f"ERR {type(e).__name__}"
    flops = 2 * n**3
    res["ideal_mxu_ns_at_19.7tflops_f32"] = round(flops / 19.7e12 * 1e9, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    sys.exit(main())
