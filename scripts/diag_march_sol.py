"""Speed-of-light analysis of the fused whole-march kernel (SURVEY §7 step 8).

Times three things on-chip at the headline shape and attributes the gap:

  march    — ops/pallas_march.march_fused_2d, B members x M steps
             (per-solve cost = wall / measured newton_solves)
  mmchain  — a Pallas kernel running the same COUNT of dependent
             (n,n)@(n,n) HIGHEST-precision matmuls as one Newton solve
             (the serial-matmul latency floor for this design)
  mxu_peak — the same FLOPs at ideal large-matmul throughput (from one
             big (4096,4096) matmul) — the absolute hardware ceiling

Usage: python scripts/diag_march_sol.py [--n 64] [--b 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--b", type=int, default=64)
    args = ap.parse_args()
    N, B = args.n, args.b

    from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
    from vch_tpu.models.forward2d import ForwardSolver2D
    from vch_tpu.ops.potential import init_phi_random_2d

    cfg = ForwardSolverConfig2D(Nx=N, Ny=N, T=1.0, dtype="float32",
                                newton_tol=2e-4)
    s = ForwardSolver2D(cfg)
    n = N + 1
    trips = cfg.fused_krylov_fixed_iters or s._krylov_fixed
    phi0 = jnp.asarray(np.stack([
        init_phi_random_2d(N, N, DELTA_SEP, amp=0.1, seed=42 + i)
        for i in range(B)]), s.dtype)
    u = jnp.zeros((B, s.M + 1, n, n), s.dtype)

    f = jax.jit(s.march_fused_batch)
    phi, ns, _ = f(u, phi0)
    jax.block_until_ready(phi)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        phi, ns, _ = f(u, phi0)
    jax.block_until_ready(phi)
    t_march = (time.perf_counter() - t0) / reps
    solves = int(np.asarray(ns).sum())
    us_per_solve = t_march / solves * 1e6

    # matmul count per Newton solve in the kernel (trips=3 default):
    #   residual reuse means ~1 resid per iter (4 mm) amortized into armijo,
    #   schur: rhs lap 2 + to_s 2 + trips*(to_s+from_s inside apply_S x2 = 8)
    #   + from_s 2 + dmu lap 2; armijo trial resid 4
    mm_per_solve = 4 + 2 + 2 + trips * 8 + 2 + 2 + 4

    # serial dependent-matmul floor at this operand size — amortize the
    # kernel-launch/dispatch latency over AMORT solves in ONE launch
    AMORT = 2000

    def chain_kernel(a_ref, v_ref, o_ref):
        v = v_ref[:]
        a = a_ref[:]
        def body(_, x):
            return jnp.dot(a, x, preferred_element_type=x.dtype,
                           precision=jax.lax.Precision.HIGHEST)
        o_ref[:] = jax.lax.fori_loop(0, mm_per_solve * AMORT, body, v)

    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)) * 1e-2,
                    jnp.float32)
    v = jnp.ones((n, n), jnp.float32)
    chain = jax.jit(lambda a, v: pl.pallas_call(
        chain_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, v))
    o = chain(a, v); jax.block_until_ready(o)
    t0 = time.perf_counter()
    K = 3
    for _ in range(K):
        o = chain(a, v)
    jax.block_until_ready(o)
    us_chain = (time.perf_counter() - t0) / (K * AMORT) * 1e6

    # ideal MXU throughput from a big matmul
    Abig = jnp.ones((4096, 4096), jnp.float32)
    big = jax.jit(lambda x: jnp.dot(x, x, precision=jax.lax.Precision.HIGHEST))
    r = big(Abig); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = big(Abig)
    jax.block_until_ready(r)
    t_big = (time.perf_counter() - t0) / 10
    peak_flops = 2 * 4096**3 / t_big
    solve_flops = mm_per_solve * 2 * n**3
    us_ideal = solve_flops / peak_flops * 1e6

    print(f"grid {N}x{N} B={B} trips={trips} M={s.M}")
    print(f"march: {t_march*1e3:.1f} ms, {solves} solves, "
          f"{us_per_solve:.2f} us/solve")
    print(f"  serial-matmul floor ({mm_per_solve} dependent (n,n) mm): "
          f"{us_chain:.2f} us  ({us_chain/us_per_solve:.0%} of measured)")
    print(f"  ideal-MXU floor (same FLOPs at {peak_flops/1e12:.1f} TFLOP/s "
          f"f32): {us_ideal:.2f} us  ({us_ideal/us_per_solve:.0%})")
    print(f"  => the kernel runs at {us_chain/us_per_solve:.0%} of the "
          f"dependent-matmul speed of light; the gap to the ideal-MXU "
          f"floor is operand SIZE (65x65 tiles under-fill the 128x128 "
          f"systolic array and serialize on issue latency), not kernel "
          f"overhead.")


if __name__ == "__main__":
    main()
