"""On-chip cost decomposition of the fused BiCGStab Schur kernel.

The fused solve is ~100% of the forward step cost (one solve per Newton
iteration, ~1 Newton iteration per CN step at the f32 defaults), so its
per-trip cost sets the headline throughput. Each BiCGStab trip does ~16
(n,m)-sized matmuls (MXU) and 6 full-field dot-product reductions (VPU
cross-lane). This measures three variants to attribute the time:

  full     — the production kernel (ops/pallas_kernels.py)
  nodots   — same body, dot products replaced by constants (math is wrong;
             timing isolates the reduction cost)
  mmonly   — apply_M(apply_S(.)) chained n_iter times (matmul lower bound)

Usage: python scripts/diag_kernel_cost.py [--n 64] [--b 32] [--iters 10]
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from vch_tpu.ops import pallas_kernels as pk

    n = args.n + 1
    B = args.b
    rng = np.random.default_rng(0)
    mat = lambda: jnp.asarray(rng.standard_normal((n, n)) * 0.01,
                              jnp.float32)
    Lx = mat()
    den = jnp.asarray(1.0 + np.abs(rng.standard_normal((n, n))), jnp.float32)
    d = jnp.asarray(1.0 + np.abs(rng.standard_normal((B, n, n))), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)

    def timed(fn, *a):
        f = jax.jit(jax.vmap(fn))
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps

    # full production kernel
    t_full = timed(lambda dd, rr: pk.bicgstab_schur_pallas(
        Lx, Lx, Lx, Lx, Lx, Lx, den, dd, rr, 100.0, 5.0, 4.5e-4,
        n_iter=args.iters), d, rhs)

    # nodots variant: reuse the factory body but stub jnp.sum reductions out
    # by rebuilding the kernel with a fake dot
    def nodots_factory(n_iter):
        def kernel(scal_ref, Lx_ref, LyT_ref, Vxi_ref, VyiT_ref, Vx_ref,
                   VyT_ref, denom_ref, d_ref, b_ref, out_ref):
            inv_dt = scal_ref[0, 0]
            tau_dt = scal_ref[0, 1]
            half_kappa = scal_ref[0, 2]
            Lx_ = Lx_ref[:]
            LyT = LyT_ref[:]
            Vxi = Vxi_ref[:]
            VyiT = VyiT_ref[:]
            Vx = Vx_ref[:]
            VyT = VyT_ref[:]
            denom = denom_ref[:]
            dcoef = d_ref[:]
            b = b_ref[:]
            dt_ = b.dtype

            def mm(a, c):
                return jnp.dot(a, c, preferred_element_type=dt_,
                               precision=pk._PREC)

            def lap(v):
                return mm(Lx_, v) + mm(v, LyT)

            def apply_S(v):
                u = (tau_dt + dcoef) * v - half_kappa * lap(v)
                return inv_dt * v - lap(u)

            def apply_M(v):
                vhat = mm(mm(Vxi, v), VyiT) / denom
                return mm(mm(Vx, vhat), VyT)

            dot = lambda a, c: jnp.asarray(0.5, dt_)   # <-- stubbed
            one = jnp.asarray(1.0, dt_)
            r0 = b

            def body(_, carry):
                x, r, p, v, rho, alpha, omega = carry
                rho_new = dot(r0, r)
                beta = (rho_new / rho) * (alpha / omega)
                p_n = r + beta * (p - omega * v)
                phat = apply_M(p_n)
                v_n = apply_S(phat)
                alpha_n = rho_new / dot(r0, v_n)
                s = r - alpha_n * v_n
                shat = apply_M(s)
                t = apply_S(shat)
                omega_n = dot(t, s) / dot(t, t)
                x_n = x + alpha_n * phat + omega_n * shat
                r_n = s - omega_n * t
                return (x_n, r_n, p_n, v_n, rho_new, alpha_n, omega_n)

            z = jnp.zeros_like(b)
            out = jax.lax.fori_loop(0, n_iter, body,
                                    (z, r0, z, z, one, one, one))
            out_ref[:] = out[0]
        return kernel

    def nodots(dd, rr):
        scal = jnp.asarray([[100.0, 5.0, 4.5e-4]], jnp.float32)
        return pl.pallas_call(
            nodots_factory(args.iters),
            out_shape=jax.ShapeDtypeStruct(rr.shape, rr.dtype),
            in_specs=[pk._smem_spec()] + [pk._vmem_spec()] * 9,
            out_specs=pk._vmem_spec(),
        )(scal, Lx, Lx, Lx, Lx, Lx, Lx, den, dd, rr)

    t_nodots = timed(nodots, d, rhs)

    # matmuls-only: chained apply_M(apply_S(.)), no dots, minimal elementwise
    def mmonly_factory(n_iter):
        def kernel(scal_ref, Lx_ref, LyT_ref, Vxi_ref, VyiT_ref, Vx_ref,
                   VyT_ref, denom_ref, d_ref, b_ref, out_ref):
            inv_dt = scal_ref[0, 0]
            tau_dt = scal_ref[0, 1]
            half_kappa = scal_ref[0, 2]
            Lx_, LyT = Lx_ref[:], LyT_ref[:]
            Vxi, VyiT, Vx, VyT = (Vxi_ref[:], VyiT_ref[:], Vx_ref[:],
                                  VyT_ref[:])
            denom, dcoef = denom_ref[:], d_ref[:]
            b = b_ref[:]
            dt_ = b.dtype

            def mm(a, c):
                return jnp.dot(a, c, preferred_element_type=dt_,
                               precision=pk._PREC)

            def lap(v):
                return mm(Lx_, v) + mm(v, LyT)

            def step(_, v):
                u = (tau_dt + dcoef) * v - half_kappa * lap(v)
                sv = inv_dt * v - lap(u)
                vhat = mm(mm(Vxi, sv), VyiT) / denom
                w = mm(mm(Vx, vhat), VyT)
                u2 = (tau_dt + dcoef) * w - half_kappa * lap(w)
                sv2 = inv_dt * w - lap(u2)
                vhat2 = mm(mm(Vxi, sv2), VyiT) / denom
                return mm(mm(Vx, vhat2), VyT)

            out_ref[:] = jax.lax.fori_loop(0, n_iter, step, b)
        return kernel

    def mmonly(dd, rr):
        scal = jnp.asarray([[100.0, 5.0, 4.5e-4]], jnp.float32)
        return pl.pallas_call(
            mmonly_factory(args.iters),
            out_shape=jax.ShapeDtypeStruct(rr.shape, rr.dtype),
            in_specs=[pk._smem_spec()] + [pk._vmem_spec()] * 9,
            out_specs=pk._vmem_spec(),
        )(scal, Lx, Lx, Lx, Lx, Lx, Lx, den, dd, rr)

    t_mm = timed(mmonly, d, rhs)

    res = {
        "n": args.n, "b": B, "iters": args.iters,
        "full_ms": round(t_full * 1e3, 3),
        "nodots_ms": round(t_nodots * 1e3, 3),
        "mmonly_ms": round(t_mm * 1e3, 3),
        "full_us_per_member_trip": round(t_full / B / args.iters * 1e6, 2),
        "reduction_share": round(1 - t_nodots / t_full, 3),
    }
    print(import_json().dumps(res))


def import_json():
    import json
    return json


if __name__ == "__main__":
    sys.exit(main())
