"""On-chip microbenchmark: fused Pallas BiCGStab Schur solve vs XLA path.

Times a batch of 2D Newton Schur solves (the program's dominant cost,
replacing the reference's spsolve, Forward2_solver.py:370) three ways:
  xla    — bicgstab_fixed composed from jnp ops (round-1 production path)
  pallas — ops/pallas_kernels.bicgstab_schur_pallas (whole solve in VMEM)
Prints JSON with solves/s for each and the speedup.

Usage: python scripts/bench_pallas_kernel.py [--n 64] [--batch 8] [--iters 10]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--krylov", type=int, default=10)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from vch_tpu.ops.linsolve import make_spectral_op_2d, newton_schur_solve_2d

    N, B = args.n, args.batch
    op = make_spectral_op_2d(N, N, 1.0 / N, 1.0 / N, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    shape = (B, N + 1, N + 1)
    phi = jnp.asarray(np.clip(0.3 * rng.standard_normal(shape), -0.9, 0.9),
                      jnp.float32)
    Rphi = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    Rmu = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    kw = dict(dt=1e-2, tau=0.05, c1=0.75, kappa=1e-4, delta_sep=1e-2)

    def make(use_pallas):
        def one(p, a, b):
            return newton_schur_solve_2d(op, p, a, b,
                                         fixed_iters=args.krylov,
                                         use_pallas=use_pallas, **kw)[0]
        f = jax.jit(jax.vmap(one))
        with jax.default_matmul_precision("high"):
            f(phi, Rphi, Rmu).block_until_ready()  # compile
        return f

    out = {"n": N, "batch": B, "krylov_iters": args.krylov}
    sols = {}
    for name, use in (("xla", False), ("pallas", True)):
        try:
            f = make(use)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                r = f(phi, Rphi, Rmu)
            r.block_until_ready()
            el = time.perf_counter() - t0
            out[name + "_solves_per_s"] = round(args.reps * B / el, 1)
            out[name + "_ms_per_solve"] = round(1e3 * el / (args.reps * B), 4)
            sols[name] = np.asarray(r)
        except Exception as e:  # surface compile errors per-path
            out[name + "_error"] = f"{type(e).__name__}: {e}"[:300]
    if "xla" in sols and "pallas" in sols:
        diff = np.linalg.norm(sols["pallas"] - sols["xla"]) / \
            max(np.linalg.norm(sols["xla"]), 1e-30)
        out["rel_diff"] = float(diff)
        out["speedup"] = round(out["pallas_solves_per_s"]
                               / out["xla_solves_per_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
