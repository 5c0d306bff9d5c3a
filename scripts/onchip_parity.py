"""On-chip fused-kernel vs scan-path parity (VERDICT round-2 weak #6).

All 141+ CPU tests run the Pallas kernels in interpret mode; this script
runs BOTH the fused whole-march/whole-adjoint kernels and the vmapped
scan path on the REAL chip at matched Krylov arithmetic (trips pinned,
highest-precision solve dots) and records trajectory/adjoint agreement in
BENCH_RESULTS.json `onchip_fused_vs_scan`.

Usage: python scripts/onchip_parity.py [N] [T]
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    import jax
    import jax.numpy as jnp
    from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
    from vch_tpu.models.adjoint2d import AdjointSolver2D
    from vch_tpu.models.forward2d import ForwardSolver2D
    from vch_tpu.ops.potential import init_phi_random_2d

    assert jax.default_backend() != "cpu", "run on the TPU chip"
    # pin BOTH paths to identical arithmetic: trips 4 and 6-pass f32
    # matmuls everywhere (the production defaults differ — scan runs
    # 'high' bf16x3 forward matmuls, the fused kernel bf16x3 solve dots —
    # so production counts/trajectories differ by design; this measures
    # the KERNELS against the scan at matched numerics)
    cfg = ForwardSolverConfig2D(Nx=N, Ny=N, T=T, dtype="float32",
                                newton_tol=2e-4,
                                forward_matmul_precision="highest",
                                fused_krylov_fixed_iters=4,
                                fused_solve_precision="highest")
    s = ForwardSolver2D(cfg)
    adj = AdjointSolver2D(cfg)
    B = 4
    rng = np.random.default_rng(0)
    phi0 = jnp.asarray(np.stack([
        init_phi_random_2d(N, N, DELTA_SEP, amp=0.1, seed=42 + i)
        for i in range(B)]), s.dtype)
    u = jnp.asarray(0.1 * rng.standard_normal((B, s.M + 1, N + 1, N + 1)),
                    s.dtype)

    phi_f, ns_f, bad = s.march_fused_batch(u, phi0)
    phi_s, st = jax.jit(jax.vmap(s._march_impl))(u, phi0)
    jax.block_until_ready((phi_f, phi_s))
    fwd_diff = float(jnp.abs(phi_f - phi_s).max())
    ns_scan = int(np.asarray(st.newton_solves).sum())
    ns_fused = int(np.asarray(ns_f).sum())

    dts = jnp.asarray(s.dts, s.dtype)
    b1 = jnp.full((B,), 5.0, s.dtype)
    b2 = jnp.full((B,), 10.0, s.dtype)
    phi_Q = jnp.zeros_like(phi_f)
    phi_T = jnp.zeros_like(phi0)
    r_f = adj.adjoint_fused_batch(phi_f, dts, b1, b2, phi_Q, phi_T)
    r_s = jax.jit(jax.vmap(
        lambda ph, b1i, b2i: adj._run_impl(ph, dts, b1i, b2i,
                                           jnp.zeros_like(ph),
                                           jnp.zeros_like(ph[0]))[2]))(
        phi_f, b1, b2)
    jax.block_until_ready((r_f, r_s))
    r_scale = float(jnp.abs(r_s).max())
    adj_diff = float(jnp.abs(r_f - r_s).max())

    entry = {
        "grid": f"{N}x{N}", "T": T, "batch": B, "dtype": "float32",
        "krylov_trips_pinned": 4, "solve_prec": "highest",
        "forward_traj_maxdiff": fwd_diff,
        "newton_solves_fused": ns_fused, "newton_solves_scan": ns_scan,
        "adjoint_r_maxdiff": adj_diff, "adjoint_r_scale": r_scale,
        "adjoint_r_rel": adj_diff / max(r_scale, 1e-30),
        "note": "real-chip parity of the fused Pallas kernels vs the "
                "vmapped scan path at matched Krylov arithmetic "
                "(interpret-mode parity is gated in tests/).",
    }
    path = os.path.join(REPO, "BENCH_RESULTS.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["onchip_fused_vs_scan"] = entry
    json.dump(data, open(path, "w"), indent=1)
    print(json.dumps(entry, indent=1))


if __name__ == "__main__":
    main()
