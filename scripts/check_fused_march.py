"""Parity + perf check: fused-march Pallas kernel vs the scan-based solver.

CPU (interpret mode):  python scripts/check_fused_march.py cpu
TPU (compiled):        python scripts/check_fused_march.py tpu [N] [B] [T]
"""
import sys
import time

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if mode == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
from vch_tpu.models.forward2d import ForwardSolver2D
from vch_tpu.ops.pallas_march import march_fused_2d
from vch_tpu.ops.potential import init_phi_random_2d

N = int(sys.argv[2]) if len(sys.argv) > 2 else (16 if mode == "cpu" else 64)
B = int(sys.argv[3]) if len(sys.argv) > 3 else (2 if mode == "cpu" else 32)
T = float(sys.argv[4]) if len(sys.argv) > 4 else (0.06 if mode == "cpu" else 1.0)

cfg = ForwardSolverConfig2D(Nx=N, Ny=N, T=T, dtype="float32",
                            newton_tol=2e-4)
solver = ForwardSolver2D(cfg)
solver._use_pallas = True            # same Krylov path as the fused kernel
solver._pallas_interpret = mode == "cpu"
dtype = solver.dtype
M = solver.M
trips = solver._krylov_fixed
print(f"N={N} B={B} M={M} trips={trips} backend={jax.default_backend()}")

rng = np.random.default_rng(0)
phi0 = np.stack([init_phi_random_2d(N, N, DELTA_SEP, amp=0.1, seed=42 + i)
                 for i in range(B)])
u = 0.1 * rng.standard_normal((B, M + 1, N + 1, N + 1))
phi0_j = jnp.asarray(phi0, dtype)
u_j = jnp.asarray(u, dtype)

# scan path (vmapped)
scan_fwd = jax.jit(jax.vmap(lambda uu, p0: solver._march_impl(uu, p0)))
t0 = time.perf_counter()
phi_ref, st = scan_fwd(u_j, phi0_j)
jax.block_until_ready(phi_ref)
t_scan_c = time.perf_counter() - t0
t0 = time.perf_counter()
phi_ref, st = scan_fwd(u_j, phi0_j)
jax.block_until_ready(phi_ref)
t_scan = time.perf_counter() - t0
ns_ref = np.asarray(st.newton_solves)
print(f"scan: compile+run {t_scan_c:.2f}s, warm {t_scan:.3f}s, "
      f"newton_solves {ns_ref.sum()}")

op = solver.op
wts = jnp.asarray(solver._wts_h, dtype)
dts = jnp.asarray(solver.dts, dtype)


@jax.jit
def fused(uu, p0):
    return march_fused_2d(
        dts, p0, uu, op.Lx, op.Ly.T, op.Vx_inv, op.Vy_inv.T, op.Vx, op.Vy.T,
        op.lam, wts, cfg.tau, cfg.c1, cfg.c2, cfg.kappa, cfg.gamma,
        DELTA_SEP, cfg.Lx * cfg.Ly, cfg.newton_tol, solver._rtol,
        cfg.newton_max_iter, trips, stagnation_exit=solver._stagnation,
        interpret=mode == "cpu")


t0 = time.perf_counter()
phi_f, ns_f, bad_f = fused(u_j, phi0_j)
jax.block_until_ready(phi_f)
t_fused_c = time.perf_counter() - t0
t0 = time.perf_counter()
phi_f, ns_f, bad_f = fused(u_j, phi0_j)
jax.block_until_ready(phi_f)
t_fused = time.perf_counter() - t0
ns_f = np.asarray(ns_f)
print(f"fused: compile+run {t_fused_c:.2f}s, warm {t_fused:.3f}s, "
      f"newton_solves {ns_f.sum()} (per member {ns_f.tolist()[:8]}...)")
print(f"bad = {np.asarray(bad_f).tolist()[:8]}")

diff = np.abs(np.asarray(phi_f) - np.asarray(phi_ref))
print(f"max|phi diff| = {diff.max():.3e}   (final frame "
      f"{diff[:, -1].max():.3e})")
print(f"speedup scan/fused = {t_scan / t_fused:.2f}x")
assert np.all(np.isfinite(np.asarray(phi_f)))
tol = 5e-3 if dtype == jnp.float32 else 1e-10
assert diff.max() < tol, diff.max()
print("FUSED MARCH PARITY OK")
