"""Measure the reference 2D implementation (CPU) and dump golden parity data.

Runs the *reference* code at /root/reference (read-only, executed not copied).
Grid size and iteration count come from argv:

    MPLBACKEND=Agg python scripts/ref_baseline_2d.py <N> <pgd_iters> [T] [golden]

Outputs tests/golden/ref_2d_n<N>.npz when golden=1, and merges timings into
BASELINE_MEASURED.json under key "2d_n<N>".
"""
import json
import os
import sys
import time

import numpy as np

REF = "/root/reference/src/2D/Vch_control_2D"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REF)

import matplotlib

matplotlib.use("Agg")

from Forward2_solver import run_main_simulation  # noqa: E402
from backward2_solver import run_backward  # noqa: E402
from cost2_and_function import calculate_cost, calculate_gradient, proximal_step  # noqa: E402
from config import ForwardSolverConfig, OptimizationConfig  # noqa: E402
from GD2_configured import build_targets  # noqa: E402


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    T = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    golden = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True

    fwd = ForwardSolverConfig(Nx=N, Ny=N, T=T)
    opt = OptimizationConfig()

    t0 = time.perf_counter()
    phi_hist, (x, y), t_hist = run_main_simulation(fwd, store_history=True, verbose=False)
    fwd_time = time.perf_counter() - t0

    u0 = np.zeros_like(phi_hist)
    phi_T_target, phi_Q_target = build_targets(
        x, y, t_hist, phi_hist[0].copy(), float(fwd.Lx), float(fwd.Ly), float(fwd.T),
        interactive=False, choice_t=1, choice_q=1)

    t0 = time.perf_counter()
    p, q, r = run_backward(phi_hist, x, y, t_hist, fwd, opt.b1, opt.b2, phi_Q_target, phi_T_target)
    bwd_time = time.perf_counter() - t0

    cost0 = calculate_cost(phi_hist, u0, phi_Q_target, phi_T_target, x, y, t_hist, opt)

    u_k, phi_k, cost_k = u0, phi_hist, cost0
    alpha_prev = opt.alpha_max
    cost_traj = [cost0]
    iter_times = []
    for k in range(n_iters):
        it0 = time.perf_counter()
        _, _, r_k = run_backward(phi_k, x, y, t_hist, fwd, opt.b1, opt.b2, phi_Q_target, phi_T_target)
        grad = calculate_gradient(r_k, u_k, opt)
        u_opt = proximal_step(u_k, grad, alpha_prev, opt)
        phi_opt, _, _ = run_main_simulation(fwd, store_history=True, control_input=u_opt, verbose=False)
        cost_opt = calculate_cost(phi_opt, u_opt, phi_Q_target, phi_T_target, x, y, t_hist, opt)
        if cost_opt < cost_k:
            alpha_k, u_k, cost_k, phi_k = alpha_prev, u_opt, cost_opt, phi_opt
        else:
            # single-level backtracking mirror (alpha_init = 0.8*alpha_prev, beta=0.8)
            alpha = alpha_prev * 0.8
            for _ in range(10):
                u_try = proximal_step(u_k, grad, alpha, opt)
                phi_try, _, _ = run_main_simulation(fwd, store_history=True, control_input=u_try, verbose=False)
                cost_try = calculate_cost(phi_try, u_try, phi_Q_target, phi_T_target, x, y, t_hist, opt)
                if cost_try < cost_k:
                    break
                alpha *= 0.8
            alpha_k, u_k, cost_k, phi_k = alpha, u_try, cost_try, phi_try
        alpha_prev = min(opt.alpha_max, alpha_k * 1.2)
        cost_traj.append(cost_k)
        iter_times.append(time.perf_counter() - it0)
        print(f"[ref2d N={N}] iter {k}: cost={cost_k:.6f} time={iter_times[-1]:.1f}s", flush=True)

    if golden:
        os.makedirs(os.path.join(REPO, "tests", "golden"), exist_ok=True)
        np.savez_compressed(
            os.path.join(REPO, "tests", "golden", f"ref_2d_n{N}.npz"),
            phi_hist=phi_hist.astype(np.float64), x=x, y=y, t_hist=t_hist,
            p=p[:2], q=q[:2], r=r,  # keep file small: r full, p/q first two levels
            p_last=p[-1], q_last=q[-1],
            phi_T_target=phi_T_target, phi_Q_target=phi_Q_target[-1],
            cost0=cost0, cost_traj=np.array(cost_traj), u_final=u_k,
        )

    entry = {
        "forward_s": fwd_time,
        "backward_s": bwd_time,
        "pgd_iter_s_mean": float(np.mean(iter_times)) if iter_times else None,
        "pgd_iters": n_iters,
        "T": T,
        "cost0": float(cost0),
        "cost_final": float(cost_traj[-1]),
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[f"2d_n{N}" + ("" if T == 1.0 else f"_T{T}")] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(entry, indent=2))


if __name__ == "__main__":
    main()
