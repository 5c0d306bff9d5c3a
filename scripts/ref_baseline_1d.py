"""Measure the reference 1D implementation (CPU) and dump golden parity data.

Runs the *reference* code at /root/reference (read-only, executed not copied)
to record:
  - default-config forward trajectory (phi_hist, t_hist)
  - adjoint (p, q, r) on that trajectory
  - cost components for u=0
  - a few PGD iterations' cost trajectory + per-iteration wall time

Outputs:
  tests/golden/ref_1d.npz        (parity data)
  BASELINE_MEASURED.json         (merged timing entry, key "1d_n128")

Usage: MPLBACKEND=Agg python scripts/ref_baseline_1d.py
"""
import json
import os
import sys
import time

import numpy as np

REF = "/root/reference/src/1D/Vch_control_1D"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REF)

import matplotlib

matplotlib.use("Agg")

from Forward_solver import run_main_simulation  # noqa: E402
from backward_solver import run_backward  # noqa: E402
from cost_and_function import (  # noqa: E402
    calculate_cost,
    calculate_gradient,
    perform_gradient_step,
)
from config import ForwardSolverConfig, OptimizationConfig  # noqa: E402
from GD_1D import (  # noqa: E402
    build_targets_1d,
    perform_backtracking_line_search,
    perform_proximal_and_projection,
)


def main():
    fwd = ForwardSolverConfig()
    opt = OptimizationConfig()

    t0 = time.perf_counter()
    phi_hist, x, t_hist = run_main_simulation(fwd, store_history=True, verbose=False)
    fwd_time = time.perf_counter() - t0

    # forward repeat timing (warm)
    t0 = time.perf_counter()
    run_main_simulation(fwd, store_history=True, verbose=False)
    fwd_time = min(fwd_time, time.perf_counter() - t0)

    u0 = np.zeros_like(phi_hist)
    phi_T_target, phi_Q_target = build_targets_1d(
        x, t_hist, phi_hist[0].copy(), float(fwd.Lx), float(fwd.T),
        interactive=False, choice_t=1, choice_q=1,
    )

    t0 = time.perf_counter()
    p, q, r = run_backward(phi_hist, x, t_hist, opt.b1, opt.b2, phi_Q_target, phi_T_target)
    bwd_time = time.perf_counter() - t0

    cost0 = calculate_cost(phi_hist, u0, phi_Q_target, phi_T_target, x, t_hist,
                           opt.b1, opt.b2, opt.b3, opt.kappa_sparsity)

    # PGD iterations mirroring GD_1D.py main loop (optimistic + backtracking)
    n_iters = 8
    u_k, phi_k, cost_k = u0, phi_hist, cost0
    alpha_prev = opt.alpha_max
    cost_traj = [cost0]
    iter_times = []
    for k in range(n_iters):
        it0 = time.perf_counter()
        _, _, r_k = run_backward(phi_k, x, t_hist, opt.b1, opt.b2, phi_Q_target, phi_T_target)
        grad = calculate_gradient(r_k, u_k, opt.b3)
        u_opt = perform_proximal_and_projection(
            perform_gradient_step(u_k, grad, alpha_prev), alpha_prev,
            opt.kappa_sparsity, opt.u_min, opt.u_max)
        phi_opt, _, _ = run_main_simulation(fwd, store_history=True, control_input=u_opt, verbose=False)
        cost_opt = calculate_cost(phi_opt, u_opt, phi_Q_target, phi_T_target, x, t_hist,
                                  opt.b1, opt.b2, opt.b3, opt.kappa_sparsity, verbose=False)
        if cost_opt < cost_k:
            alpha_k, u_k, cost_k, phi_k = alpha_prev, u_opt, cost_opt, phi_opt
        else:
            alpha_k, u_k, cost_k, phi_k, _, _, _ = perform_backtracking_line_search(
                u_k, cost_k, grad, phi_Q_target, phi_T_target, x, t_hist,
                opt.b1, opt.b2, opt.b3, opt.kappa_sparsity,
                opt.u_min, opt.u_max, fwd, alpha_init=alpha_prev)
        alpha_prev = min(opt.alpha_max, alpha_k * 1.2)
        cost_traj.append(cost_k)
        iter_times.append(time.perf_counter() - it0)

    os.makedirs(os.path.join(REPO, "tests", "golden"), exist_ok=True)
    np.savez_compressed(
        os.path.join(REPO, "tests", "golden", "ref_1d.npz"),
        phi_hist=phi_hist, x=x, t_hist=t_hist, p=p, q=q, r=r,
        phi_T_target=phi_T_target, phi_Q_target=phi_Q_target,
        cost0=cost0, cost_traj=np.array(cost_traj),
        u_final=u_k, r_final=r_k,
    )

    entry = {
        "forward_s": fwd_time,
        "backward_s": bwd_time,
        "pgd_iter_s_mean": float(np.mean(iter_times)),
        "pgd_iters": n_iters,
        "cost0": float(cost0),
        "cost_final": float(cost_traj[-1]),
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["1d_n128"] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(entry, indent=2))


if __name__ == "__main__":
    main()
