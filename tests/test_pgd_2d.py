"""End-to-end 2D PGD parity vs the reference driver (GD2_configured.py
semantics) on the 32x32, T=0.25 golden config."""
import numpy as np
import pytest

from vch_tpu.config import ForwardSolverConfig2D, OptimizationConfig
from vch_tpu.control.problems import ControlProblem2D


@pytest.mark.slow
def test_pgd_2d_cost_trajectory_matches_reference(golden_2d):
    prob = ControlProblem2D(ForwardSolverConfig2D(Nx=32, Ny=32, T=0.25),
                            OptimizationConfig.defaults_2d())
    res = prob.optimize(max_iter=3, verbose=False)
    ours = np.asarray(res.cost_history)
    ref = golden_2d["cost_traj"]
    rel = np.abs(ours - ref) / np.abs(ref)
    assert rel.max() < 1e-6, (ours, ref)
    assert np.abs(res.u_optimal - golden_2d["u_final"]).max() < 1e-5


@pytest.mark.slow
def test_pgd_2d_full_convergence_matches_reference():
    """Full-convergence 2D north star as an in-repo gate: on the 32x32
    T=0.25 config the REFERENCE (GD2_configured.py schedule, run by
    scripts/ref_convergence_2d.py) converges at iteration 26 with final
    cost 0.7492927900695695; ours matched to 8.6e-15 relative
    (BENCH_RESULTS.json convergence_2d_n32_T0.25). Gate at 1e-6 rel so an
    algorithmic regression trips long before the 1e-4 BASELINE.md
    acceptance."""
    REF_FINAL_COST = 0.7492927900695695   # measured from the reference run
    REF_CONV_ITER = 26
    prob = ControlProblem2D(ForwardSolverConfig2D(Nx=32, Ny=32, T=0.25),
                            OptimizationConfig.defaults_2d())
    res = prob.optimize(max_iter=60, verbose=False)
    assert res.converged, "PGD did not converge within 60 iterations"
    assert res.iterations == REF_CONV_ITER, res.iterations
    rel = abs(res.cost_history[-1] - REF_FINAL_COST) / REF_FINAL_COST
    assert rel < 1e-6, (res.cost_history[-1], rel)
