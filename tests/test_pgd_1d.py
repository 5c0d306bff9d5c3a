"""End-to-end 1D PGD parity: the cost trajectory of the first iterations
matches the reference driver run (GD_1D.py main-loop semantics with
optimistic step + backtracking). This is the SURVEY.md section 7 stage-3
gate — a test the reference itself lacks."""
import numpy as np
import pytest

from vch_tpu.control.problems import ControlProblem1D


@pytest.mark.slow
def test_pgd_cost_trajectory_matches_reference(golden_1d):
    prob = ControlProblem1D()
    res = prob.optimize(max_iter=8, verbose=False)
    ours = np.asarray(res.cost_history)
    ref = golden_1d["cost_traj"]
    rel = np.abs(ours - ref) / np.abs(ref)
    assert rel.max() < 1e-6, rel
    assert np.abs(res.u_optimal - golden_1d["u_final"]).max() < 1e-6


def test_pgd_two_iterations_decrease_cost():
    prob = ControlProblem1D()
    res = prob.optimize(max_iter=2, verbose=False)
    assert res.cost_history[1] < res.cost_history[0]
    assert res.ls_trials_per_iter[0] >= 1


@pytest.mark.slow
def test_full_convergence_parity_with_reference():
    """Run PGD to convergence: the reference implementation (verified in a
    side-by-side run of the actual reference code) converges at iteration
    144 with final cost 0.0053704864; ours must land on the same optimum
    within the 1e-4 north-star (measured: 6e-8 relative, same iteration
    count, BASELINE.md acceptance)."""
    prob = ControlProblem1D()
    res = prob.optimize(max_iter=400, verbose=False)
    assert res.converged
    assert abs(res.iterations - 144) <= 5
    ref_final_cost = 0.0053704864
    assert abs(res.cost_history[-1] - ref_final_cost) / ref_final_cost < 1e-4
    stats = prob.verify_sparsity(res, verbose=False)
    assert stats["match_percentage"] > 99.0   # Theorem 4.7 gate (GD_1D.py:143)
