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
