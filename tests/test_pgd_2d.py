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
