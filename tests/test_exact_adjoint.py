"""Exact discrete adjoint (implicit differentiation) tests.

No reference analog: the reference only has the approximate
optimize-then-discretize adjoint. Gate: the exact gradient matches central
finite differences of the discrete smooth cost ENTRYWISE to ~1e-6 relative
(vs >10x entrywise discrepancy for the reference adjoint,
tests/test_gradient_consistency.py)."""
import numpy as np
import pytest

from vch_tpu.config import ForwardSolverConfig1D, OptimizationConfig
from vch_tpu.control.problems import ControlProblem1D
from vch_tpu.models.adjoint_exact1d import ExactAdjoint1D


@pytest.mark.slow
def test_exact_gradient_matches_finite_differences():
    cfg = ForwardSolverConfig1D(N=48, T=0.2, newton_tol=1e-10)
    ea = ExactAdjoint1D(cfg)
    M, n = ea.solver.M, cfg.N + 1
    rng = np.random.default_rng(0)
    u = 0.1 * rng.standard_normal((M + 1, n))
    b1, b2, b3 = 0.3, 13.0, 0.0019
    g, J = ea.gradient(u, b1=b1, b2=b2, b3=b3)
    g = np.asarray(g)
    assert np.isfinite(J)

    wt_t, wx = ea._wt_t, ea._wx
    eps = 1e-5
    for i, j in [(5, 10), (12, 30), (M // 2, 5), (0, 20), (M, 25)]:
        up = u.copy(); up[i, j] += eps
        um = u.copy(); um[i, j] -= eps
        fd = (ea.gradient(up, b1=b1, b2=b2, b3=b3)[1]
              - ea.gradient(um, b1=b1, b2=b2, b3=b3)[1]) / (2 * eps)
        pred = g[i, j] * wt_t[i] * wx[j]
        assert abs(fd - pred) < 1e-5 * max(abs(fd), 1e-8), (i, j, fd, pred)


@pytest.mark.slow
def test_exact_mode_pgd_descends_monotonically():
    """With keep_failed_step=False the exact-gradient PGD never accepts an
    ascent step — unlike the reference schedule, whose failed line searches
    keep worse iterates."""
    prob = ControlProblem1D(opt_config=OptimizationConfig(alpha_max=0.5),
                            gradient_mode="exact")
    res = prob.optimize(max_iter=10, verbose=False)
    ch = np.asarray(res.cost_history)
    assert (np.diff(ch) <= 1e-12).all(), ch
    assert ch[-1] < ch[0]


@pytest.mark.slow
def test_exact_gradient_2d_matches_finite_differences():
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.models.adjoint_exact2d import ExactAdjoint2D

    cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.1, newton_tol=1e-11,
                                krylov_tol=1e-12)
    ea = ExactAdjoint2D(cfg)
    M = ea.solver.M
    rng = np.random.default_rng(0)
    u = 0.1 * rng.standard_normal((M + 1, 17, 17))
    b1, b2, b3 = 5.0, 10.0, 1e-4
    g, J = ea.gradient(u, b1=b1, b2=b2, b3=b3)
    g = np.asarray(g)
    assert np.isfinite(J)
    wt_t, wxy = ea._wt_t, ea._wxy
    eps = 1e-5
    for i, j, k in [(3, 5, 7), (7, 10, 2), (0, 8, 8)]:
        up = u.copy(); up[i, j, k] += eps
        um = u.copy(); um[i, j, k] -= eps
        fd = (ea.gradient(up, b1=b1, b2=b2, b3=b3)[1]
              - ea.gradient(um, b1=b1, b2=b2, b3=b3)[1]) / (2 * eps)
        pred = g[i, j, k] * wt_t[i] * wxy[j, k]
        assert abs(fd - pred) < 1e-4 * max(abs(fd), 1e-8), (i, j, k, fd, pred)


@pytest.mark.slow
def test_exact_mode_pgd_2d_descends():
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.control.problems import ControlProblem2D

    cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.1)
    opt = OptimizationConfig.defaults_2d(alpha_max=0.5)
    prob = ControlProblem2D(cfg, opt, gradient_mode="exact")
    res = prob.optimize(max_iter=6, verbose=False)
    ch = np.asarray(res.cost_history)
    assert (np.diff(ch) <= 1e-12).all()
    assert ch[-1] < ch[0]
