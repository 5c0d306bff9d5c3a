"""Diagnostics tests: KKT sparsity verifier and second-order coercivity probe
(ref: GD_1D.py:115-147, second_order_conditions.py, second_order_conditions_2d.py)."""
import numpy as np
import pytest

from vch_tpu.control.diagnostics import (
    approximate_second_order_condition,
    generate_critical_cone_direction,
    verify_sparsity_condition,
)
from vch_tpu.control.problems import ControlProblem1D


def test_sparsity_verifier_perfect_match():
    rng = np.random.default_rng(0)
    r = rng.uniform(-2, 2, size=(50, 30))
    kappa = 0.5
    u = np.where(np.abs(r) <= kappa, 0.0, r)
    stats = verify_sparsity_condition(u, r, kappa, verbose=False)
    assert stats["match_percentage"] == 100.0
    assert stats["satisfied"]


def test_sparsity_verifier_detects_violation():
    r = np.zeros((10, 10))
    u = np.ones((10, 10))        # nonzero u where |r| <= kappa: violation
    stats = verify_sparsity_condition(u, r, 0.5, verbose=False)
    assert not stats["satisfied"]
    assert stats["match_percentage"] == 0.0


def test_critical_cone_direction_constraints():
    """Sign constraints at active bounds and the L1 kink
    (ref second_order_conditions.py:33-55)."""
    rng = np.random.default_rng(1)
    u = np.array([-1.0, 1.0, 0.0, 0.0, 0.0, 0.3])
    r = np.array([0.5, -0.5, 0.01, 0.2, -0.2, 0.0])
    kappa, b3 = 0.1, 0.0
    v = generate_critical_cone_direction(u, r, -1.0, 1.0, kappa, b3, rng,
                                         handle_kink=True)
    assert v[0] >= 0          # at lower bound: direction must point inward
    assert v[1] <= 0          # at upper bound
    assert v[2] == 0.0        # kink interior (|s| < kappa)
    assert v[3] <= 0          # kink with s >= kappa
    assert v[4] >= 0          # kink with s <= -kappa
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12


def test_second_order_probe_on_quadratic():
    """On a pure quadratic J(u) = b3/2 ||u||^2-like problem the FD estimate
    must recover positive curvature."""
    import jax.numpy as jnp

    b3 = 0.5

    def forward(u):
        return jnp.zeros_like(u)

    def cost(phi, u):
        return 0.5 * b3 * jnp.sum(u ** 2)

    u_star = np.zeros((4, 8))
    r_star = np.zeros((4, 8))
    d2s = approximate_second_order_condition(
        forward, cost, u_star, r_star, np.zeros((4, 8)), b3=b3, kappa=0.0,
        u_min=-1, u_max=1, num_directions=3, epsilon=1e-3, handle_kink=False)
    for d2 in d2s:
        assert abs(d2 - b3) < 1e-6   # J''[h,h] = b3 ||h||^2 = b3


@pytest.mark.slow
def test_end_to_end_diagnostics_1d():
    """After a short optimization, the probes run and report finite values
    (matching the reference driver's post-run check, GD_1D.py:490-507 —
    which likewise only WARNS when a direction shows non-positive curvature,
    since far from the optimum negative estimates are legitimate)."""
    prob = ControlProblem1D()
    res = prob.optimize(max_iter=4, verbose=False)
    stats = prob.verify_sparsity(res, verbose=False)
    assert 0.0 <= stats["match_percentage"] <= 100.0
    d2s = prob.second_order_check(res, num_directions=3)
    assert len(d2s) == 3
    assert all(np.isfinite(d2s))
