"""Cost/gradient/prox tests mirroring the reference suites
(Test_1d_cost/test_1d_cost.py and Test_1d_proximal/test_1d_proximal.py):
exact gradient formula, term isolation against hand-computed trapz values,
soft-threshold closed forms, ISTA monotonic descent, prox fixed-point."""
import numpy as np
import jax.numpy as jnp

from vch_tpu.control.cost import cost_breakdown_1d
from vch_tpu.control.prox import (
    calculate_gradient,
    perform_gradient_step,
    proximal_step,
    soft_threshold,
)


def _grids(M=20, N=10):
    t = np.linspace(0, 1.0, M)
    x = np.linspace(0, 2.0, N)
    return t, x


def test_gradient_and_step_exact():
    rng = np.random.default_rng(0)
    r = rng.standard_normal((20, 10))
    u = rng.standard_normal((20, 10))
    b3, alpha = 0.0019, 0.7
    g = np.asarray(calculate_gradient(jnp.asarray(r), jnp.asarray(u), b3))
    assert np.allclose(g, r + b3 * u, atol=1e-15)
    step = np.asarray(perform_gradient_step(jnp.asarray(u), jnp.asarray(g), alpha))
    assert np.allclose(step, u - alpha * g, atol=1e-14)


def test_cost_zero_for_zero_inputs():
    t, x = _grids()
    J = cost_breakdown_1d(jnp.zeros((20, 10)), jnp.zeros((20, 10)),
                          jnp.zeros((20, 10)), jnp.zeros(10), x, t,
                          0.3, 13.0, 0.0019, 9e-5)
    assert all(float(j) == 0.0 for j in J)


def test_cost_term_isolation():
    """Each of J1..J4 alone equals the hand-computed nested-trapz value
    (ref test_1d_cost.py:164-280)."""
    t, x = _grids()
    rng = np.random.default_rng(1)
    phi = rng.standard_normal((20, 10))
    u = rng.standard_normal((20, 10))
    phiT = rng.standard_normal(10)
    b1, b2, b3, ks = 0.3, 13.0, 0.0019, 9e-5
    J1, J2, J3, J4 = [float(v) for v in cost_breakdown_1d(
        jnp.asarray(phi), jnp.asarray(u), jnp.zeros((20, 10)),
        jnp.asarray(phiT), x, t, b1, b2, b3, ks)]
    assert np.isclose(J1, (b1 / 2) * np.trapezoid(np.trapezoid(phi ** 2, x, axis=1), t))
    assert np.isclose(J2, (b2 / 2) * np.trapezoid((phi[-1] - phiT) ** 2, x))
    assert np.isclose(J3, (b3 / 2) * np.trapezoid(np.trapezoid(u ** 2, x, axis=1), t))
    assert np.isclose(J4, ks * np.trapezoid(np.trapezoid(np.abs(u), x, axis=1), t))


def test_soft_threshold_closed_form():
    u = jnp.asarray([-2.0, -0.5, -0.05, 0.0, 0.05, 0.5, 2.0])
    out = np.asarray(soft_threshold(u, 0.1))
    want = np.sign(u) * np.maximum(np.abs(np.asarray(u)) - 0.1, 0)
    assert np.allclose(out, want, atol=1e-15)


def test_prox_with_box_projection():
    """Soft-threshold then clip (ref test_1d_proximal.py:130-150)."""
    rng = np.random.default_rng(2)
    u = rng.standard_normal(100) * 2
    grad = rng.standard_normal(100)
    alpha, ks, umin, umax = 1.0, 0.3, -0.8, 0.8
    got = np.asarray(proximal_step(jnp.asarray(u), jnp.asarray(grad), alpha,
                                   ks, umin, umax))
    tmp = u - alpha * grad
    want = np.clip(np.sign(tmp) * np.maximum(np.abs(tmp) - alpha * ks, 0),
                   umin, umax)
    assert np.allclose(got, want, atol=1e-14)


def test_ista_monotone_descent_quadratic():
    """Objective 0.5||u - z||^2 + lam ||u||_1 is monotonically nonincreasing
    under ISTA (ref test_1d_proximal.py:152-179)."""
    rng = np.random.default_rng(3)
    z = rng.standard_normal(50)
    lam, alpha = 0.2, 0.9
    u = np.zeros(50)

    def obj(u):
        return 0.5 * np.sum((u - z) ** 2) + lam * np.sum(np.abs(u))

    prev = obj(u)
    for _ in range(150):
        grad = u - z
        u = np.asarray(proximal_step(jnp.asarray(u), jnp.asarray(grad),
                                     alpha, lam, -10.0, 10.0))
        cur = obj(u)
        assert cur <= prev + 1e-12
        prev = cur
    # fixed point is the soft-thresholded z
    assert np.allclose(u, np.sign(z) * np.maximum(np.abs(z) - lam, 0), atol=1e-6)


def test_prox_fixed_point_characterization():
    """u* = prox(u* - alpha grad(u*)) at the minimizer for several alphas
    (ref test_1d_proximal.py:183-201)."""
    rng = np.random.default_rng(4)
    z = rng.standard_normal(30)
    lam = 0.15
    u_star = np.sign(z) * np.maximum(np.abs(z) - lam, 0)
    for alpha in (0.25, 0.5, 1.0):
        grad = u_star - z
        u_next = np.asarray(proximal_step(jnp.asarray(u_star),
                                          jnp.asarray(grad), alpha, lam,
                                          -100.0, 100.0))
        assert np.allclose(u_next, u_star, atol=1e-12)
