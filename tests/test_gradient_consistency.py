"""Adjoint-gradient vs finite-difference consistency (a coverage gap in the
reference suite, SURVEY.md section 4).

The reference's adjoint is an INDEPENDENTLY discretized continuous system
(optimize-then-discretize: no kappa on L^2, own CN scheme —
backward_solver.py:99-105), so r + b3*u is an approximate gradient, not the
exact discrete one. Measured on the default physics it provides a valid
descent SIGNAL (signs agree, magnitudes correlate) but entrywise ratios to
true finite differences vary by >10x. We therefore assert the descent-signal
properties the algorithm actually relies on; the exact-gradient alternative
is models/adjoint_exact (implicit differentiation), tested separately.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from vch_tpu.config import ForwardSolverConfig1D, OptimizationConfig
from vch_tpu.control.problems import ControlProblem1D


@pytest.mark.slow
def test_reference_adjoint_gives_descent_signal():
    opt0 = OptimizationConfig(kappa_sparsity=0.0)
    prob = ControlProblem1D(ForwardSolverConfig1D(N=64, T=0.3), opt0)
    f, c = prob.loop.forward, prob.loop.cost
    M2, n = np.asarray(prob.phi_hist0).shape
    u0 = np.zeros((M2, n))
    phi = f(jnp.asarray(u0))
    r = np.asarray(prob.loop.adjoint(phi))
    eps = 1e-3
    rng = np.random.default_rng(0)
    # sample entries with non-negligible adjoint signal
    idx = np.argwhere(np.abs(r) > 0.2 * np.abs(r).max())
    sel = idx[rng.choice(len(idx), size=6, replace=False)]
    signs_match = 0
    for i, j in sel:
        up = u0.copy(); up[i, j] += eps
        um = u0.copy(); um[i, j] -= eps
        fd = (float(c(f(jnp.asarray(up)), jnp.asarray(up)))
              - float(c(f(jnp.asarray(um)), jnp.asarray(um)))) / (2 * eps)
        if np.sign(fd) == np.sign(r[i, j]):
            signs_match += 1
    # Measured: 4-6 of 6 signs agree depending on sample — the approximate
    # adjoint is a noisy pointwise signal; require a majority.
    assert signs_match >= len(sel) // 2 + 1, (
        f"{signs_match}/{len(sel)} signs agree")

    # and a full gradient step along -r must reduce the smooth cost
    c0 = float(c(phi, jnp.asarray(u0)))
    alpha = 10.0
    u1 = u0 - alpha * r
    c1 = float(c(f(jnp.asarray(u1)), jnp.asarray(u1)))
    assert c1 < c0
