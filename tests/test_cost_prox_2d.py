"""2D cost/operator/prox tests mirroring the reference suites
(Test_2d_cost/test_2d_Cost.py, Test_2d_proximal/test_2d_proximal.py):
Neumann nullspace, energy-gradient consistency mu = -kappa Lap(phi) + f' - w,
term isolation, ISTA properties on 2D arrays."""
import numpy as np
import jax.numpy as jnp

from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
from vch_tpu.control.cost import cost_breakdown_2d
from vch_tpu.control.prox import proximal_step
from vch_tpu.models.forward2d import ForwardSolver2D
from vch_tpu.ops.laplacian import apply_laplacian_2d
from vch_tpu.ops.linsolve import make_spectral_op_2d
from vch_tpu.ops.potential import f_prime


def test_neumann_nullspace_2d():
    """Lap(const) = 0 exactly (ref test_2d_Cost.py:120-134)."""
    op = make_spectral_op_2d(20, 20, 1 / 20, 1 / 20)
    ones = jnp.ones((21, 21))
    assert float(jnp.abs(apply_laplacian_2d(op.Lx, op.Ly, ones)).max()) == 0.0


def test_energy_gradient_consistency():
    """initialize_mu == -kappa Lap(phi) + f'(phi) - w to 1e-12
    (ref test_2d_Cost.py:137-163)."""
    cfg = ForwardSolverConfig2D(Nx=24, Ny=24)
    s = ForwardSolver2D(cfg)
    rng = np.random.default_rng(0)
    phi = jnp.asarray(0.5 * np.tanh(rng.standard_normal((25, 25))))
    w = jnp.asarray(rng.standard_normal((25, 25)))
    mu = s.initialize_mu(phi, w)
    want = (-cfg.kappa * apply_laplacian_2d(s.op.Lx, s.op.Ly, phi)
            + f_prime(phi, cfg.c1, cfg.c2, DELTA_SEP) - w)
    assert float(jnp.abs(mu - want).max()) < 1e-12


def test_cost_term_isolation_2d():
    """Each J-term alone equals hand-computed nested trapz
    (ref test_2d_Cost.py:208-300)."""
    M, Nx, Ny = 8, 10, 12
    t = np.linspace(0, 1, M)
    x = np.linspace(0, 2, Nx)
    y = np.linspace(0, 1.5, Ny)
    rng = np.random.default_rng(1)
    phi = rng.standard_normal((M, Nx, Ny))
    u = rng.standard_normal((M, Nx, Ny))
    phiT = rng.standard_normal((Nx, Ny))
    b1, b2, b3, ks = 5.0, 10.0, 1e-4, 1e-4
    J1, J2, J3, J4 = [float(v) for v in cost_breakdown_2d(
        jnp.asarray(phi), jnp.asarray(u), jnp.zeros_like(jnp.asarray(phi)),
        jnp.asarray(phiT), x, y, t, b1, b2, b3, ks)]

    def sp(a):
        return np.trapezoid(np.trapezoid(a, y, axis=-1), x, axis=-1)

    assert np.isclose(J1, (b1 / 2) * np.trapezoid(sp(phi ** 2), t))
    assert np.isclose(J2, (b2 / 2) * sp((phi[-1] - phiT) ** 2))
    assert np.isclose(J3, (b3 / 2) * np.trapezoid(sp(u ** 2), t))
    assert np.isclose(J4, ks * np.trapezoid(sp(np.abs(u)), t))


def test_proximal_step_2d_arrays():
    """Soft-threshold + clip on (M, Nx, Ny) arrays
    (ref test_2d_proximal.py:133-257)."""
    rng = np.random.default_rng(2)
    u = rng.standard_normal((5, 9, 9)) * 2
    g = rng.standard_normal((5, 9, 9))
    alpha, ks = 0.7, 0.2
    got = np.asarray(proximal_step(jnp.asarray(u), jnp.asarray(g), alpha, ks,
                                   -1.0, 1.0))
    tmp = u - alpha * g
    want = np.clip(np.sign(tmp) * np.maximum(np.abs(tmp) - alpha * ks, 0),
                   -1, 1)
    assert np.allclose(got, want, atol=1e-14)
    assert got.shape == u.shape


def test_ista_monotone_2d():
    rng = np.random.default_rng(3)
    z = rng.standard_normal((4, 6, 6))
    lam, alpha = 0.15, 0.8
    u = np.zeros_like(z)

    def obj(u):
        return 0.5 * np.sum((u - z) ** 2) + lam * np.sum(np.abs(u))

    prev = obj(u)
    for _ in range(100):
        u = np.asarray(proximal_step(jnp.asarray(u), jnp.asarray(u - z),
                                     alpha, lam, -10.0, 10.0))
        cur = obj(u)
        assert cur <= prev + 1e-12
        prev = cur
