"""1D adjoint tests mirroring the reference suite
(src/1D/tests_1D/Test_1d_backward/test_1d_backward.py): terminal conditions,
per-step discrete CN equation residuals, q = -L p at all levels, r-equation
residual, plus golden parity on the real reference trajectory (new — the
reference's own integration test only checks operator ordering)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vch_tpu.config import ForwardSolverConfig1D
from vch_tpu.models.adjoint1d import AdjointSolver1D
from vch_tpu.ops.laplacian import laplacian_matrix_neumann
from vch_tpu.ops.potential import fpp_log


@pytest.fixture(scope="module")
def synthetic():
    """Synthetic smooth trajectory A sin(pi x/L)(1+0.2 cos(2 pi t/T))
    (ref test_1d_backward.py:132-137)."""
    cfg = ForwardSolverConfig1D(N=48, T=0.5, dt_initial=2.5e-2)
    N, Lx, T = cfg.N, cfg.Lx, cfg.T
    x = np.linspace(0, Lx, N + 1)
    t = np.arange(0.0, T + 1e-12, cfg.dt_initial)
    phi = 0.4 * np.sin(np.pi * x / Lx)[None, :] * (1 + 0.2 * np.cos(2 * np.pi * t / T))[:, None]
    phi_T_target = 0.2 * np.cos(np.pi * x / Lx)
    phi_Q = np.zeros_like(phi)
    adj = AdjointSolver1D(cfg)
    b1, b2 = 0.3, 13.0
    p, q, r = map(np.asarray, adj.run(phi, t, b1, b2, phi_Q, phi_T_target))
    h = x[1] - x[0]
    L = laplacian_matrix_neumann(N, h)
    return dict(cfg=cfg, x=x, t=t, phi=phi, phi_T=phi_T_target, phi_Q=phi_Q,
                p=p, q=q, r=r, L=L, b1=b1, b2=b2)


def _rel(a, scale):
    return np.abs(a).max() / (np.abs(scale).max() + 1e-300)


def test_terminal_conditions(synthetic):
    s = synthetic
    cfg, L = s["cfg"], s["L"]
    I = np.eye(L.shape[0])
    rhs_T = s["b2"] * (s["phi"][-1] - s["phi_T"])
    res = (I - cfg.tau * L) @ s["p"][-1] - rhs_T
    assert _rel(res, rhs_T) < 1e-10
    assert np.allclose(s["q"][-1], -(L @ s["p"][-1]), atol=1e-8)
    assert np.all(s["r"][-1] == 0.0)


def test_discrete_cn_equation_residual(synthetic):
    """Rebuild A p_n - B p_{n+1} - src from scratch at every level
    (ref test_1d_backward.py:199-229)."""
    s = synthetic
    cfg, L = s["cfg"], s["L"]
    L2 = L @ L
    I = np.eye(L.shape[0])
    t, phi, p = s["t"], s["phi"], s["p"]
    worst = 0.0
    for n in range(len(t) - 2, -1, -1):
        dt = t[n + 1] - t[n]
        fpp_n = np.asarray(fpp_log(jnp.asarray(phi[n]), cfg.c1, cfg.c2))
        fpp_np1 = np.asarray(fpp_log(jnp.asarray(phi[n + 1]), cfg.c1, cfg.c2))
        A = I - cfg.tau * L + 0.5 * dt * L2 - 0.5 * dt * (np.diag(fpp_n) @ L)
        B = I - cfg.tau * L - 0.5 * dt * L2 + 0.5 * dt * (np.diag(fpp_np1) @ L)
        src = 0.5 * dt * s["b1"] * ((phi[n] - s["phi_Q"][n]) + (phi[n + 1] - s["phi_Q"][n + 1]))
        res = A @ p[n] - (B @ p[n + 1] + src)
        worst = max(worst, _rel(res, B @ p[n + 1] + src))
    assert worst < 1e-9, worst


def test_q_equals_minus_Lp_all_levels(synthetic):
    s = synthetic
    err = np.abs(s["q"] + s["p"] @ s["L"].T).max()
    assert err < 1e-8 * max(1.0, np.abs(s["q"]).max())


def test_r_equation_cn_residual(synthetic):
    """-gamma (r_{n+1}-r_n)/dt + 0.5((r-q)_{n+1}+(r-q)_n) ~ 0
    (ref test_1d_backward.py:252-270 — which computed but forgot to assert;
    we assert)."""
    s = synthetic
    gamma = s["cfg"].gamma
    t, q, r = s["t"], s["q"], s["r"]
    worst = 0.0
    for n in range(len(t) - 1):
        dt = t[n + 1] - t[n]
        res = -gamma * (r[n + 1] - r[n]) / dt + 0.5 * ((r[n + 1] - q[n + 1]) + (r[n] - q[n]))
        worst = max(worst, np.abs(res).max())
    assert worst < 1e-8 * max(1.0, np.abs(q).max())


def test_operator_ordering_sensitivity(synthetic):
    """Correct A/B ordering residual must be >>100x smaller than swapped
    (ref test_1d_backward.py:273-315)."""
    s = synthetic
    cfg, L = s["cfg"], s["L"]
    L2 = L @ L
    I = np.eye(L.shape[0])
    t, phi, p = s["t"], s["phi"], s["p"]
    n = len(t) // 2
    dt = t[n + 1] - t[n]
    fpp_n = np.asarray(fpp_log(jnp.asarray(phi[n]), cfg.c1, cfg.c2))
    fpp_np1 = np.asarray(fpp_log(jnp.asarray(phi[n + 1]), cfg.c1, cfg.c2))
    A = I - cfg.tau * L + 0.5 * dt * L2 - 0.5 * dt * (np.diag(fpp_n) @ L)
    B = I - cfg.tau * L - 0.5 * dt * L2 + 0.5 * dt * (np.diag(fpp_np1) @ L)
    src = 0.5 * dt * s["b1"] * (phi[n] + phi[n + 1])
    good = np.linalg.norm(A @ p[n] - B @ p[n + 1] - src)
    swapped = np.linalg.norm(B @ p[n] - A @ p[n + 1] - src)
    assert swapped > 100 * good, (good, swapped)


def test_golden_adjoint_parity(golden_1d):
    """(p, q, r) on the reference trajectory match the reference adjoint."""
    g = golden_1d
    adj = AdjointSolver1D(ForwardSolverConfig1D())
    p, q, r = map(np.asarray, adj.run(g["phi_hist"], g["t_hist"], 0.3, 13.0,
                                      g["phi_Q_target"], g["phi_T_target"]))
    assert np.abs(p - g["p"]).max() < 1e-7 * np.abs(g["p"]).max()
    assert np.abs(q - g["q"]).max() < 1e-7 * np.abs(g["q"]).max()
    assert np.abs(r - g["r"]).max() < 1e-7 * max(np.abs(g["r"]).max(), 1e-3)


def test_spectral_adjoint_matches_golden(golden_1d):
    """Matrix-free spectral adjoint path == dense path == reference."""
    g = golden_1d
    adj = AdjointSolver1D(ForwardSolverConfig1D(linsolve_1d="spectral"))
    _, _, r = adj.run(g["phi_hist"], g["t_hist"], 0.3, 13.0,
                      g["phi_Q_target"], g["phi_T_target"])
    assert np.abs(np.asarray(r) - g["r"]).max() < 1e-8
