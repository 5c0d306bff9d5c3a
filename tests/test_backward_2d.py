"""2D adjoint tests mirroring the reference suite
(src/2D/tests_2D/Test_2d_backward/test_2d_backward.py): terminal conditions,
discrete CN equation residuals, q = -L p, r recursion, plus golden parity
against the reference adjoint on the real reference trajectory."""
import numpy as np
import jax.numpy as jnp
import pytest

from vch_tpu.config import ForwardSolverConfig2D
from vch_tpu.control.targets import build_targets_2d
from vch_tpu.models.adjoint2d import AdjointSolver2D
from vch_tpu.ops.laplacian import laplacian_matrix_neumann
from vch_tpu.ops.potential import fpp_log


@pytest.fixture(scope="module")
def synthetic():
    """Synthetic sin*sin trajectory (ref test_2d_backward.py:116-174)."""
    cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.2, dt_initial=2e-2)
    N = cfg.Nx
    x = np.linspace(0, 1, N + 1)
    t = np.arange(0.0, cfg.T + 1e-12, cfg.dt_initial)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    mode = 0.3 * np.sin(np.pi * xx) * np.sin(np.pi * yy)
    phi = mode[None] * (1 + 0.2 * np.cos(2 * np.pi * t / cfg.T))[:, None, None]
    phi_T = 0.2 * np.cos(np.pi * xx) * np.cos(np.pi * yy)
    phi_Q = np.zeros_like(phi)
    b1, b2 = 5.0, 10.0
    adj = AdjointSolver2D(cfg)
    p, q, r = map(np.asarray, adj.run(phi, t, b1, b2, phi_Q, phi_T))
    L1 = laplacian_matrix_neumann(N, 1 / N)
    L2d = np.kron(L1, np.eye(N + 1)) + np.kron(np.eye(N + 1), L1)
    return dict(cfg=cfg, x=x, t=t, phi=phi, phi_T=phi_T, phi_Q=phi_Q,
                p=p, q=q, r=r, L=L2d, b1=b1, b2=b2)


def test_terminal_conditions_2d(synthetic):
    s = synthetic
    cfg, L = s["cfg"], s["L"]
    n = L.shape[0]
    I = np.eye(n)
    rhs_T = (s["b2"] * (s["phi"][-1] - s["phi_T"])).ravel()
    res = (I - cfg.tau * L) @ s["p"][-1].ravel() - rhs_T
    assert np.abs(res).max() < 1e-8 * np.abs(rhs_T).max()
    assert np.allclose(s["q"][-1].ravel(), -(L @ s["p"][-1].ravel()), atol=1e-7)
    assert np.all(s["r"][-1] == 0.0)


def test_discrete_cn_equation_residual_2d(synthetic):
    s = synthetic
    cfg, L = s["cfg"], s["L"]
    L2 = L @ L
    I = np.eye(L.shape[0])
    t, phi, p = s["t"], s["phi"], s["p"]
    worst = 0.0
    for n in range(len(t) - 2, -1, -1):
        dt = t[n + 1] - t[n]
        fpp_n = np.asarray(fpp_log(jnp.asarray(phi[n]), cfg.c1, cfg.c2)).ravel()
        fpp_np1 = np.asarray(fpp_log(jnp.asarray(phi[n + 1]), cfg.c1, cfg.c2)).ravel()
        A = I - cfg.tau * L + 0.5 * dt * L2 - 0.5 * dt * (fpp_n[:, None] * L)
        B = I - cfg.tau * L - 0.5 * dt * L2 + 0.5 * dt * (fpp_np1[:, None] * L)
        src = 0.5 * dt * s["b1"] * ((phi[n] - s["phi_Q"][n])
                                    + (phi[n + 1] - s["phi_Q"][n + 1])).ravel()
        rhs = B @ p[n + 1].ravel() + src
        res = A @ p[n].ravel() - rhs
        worst = max(worst, np.abs(res).max() / (np.abs(rhs).max() + 1e-300))
    assert worst < 5e-7, worst


def test_q_equals_minus_Lp_2d(synthetic):
    s = synthetic
    for n in range(len(s["t"])):
        err = np.abs(s["q"][n].ravel() + s["L"] @ s["p"][n].ravel()).max()
        assert err < 1e-7 * max(1.0, np.abs(s["q"][n]).max())


def test_r_recursion_2d(synthetic):
    s = synthetic
    gamma = s["cfg"].gamma
    t, q, r = s["t"], s["q"], s["r"]
    for n in range(len(t) - 1):
        dt = t[n + 1] - t[n]
        den = gamma + 0.5 * dt
        want = ((gamma - 0.5 * dt) / den * r[n + 1]
                + 0.5 * dt / den * (q[n] + q[n + 1]))
        assert np.abs(r[n] - want).max() < 1e-9 * max(1.0, np.abs(q).max())


@pytest.fixture(scope="module")
def real_forward_last10():
    """Real 2D forward run, last-10-frames window
    (ref test_2d_backward.py:299-343: Nx=Ny=32, T=0.10, dt=1e-3,
    kappa=0.03^2)."""
    from vch_tpu.models.forward2d import ForwardSolver2D
    cfg = ForwardSolverConfig2D(Nx=32, Ny=32, Lx=1.0, Ly=1.0, T=0.10,
                                dt_initial=1e-3, tau=0.05, gamma=10.0,
                                c1=0.75, c2=1.0, kappa=0.03 ** 2)
    fwd = ForwardSolver2D(cfg)
    phi_hist, (x, y), t_hist = fwd.simulate()
    phi_hist = np.asarray(phi_hist)
    K = min(10, len(t_hist))
    return dict(cfg=cfg, phi10=phi_hist[-K:], t10=np.asarray(t_hist[-K:]),
                x=x, y=y)


def test_backward_operator_ordering_real_forward_2d(real_forward_last10):
    """Discrete CN adjoint step on a REAL forward trajectory must satisfy
        A(phi_n) p_n = B(phi_{n+1}) p_{n+1} + 0.5 dt b1 [(phi_n-phi_Qn)
                                                         + (phi_{n+1}-phi_Qn+1)]
    with rel residual < 5e-7, while the SWAPPED ordering (A at n+1, B at n)
    is worse by > 100x — the operator-ordering discrimination gate
    (ref test_2d_backward.py:299-414, gates :408-411)."""
    s = real_forward_last10
    cfg = s["cfg"]
    phi10, t10 = s["phi10"], s["t10"]
    N = cfg.Nx
    hx = s["x"][1] - s["x"][0]

    b1, b2 = 1.0, 0.7
    phi_Q = np.zeros_like(phi10)
    phi_T = np.zeros((N + 1, N + 1))
    adj = AdjointSolver2D(cfg)
    p, q, r = map(np.asarray, adj.run(phi10, t10, b1, b2, phi_Q, phi_T))

    L1 = laplacian_matrix_neumann(N, hx)
    I1 = np.eye(N + 1)
    L = np.kron(L1, I1) + np.kron(I1, L1)
    L2 = L @ L
    I = np.eye(L.shape[0])

    def A_mat(phi_2d, dt):
        fpp = np.asarray(fpp_log(jnp.asarray(phi_2d), cfg.c1, cfg.c2)).ravel()
        return I - cfg.tau * L + 0.5 * dt * L2 - 0.5 * dt * (fpp[:, None] * L)

    def B_mat(phi_2d, dt):
        fpp = np.asarray(fpp_log(jnp.asarray(phi_2d), cfg.c1, cfg.c2)).ravel()
        return I - cfg.tau * L - 0.5 * dt * L2 + 0.5 * dt * (fpp[:, None] * L)

    def rel_residual(res, left, right):
        return (np.linalg.norm(res)
                / (np.linalg.norm(left) + np.linalg.norm(right) + 1e-30))

    K = len(t10)
    for i in range(K - 1):
        dt_i = float(t10[i + 1] - t10[i])
        src = 0.5 * dt_i * b1 * ((phi10[i] - phi_Q[i])
                                 + (phi10[i + 1] - phi_Q[i + 1])).ravel()
        left_c = A_mat(phi10[i], dt_i) @ p[i].ravel()
        right_c = B_mat(phi10[i + 1], dt_i) @ p[i + 1].ravel() + src
        rel_corr = rel_residual(left_c - right_c, left_c, right_c)

        left_s = A_mat(phi10[i + 1], dt_i) @ p[i].ravel()
        right_s = B_mat(phi10[i], dt_i) @ p[i + 1].ravel() + src
        rel_swap = rel_residual(left_s - right_s, left_s, right_s)

        assert rel_corr < 5e-7, f"step {i}: correct residual {rel_corr:.2e}"
        assert (rel_swap + 1e-30) / (rel_corr + 1e-30) > 1e2, \
            f"step {i}: swap/correct ratio {rel_swap / rel_corr:.1f}"


def test_golden_adjoint_parity_2d(golden_2d):
    g = golden_2d
    cfg = ForwardSolverConfig2D(Nx=32, Ny=32, T=0.25)
    phi_T, phi_Q = build_targets_2d(g["x"], g["y"], g["t_hist"],
                                    g["phi_hist"][0], 1.0, 1.0, 0.25)
    adj = AdjointSolver2D(cfg)
    p, q, r = map(np.asarray, adj.run(g["phi_hist"], g["t_hist"], 5.0, 10.0,
                                      phi_Q, phi_T))
    assert np.abs(p[:2] - g["p"]).max() < 1e-8 * np.abs(g["p"]).max()
    assert np.abs(p[-1] - g["p_last"]).max() < 1e-10
    assert np.abs(q[:2] - g["q"]).max() < 1e-8 * np.abs(g["q"]).max()
    assert np.abs(r - g["r"]).max() < 1e-8 * np.abs(g["r"]).max()


def test_f32_adjoint_split_preconditioning(golden_2d):
    """float32 adjoint must match the f64 reference adjoint closely.

    Regression test for the f32 blow-up: the raw adjoint operator is
    biharmonic-dominated (condition ~1e6 at 64x64) and right-preconditioned
    f32 Krylov stalled at O(1) relative error, which the backward sweep
    amplified to ~1e14. The split-preconditioned solve (bicgstab_split)
    keeps Krylov iterates O(1)-scaled and restores f32 accuracy (measured
    cos similarity 1.0, rel err ~4e-4 at 64x64)."""
    g = golden_2d
    cfg32 = ForwardSolverConfig2D(Nx=32, Ny=32, T=0.25, dtype="float32")
    phi_T, phi_Q = build_targets_2d(g["x"], g["y"], g["t_hist"],
                                    g["phi_hist"][0], 1.0, 1.0, 0.25)
    adj = AdjointSolver2D(cfg32)
    _, _, r32 = map(np.asarray, adj.run(g["phi_hist"].astype(np.float32),
                                        g["t_hist"], 5.0, 10.0, phi_Q, phi_T))
    r64 = g["r"]
    assert np.all(np.isfinite(r32))
    cos = np.sum(r64 * r32) / (np.linalg.norm(r64) * np.linalg.norm(r32))
    assert cos > 0.9999, cos
    assert np.abs(r32 - r64).max() < 5e-3 * np.abs(r64).max()
