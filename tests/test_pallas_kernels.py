"""Pallas kernel correctness (interpret mode — no TPU needed).

The fused Schur-operator, adjoint-operator, and spectral-solve kernels must
match their XLA compositions exactly; they are alternative schedules of the
same math (ops/pallas_kernels.py).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vch_tpu.ops.laplacian import apply_laplacian_2d
from vch_tpu.ops.linsolve import from_spectral, make_spectral_op_2d, to_spectral
from vch_tpu.ops.pallas_kernels import (
    adjoint_apply_pallas,
    bicgstab_schur_pallas,
    schur_apply_pallas,
    spectral_solve_pallas,
)


def _setup(N=24):
    op = make_spectral_op_2d(N, N, 1 / N, 1 / N)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((N + 1, N + 1)))
    d = jnp.asarray(1.5 + rng.random((N + 1, N + 1)))
    return op, v, d, rng


def test_schur_apply_matches_xla():
    op, v, d, _ = _setup()
    dt, tau, kappa = 1e-2, 0.05, 1e-4
    lap = partial(apply_laplacian_2d, op.Lx, op.Ly)
    ref = (1 / dt) * v - lap((tau / dt + d) * v - 0.5 * kappa * lap(v))
    got = schur_apply_pallas(op.Lx, op.Ly.T, d, v, 1 / dt, tau / dt,
                             0.5 * kappa, interpret=True)
    assert float(jnp.abs(got - ref).max()) < 1e-10 * float(jnp.abs(ref).max())


def test_adjoint_apply_matches_xla():
    op, v, _, rng = _setup()
    dt, tau = 1e-2, 0.05
    fpp = jnp.asarray(rng.standard_normal(v.shape))
    lap = partial(apply_laplacian_2d, op.Lx, op.Ly)
    w = lap(v)
    ref = v - tau * w + 0.5 * dt * (lap(w) - fpp * w)
    got = adjoint_apply_pallas(op.Lx, op.Ly.T, fpp, v, tau, 0.5 * dt,
                               interpret=True)
    assert float(jnp.abs(got - ref).max()) < 1e-10 * float(jnp.abs(ref).max())


def test_spectral_solve_matches_xla():
    op, v, _, _ = _setup()
    denom = 1.0 + jnp.abs(op.lam)
    ref = from_spectral(op, to_spectral(op, v) / denom)
    got = spectral_solve_pallas(op.Vx_inv, op.Vy_inv.T, op.Vx, op.Vy.T,
                                denom, v, interpret=True)
    assert float(jnp.abs(got - ref).max()) < 1e-10 * float(jnp.abs(ref).max())


def test_schur_apply_vmaps_over_batch():
    op, _, _, rng = _setup(16)
    dt, tau, kappa = 1e-2, 0.05, 1e-4
    vb = jnp.asarray(rng.standard_normal((3, 17, 17)))
    db = jnp.asarray(1.5 + rng.random((3, 17, 17)))
    lap = partial(apply_laplacian_2d, op.Lx, op.Ly)
    f = jax.vmap(lambda dd, vv: schur_apply_pallas(
        op.Lx, op.Ly.T, dd, vv, 1 / dt, tau / dt, 0.5 * kappa,
        interpret=True))
    got = f(db, vb)
    ref = jax.vmap(lambda dd, vv: (1 / dt) * vv
                   - lap((tau / dt + dd) * vv - 0.5 * kappa * lap(vv)))(db, vb)
    assert float(jnp.abs(got - ref).max()) < 1e-10


def test_fused_bicgstab_schur_matches_bicgstab_fixed():
    """The fused whole-solve kernel must reproduce ops/linsolve.bicgstab_fixed
    exactly (same update recurrence, freeze floor, best-iterate tracking)."""
    from vch_tpu.ops.linsolve import newton_schur_solve_2d

    op, _, _, rng = _setup()
    phi = jnp.asarray(np.clip(0.3 * rng.standard_normal(op.lam.shape),
                              -0.9, 0.9))
    Rphi = jnp.asarray(rng.standard_normal(op.lam.shape))
    Rmu = jnp.asarray(rng.standard_normal(op.lam.shape))
    kw = dict(dt=1e-2, tau=0.05, c1=0.75, kappa=1e-4, delta_sep=1e-2)
    d1, m1 = newton_schur_solve_2d(op, phi, Rphi, Rmu, fixed_iters=8, **kw)
    d2, m2 = newton_schur_solve_2d(op, phi, Rphi, Rmu, fixed_iters=8,
                                   use_pallas=True, pallas_interpret=True,
                                   pallas_variant="raw", **kw)
    assert float(jnp.linalg.norm(d1 - d2)) <= 1e-12 * float(jnp.linalg.norm(d1))
    assert float(jnp.linalg.norm(m1 - m2)) <= 1e-12 * float(jnp.linalg.norm(m1))


def test_fused_bicgstab_schur_solves_system():
    """And the solve itself must actually solve S dphi = L Rphi - Rmu."""
    from functools import partial as _p

    from vch_tpu.ops.laplacian import apply_laplacian_2d
    from vch_tpu.ops.linsolve import newton_schur_solve_2d

    op, _, _, rng = _setup()
    phi = jnp.asarray(np.clip(0.3 * rng.standard_normal(op.lam.shape),
                              -0.9, 0.9))
    Rphi = jnp.asarray(rng.standard_normal(op.lam.shape))
    Rmu = jnp.asarray(rng.standard_normal(op.lam.shape))
    dt, tau, c1, kappa = 1e-2, 0.05, 0.75, 1e-4
    dphi, _ = newton_schur_solve_2d(op, phi, Rphi, Rmu, dt=dt, tau=tau,
                                    c1=c1, kappa=kappa, delta_sep=1e-2,
                                    fixed_iters=30, use_pallas=True,
                                    pallas_interpret=True)
    lap = _p(apply_laplacian_2d, op.Lx, op.Ly)
    d = 2.0 * c1 / (1.0 - jnp.clip(phi * phi, 0.0, 1.0 - 1e-4))
    Sd = (1.0 / dt) * dphi - lap((tau / dt + d) * dphi - 0.5 * kappa * lap(dphi))
    rhs = lap(Rphi) - Rmu
    rel = float(jnp.linalg.norm(Sd - rhs) / jnp.linalg.norm(rhs))
    assert rel < 1e-8, rel


def test_fused_bicgstab_schur_vmaps():
    """pallas_call's batching rule must map the fused solve over scenarios."""
    from vch_tpu.ops.linsolve import newton_schur_solve_2d

    op, _, _, rng = _setup(N=16)
    B = 3
    shape = (B,) + op.lam.shape
    phi = jnp.asarray(np.clip(0.3 * rng.standard_normal(shape), -0.9, 0.9))
    Rphi = jnp.asarray(rng.standard_normal(shape))
    Rmu = jnp.asarray(rng.standard_normal(shape))
    kw = dict(dt=1e-2, tau=0.05, c1=0.75, kappa=1e-4, delta_sep=1e-2)

    fn = lambda p, a, b: newton_schur_solve_2d(
        op, p, a, b, fixed_iters=8, use_pallas=True, pallas_interpret=True,
        **kw)
    d_batched, m_batched = jax.vmap(fn)(phi, Rphi, Rmu)
    for i in range(B):
        d_i, m_i = fn(phi[i], Rphi[i], Rmu[i])
        assert float(jnp.linalg.norm(d_batched[i] - d_i)) <= \
            1e-12 * float(jnp.linalg.norm(d_i))


def test_fused_adjoint_bicgstab_solves_system():
    """The fused split-preconditioned adjoint solve must satisfy
    A(phi) p = rhs (A = I - tau L + dt/2 L^2 - dt/2 fpp L) to tight
    residual, warm-started or not."""
    from vch_tpu.ops.pallas_kernels import bicgstab_adjoint_pallas
    from vch_tpu.ops.potential import fpp_log

    op, _, _, rng = _setup()
    dt, tau = 1e-2, 0.05
    phi = jnp.asarray(np.clip(0.3 * rng.standard_normal(op.lam.shape),
                              -0.9, 0.9))
    fpp = fpp_log(phi, 0.75, 1.0)
    rhs = jnp.asarray(rng.standard_normal(op.lam.shape))
    fbar = jnp.mean(fpp)
    denom = (1.0 - tau * op.lam + 0.5 * dt * op.lam ** 2
             - 0.5 * dt * fbar * op.lam)
    isd = jax.lax.rsqrt(jnp.abs(denom))
    for x0 in (jnp.zeros_like(rhs), 0.1 * rhs):
        p = bicgstab_adjoint_pallas(op.Lx, op.Ly.T, op.Vx_inv, op.Vy_inv.T,
                                    op.Vx, op.Vy.T, isd, fpp, rhs, x0,
                                    tau, 0.5 * dt, n_iter=25, interpret=True)
        lap = partial(apply_laplacian_2d, op.Lx, op.Ly)
        w = lap(p)
        Ap = p - tau * w + 0.5 * dt * (lap(w) - fpp * w)
        rel = float(jnp.linalg.norm(Ap - rhs) / jnp.linalg.norm(rhs))
        assert rel < 1e-9, rel


def test_adjoint2d_pallas_path_matches_xla_path():
    """End-to-end 2D adjoint sweep: the fused-kernel path (interpret mode)
    must match the adaptive bicgstab_split path on a real trajectory."""
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.control.targets import build_targets_2d
    from vch_tpu.models.adjoint2d import AdjointSolver2D
    from vch_tpu.models.forward2d import ForwardSolver2D

    cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.05, dt_initial=1e-2)
    s = ForwardSolver2D(cfg)
    phi_hist, (x, y), t = s.simulate()
    phi_T, phi_Q = build_targets_2d(x, y, t, np.asarray(phi_hist[0]),
                                    1.0, 1.0, cfg.T)
    ref = AdjointSolver2D(cfg)
    p0, q0, r0 = map(np.asarray, ref.run(np.asarray(phi_hist), t, 5.0, 10.0,
                                         phi_Q, phi_T))
    pal = AdjointSolver2D(cfg)
    pal._use_pallas = True
    pal._krylov_fixed = 25
    pal._pallas_interpret = True
    pal._run = jax.jit(pal._run_impl)
    p1, q1, r1 = map(np.asarray, pal.run(np.asarray(phi_hist), t, 5.0, 10.0,
                                         phi_Q, phi_T))
    scale = np.abs(r0).max()
    assert np.abs(r1 - r0).max() < 1e-9 * max(scale, 1e-12)
    assert np.abs(p1 - p0).max() < 1e-9 * np.abs(p0).max()


def test_kernel_vmem_fits_gate():
    """The fused-solve auto rule gates on the raised 100 MB scoped-VMEM
    limit (the kernels request it via _compiler_params; 257x257 f32 needs
    a measured 19.22 MB and used to OOM against Mosaic's 16 MB default).
    Grids beyond ~512x512 still fall back to the composed-XLA solve."""
    from vch_tpu.ops.pallas_kernels import kernel_vmem_fits
    assert kernel_vmem_fits(65, 65)      # 64x64 benchmark grid
    assert kernel_vmem_fits(129, 129)    # 128x128 (config 4), ran on-chip
    assert kernel_vmem_fits(257, 257)    # 256x256 (config 5), 19.22 MB
    assert not kernel_vmem_fits(769, 769)

    # the gate feeds the solver auto rule: 256x256 now stays fused on TPU
    # (this CPU test sees backend != tpu, so the auto rule is still False)
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.models.forward2d import ForwardSolver2D
    s = ForwardSolver2D(ForwardSolverConfig2D(Nx=256, Ny=256,
                                              dtype="float32"))
    assert s._use_pallas is False


def test_batched_tile_kernel_matches_serial():
    """The member-tiled fused solve must reproduce vmap-of-serial-kernel
    member-for-member (same recurrence; only the matmul/reduction tiling
    differs), including the B % block_b padding path."""
    from vch_tpu.ops.pallas_kernels import (bicgstab_schur_pallas,
                                           bicgstab_schur_pallas_batched)

    N = 24
    op = make_spectral_op_2d(N, N, 1 / N, 1 / N)
    rng = np.random.default_rng(0)
    B = 6
    shape = (B, N + 1, N + 1)
    phi = np.clip(0.3 * rng.standard_normal(shape), -0.9, 0.9)
    dt, tau, c1, kappa = 1e-2, 0.05, 0.75, 1e-4
    d = 2.0 * c1 / (1.0 - np.clip(phi * phi, 0.0, 1.0 - 1e-4))
    dbar = d.mean(axis=(1, 2), keepdims=True)
    lam = np.asarray(op.lam)
    denom = (1.0 / dt) + 0.5 * kappa * lam ** 2 - (tau / dt + dbar) * lam
    rhs = rng.standard_normal(shape)
    d_j, den_j, rhs_j = map(jnp.asarray, (d, denom, rhs))
    mats = (op.Lx, op.Ly.T, op.Vx_inv, op.Vy_inv.T, op.Vx, op.Vy.T)
    ref = jax.vmap(lambda dn, dd, rr: bicgstab_schur_pallas(
        *mats, dn, dd, rr, 1 / dt, tau / dt, 0.5 * kappa, n_iter=8,
        interpret=True))(den_j, d_j, rhs_j)
    for bb in (2, 4, 6):      # 4 exercises padding (6 -> 8)
        out = bicgstab_schur_pallas_batched(
            *mats, den_j, d_j, rhs_j, 1 / dt, tau / dt, 0.5 * kappa,
            n_iter=8, block_b=bb, interpret=True)
        rel = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
        assert rel < 1e-10, (bb, rel)


def test_batched_tile_kernel_in_vmapped_march():
    """custom_vmap dispatch: a vmapped forward march with use_pallas routes
    the Schur solves through the member-tiled kernel and must match the
    composed-XLA march (f32, identical Newton/Armijo decisions)."""
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.models.forward2d import ForwardSolver2D

    cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.1, dtype="float32",
                                newton_tol=2e-4)
    ref = ForwardSolver2D(cfg)
    pal = ForwardSolver2D(cfg)
    pal._use_pallas = True
    pal._pallas_interpret = True
    B = 5
    phi0 = jnp.asarray(np.tile(ref.default_initial_phi()[None], (B, 1, 1)),
                       jnp.float32)
    u = jnp.asarray(0.01 * np.random.default_rng(0).standard_normal(
        (B, ref.M + 1, 17, 17)), jnp.float32)
    a = np.asarray(jax.vmap(lambda uu, p0: ref._simulate_impl(uu, p0))(
        u, phi0))
    b = np.asarray(jax.vmap(lambda uu, p0: pal._simulate_impl(uu, p0))(
        u, phi0))
    assert np.abs(a - b).max() < 5e-6


def test_spectral_basis_schur_kernel_solves_system():
    """The spectral-basis fused solve must solve S dphi = rhs (the Krylov
    path differs from bicgstab_fixed — residual in the spectral metric —
    but the solution is the same system's)."""
    from functools import partial as _p
    from vch_tpu.ops.pallas_kernels import bicgstab_schur_spectral_pallas

    op, _, _, rng = _setup()
    phi = jnp.asarray(np.clip(0.3 * rng.standard_normal(op.lam.shape),
                              -0.9, 0.9))
    rhs = jnp.asarray(rng.standard_normal(op.lam.shape))
    dt, tau, c1, kappa = 1e-2, 0.05, 0.75, 1e-4
    d = 2.0 * c1 / (1.0 - jnp.clip(phi * phi, 0.0, 1.0 - 1e-4))
    dbar = jnp.mean(d)
    denom = (1.0 / dt) + 0.5 * kappa * op.lam ** 2 - (tau / dt + dbar) * op.lam
    dphi = bicgstab_schur_spectral_pallas(
        op.Vx_inv, op.Vy_inv.T, op.Vx, op.Vy.T, op.lam, denom, d, rhs,
        1 / dt, tau / dt, 0.5 * kappa, n_iter=30, interpret=True)
    lap = _p(apply_laplacian_2d, op.Lx, op.Ly)
    Sd = (1.0 / dt) * dphi - lap((tau / dt + d) * dphi
                                 - 0.5 * kappa * lap(dphi))
    rel = float(jnp.linalg.norm(Sd - rhs) / jnp.linalg.norm(rhs))
    assert rel < 1e-10, rel


def test_spectral_variant_march_matches_xla():
    """Default fused variant (spectral): a march through it must agree
    with the composed-XLA march within the Newton-tolerance envelope (the
    Krylov paths differ; each step's solution is gated by newton_tol)."""
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.models.forward2d import ForwardSolver2D

    cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.1, dtype="float32",
                                newton_tol=2e-4)
    ref = ForwardSolver2D(cfg)
    pal = ForwardSolver2D(cfg)
    assert pal._pallas_variant == "spectral"
    pal._use_pallas = True
    pal._pallas_interpret = True
    phi0 = jnp.asarray(ref.default_initial_phi(), jnp.float32)
    u = jnp.zeros((ref.M + 1, 17, 17), jnp.float32)
    a = np.asarray(ref._simulate_impl(u, phi0))
    b = np.asarray(pal._simulate_impl(u, phi0))
    assert np.all(np.isfinite(b))
    assert np.abs(a - b).max() < 5e-3, np.abs(a - b).max()


def test_spectral_adjoint_kernel_matches_split():
    """The spectral-basis adjoint kernel must reproduce the
    split-preconditioned reference adjoint at f64 (both converge to the
    same solve well below the comparison tolerance)."""
    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.models.adjoint2d import AdjointSolver2D
    from vch_tpu.models.forward2d import ForwardSolver2D
    from vch_tpu.control.targets import build_targets_2d

    cfg = ForwardSolverConfig2D(Nx=24, Ny=24, T=0.1)
    s = ForwardSolver2D(cfg)
    phi_hist, (x, y), t = s.simulate()
    phi_T, phi_Q = build_targets_2d(x, y, t, np.asarray(phi_hist[0]),
                                    1.0, 1.0, cfg.T)
    ref = AdjointSolver2D(cfg)
    p0, q0, r0 = map(np.asarray, ref.run(np.asarray(phi_hist), t, 5.0, 10.0,
                                         phi_Q, phi_T))
    pal = AdjointSolver2D(cfg)
    pal._use_pallas = True
    pal._krylov_fixed = 25
    pal._pallas_interpret = True
    assert pal._pallas_variant == "spectral"
    pal._run = jax.jit(pal._run_impl)
    p1, q1, r1 = map(np.asarray, pal.run(np.asarray(phi_hist), t, 5.0, 10.0,
                                         phi_Q, phi_T))
    assert np.abs(r1 - r0).max() < 1e-9 * max(np.abs(r0).max(), 1e-12)
    assert np.abs(p1 - p0).max() < 1e-9 * np.abs(p0).max()
