"""Exact discrete adjoint of the 2D forward solver via implicit differentiation.

2D counterpart of models/adjoint_exact1d.py (see its docstring for the
derivation). Differences:
  - the transposed Schur solve S^T lam2 = rhs is MATRIX-FREE: S^T v =
    (1/dt) v - (tau/dt + d) * (L^T v) + (kappa/2) L^T(L^T v), with
    L^T applied as Lx^T @ v + v @ Ly; the cosine-basis preconditioner
    transposes to (Vinv^T diag V^T);
  - the 2D Jacobian diagonal uses the reference's clip
    phi^2 <= 1 - delta_sep^2 (Forward2_solver.py:243-244);
  - the interior-masked mass correction (Forward2_solver.py:564-577)
    pulls back as lam_j -> lam_j - wts_j/Wint * sum_{i in interior} lam_i
    (mask treated as locally constant).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
from vch_tpu.models.forward1d import solve_w
from vch_tpu.models.forward2d import ForwardSolver2D, newton_2d
from vch_tpu.ops.grids import trapz_weights
from vch_tpu.ops.laplacian import apply_laplacian_2d
from vch_tpu.ops.linsolve import bicgstab, bicgstab_fixed


class ExactAdjoint2D:
    """Exact reduced-cost gradient d J_smooth / d u (as an L2(Q) density)."""

    def __init__(self, config: Optional[ForwardSolverConfig2D] = None):
        self.solver = ForwardSolver2D(config)
        self.config = self.solver.config
        cfg = self.config
        self.dtype = self.solver.dtype
        t = self.solver.t_hist
        wt_t = np.zeros(len(t))
        for i in range(len(t) - 1):
            dt = t[i + 1] - t[i]
            wt_t[i] += dt / 2
            wt_t[i + 1] += dt / 2
        self._wt_t = wt_t
        self._wxy = np.outer(trapz_weights(cfg.Nx + 1),
                             trapz_weights(cfg.Ny + 1)) * (
            self.solver.hx * self.solver.hy)
        self._grad = jax.jit(self._gradient_impl)

    def _forward_full(self, u, phi0):
        cfg = self.config
        s = self.solver
        wts_h = jnp.asarray(s._wts_h, self.dtype)
        dts = jnp.asarray(s.dts, self.dtype)
        lo, hi = -1.0 + DELTA_SEP, 1.0 - DELTA_SEP
        w0 = jnp.zeros_like(phi0)
        mu0 = s.initialize_mu(phi0, w0)
        m0 = jnp.sum(wts_h * phi0)

        def step(carry, inp):
            phi, mu, w = carry
            u_n, u_np1, dt = inp
            w_new = solve_w(w, dt, cfg.gamma, u_n, u_np1)
            mu_init = s.initialize_mu(phi, w_new)
            phi_star, mu_new = newton_2d(
                s.op, phi, mu, w, w_new, dt, cfg.tau, cfg.c1, cfg.c2,
                cfg.kappa, DELTA_SEP, cfg.newton_tol, cfg.newton_max_iter,
                s.krylov_tol, cfg.krylov_max_iter, mu_init,
                rtol=s._rtol, stagnation_exit=s._stagnation,
                krylov_fixed=s._krylov_fixed)
            phi_c = jnp.clip(phi_star, lo, hi)
            mass_error = jnp.sum(wts_h * phi_c) - m0
            interior = jnp.abs(phi_c) < (1.0 - DELTA_SEP - 5e-3)
            Wint = jnp.sum(jnp.where(interior, wts_h, 0.0))
            corrected = jnp.where(interior, phi_c - mass_error / Wint, phi_c)
            fallback = jnp.clip(phi_c - mass_error / (cfg.Lx * cfg.Ly), lo, hi)
            needs_fix = jnp.abs(mass_error) > 1e-16
            phi_next = jnp.where(needs_fix,
                                 jnp.where(Wint > 0, corrected, fallback),
                                 phi_c)
            return (phi_next, mu_new, w_new), (phi_next, phi_star, mu_new,
                                               w_new, interior)

        inputs = (u[:-1], u[1:], dts)
        _, outs = jax.lax.scan(step, (phi0, mu0, w0), inputs)
        return outs, mu0, w0

    def _gradient_impl(self, u, phi0, b1, b2, b3, phi_Q, phi_T):
        cfg = self.config
        dtype = self.dtype
        s = self.solver
        op = s.op
        lap = partial(apply_laplacian_2d, op.Lx, op.Ly)

        def lapT(v):
            return jnp.einsum("ab,...bj->...aj", op.Lx.T, v) + v @ op.Ly

        wts_h = jnp.asarray(s._wts_h, dtype)
        W = (jnp.asarray(self._wt_t, dtype)[:, None, None]
             * jnp.asarray(self._wxy, dtype)[None])
        dts = jnp.asarray(s.dts, dtype)
        tau, c1, c2, kappa, gamma = (cfg.tau, cfg.c1, cfg.c2, cfg.kappa,
                                     cfg.gamma)

        (phis, phi_stars, mus, ws, interiors), mu0, w0 = self._forward_full(
            u, phi0)
        phi_all = jnp.concatenate([phi0[None], phis], axis=0)

        diff = phi_all - phi_Q
        J1 = 0.5 * b1 * jnp.sum(W * diff * diff)
        J2 = 0.5 * b2 * jnp.sum(jnp.asarray(self._wxy, dtype)
                                * (phi_all[-1] - phi_T) ** 2)
        J3 = 0.5 * b3 * jnp.sum(W * u * u)
        J = J1 + J2 + J3

        dJdphi = b1 * W * diff
        dJdphi = dJdphi.at[-1].add(
            b2 * jnp.asarray(self._wxy, dtype) * (phi_all[-1] - phi_T))

        fixed = s._krylov_fixed

        def back(carry, inp):
            phibar_next, mubar_next, wbar_next = carry
            (phi_k, mu_k, phi_star, dt, dJdphi_k, u_n, u_np1,
             interior) = inp

            # mass-correction pull-back (interior mask from the forward)
            Wint = jnp.sum(jnp.where(interior, wts_h, 0.0))
            inner = jnp.sum(jnp.where(interior, phibar_next, 0.0))
            lam_phi_c = phibar_next - (inner / Wint) * wts_h
            mask = (jnp.abs(phi_star) < 1.0 - DELTA_SEP).astype(dtype)
            lam_phi_star = mask * lam_phi_c

            phi_sq = jnp.clip(phi_star * phi_star, 0.0,
                              1.0 - DELTA_SEP * DELTA_SEP)
            d = 2.0 * c1 / (1.0 - phi_sq)
            dbar = jnp.mean(d)

            def apply_ST(v):
                w = lapT(v)
                return ((1.0 / dt) * v - (tau / dt + d) * w
                        + 0.5 * kappa * lapT(w))

            denom = ((1.0 / dt) + 0.5 * kappa * op.lam ** 2
                     - (tau / dt + dbar) * op.lam)

            def apply_MT(v):
                # transpose of (V diag(1/denom) Vinv): Vinv^T diag V^T
                vhat = jnp.einsum("ab,bj->aj", op.Vx.T, v) @ op.Vy
                vhat = vhat / denom
                return jnp.einsum("ab,bj->aj", op.Vx_inv.T, vhat) @ op.Vy_inv

            # rhs = lam_phi* + 2 Kpp^T mubar;  Kpp^T v = -(k/2) L^T v + (tau/dt + d) v
            KppT_mubar = (-(0.5 * kappa) * lapT(mubar_next)
                          + (tau / dt + d) * mubar_next)
            rhs = lam_phi_star + 2.0 * KppT_mubar
            if fixed is not None:
                lam2 = bicgstab_fixed(apply_ST, rhs, apply_MT, n_iter=fixed)
            else:
                lam2 = bicgstab(apply_ST, rhs, apply_MT, tol=s.krylov_tol,
                                max_iter=cfg.krylov_max_iter)
            lam1 = -2.0 * mubar_next - lapT(lam2)

            phibar_k = ((tau / dt + 2.0 * c2) * lam1
                        + 0.5 * kappa * lapT(lam1) + (1.0 / dt) * lam2
                        + dJdphi_k)
            mubar_k = 0.5 * lam1 + 0.5 * lapT(lam2)
            wbar_total = wbar_next + 0.5 * lam1

            gamma_dt = gamma / dt
            a_w = (gamma_dt - 0.5) / (gamma_dt + 0.5)
            b_w = 0.5 / (gamma_dt + 0.5)
            ubar_n = b_w * wbar_total
            ubar_np1 = b_w * wbar_total
            wbar_k = a_w * wbar_total + 0.5 * lam1
            return (phibar_k, mubar_k, wbar_k), (ubar_n, ubar_np1)

        phi_prev = jnp.concatenate([phi0[None], phis[:-1]], axis=0)
        mu_prev = jnp.concatenate([mu0[None], mus[:-1]], axis=0)
        zero = jnp.zeros_like(phi0)
        init = (dJdphi[-1], zero, zero)
        inputs = (phi_prev, mu_prev, phi_stars, dts, dJdphi[:-1], u[:-1],
                  u[1:], interiors)
        _, (ubar_n_all, ubar_np1_all) = jax.lax.scan(back, init, inputs,
                                                     reverse=True)

        ubar = jnp.zeros_like(u)
        ubar = ubar.at[:-1].add(ubar_n_all)
        ubar = ubar.at[1:].add(ubar_np1_all)
        ubar = ubar + b3 * W * u
        grad_density = ubar / jnp.maximum(W, 1e-300)
        return grad_density, J

    def gradient(self, u, initial_phi: Optional[np.ndarray] = None,
                 b1: float = 5.0, b2: float = 10.0, b3: float = 1e-4,
                 phi_Q: Optional[np.ndarray] = None,
                 phi_T: Optional[np.ndarray] = None):
        """Exact smooth-cost gradient density for u of shape (M+1, Nx+1, Ny+1)."""
        dtype = self.dtype
        s = self.solver
        cfg = self.config
        shape = (cfg.Nx + 1, cfg.Ny + 1)
        phi0 = (s.default_initial_phi() if initial_phi is None
                else np.asarray(initial_phi, np.float64))
        u = jnp.asarray(u, dtype)
        assert u.shape == (s.M + 1,) + shape
        if phi_Q is None:
            phi_Q = jnp.zeros((s.M + 1,) + shape, dtype)
        else:
            phi_Q = jnp.asarray(phi_Q, dtype)
        if phi_T is None:
            phi_T = jnp.zeros(shape, dtype)
        else:
            phi_T = jnp.asarray(phi_T, dtype)
        g, J = self._grad(u, jnp.asarray(phi0, dtype), float(b1), float(b2),
                          float(b3), phi_Q, phi_T)
        return g, float(J)
