"""Exact discrete adjoint of the 1D forward solver via implicit differentiation.

The reference's adjoint is an independently discretized continuous system
(optimize-then-discretize; backward_solver.py:99-105 drops kappa on L^2),
yielding an approximate gradient — entrywise ratios to true finite
differences vary by >10x (tests/test_gradient_consistency.py). This module
computes the EXACT gradient of the discrete reduced cost instead
(discretize-then-optimize), something the reference does not have:

Each CN step solves R(y; x) = 0 for y = (phi*, mu_{k+1}) given
x = (phi_k, mu_k, w_k, w_{k+1}) (Newton, forward1d). By the implicit
function theorem the reverse-mode cotangent pull-back through the step is

    J^T lam = ybar,     xbar = -(dR/dx)^T lam,

where J is the SAME Newton Jacobian [[Kpp, -I/2], [I/dt, -L/2]] evaluated at
the solution — so the transposed solve reduces by the same Schur elimination
to one system with S^T (ops/linsolve.py machinery, dense or spectral).
The post-step clip and the uniform mass projection
phi_{k+1} = P clip(phi*), P = I - (1/Lx) 1 wts_h^T, are linear/elementwise
pull-backs; the w-channel recurrence is linear.

The result is returned as a gradient DENSITY w.r.t. the L2(Q) trapezoidal
inner product (discrete gradient divided by the time x space quadrature
weights), so it is drop-in comparable with — and usable in place of — the
reference's r in  grad = r + b3 u.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vch_tpu.config import DELTA_SEP, ForwardSolverConfig1D
from vch_tpu.models.forward1d import ForwardSolver1D, newton_1d, solve_w
from vch_tpu.ops.grids import trapz_weights


class ExactAdjoint1D:
    """Exact reduced-cost gradient d J_smooth / d u (as an L2(Q) density)."""

    def __init__(self, config: Optional[ForwardSolverConfig1D] = None):
        self.solver = ForwardSolver1D(config)
        self.config = self.solver.config
        cfg = self.config
        self.dtype = self.solver.dtype
        n = cfg.N + 1
        # time-trapz weights on the CORE grid [0, t1, ..., T]
        t = self.solver.t_hist
        wt_t = np.zeros(len(t))
        for i in range(len(t) - 1):
            dt = t[i + 1] - t[i]
            wt_t[i] += dt / 2
            wt_t[i + 1] += dt / 2
        self._wt_t = wt_t
        self._wx = trapz_weights(n) * self.solver.h
        self._grad = jax.jit(self._gradient_impl)

    # ------------------------------------------------------------------
    def _forward_full(self, u, phi0):
        """Forward march storing (phi_corrected, phi_star, mu, w) per step."""
        cfg = self.config
        dtype = self.dtype
        s = self.solver
        L = jnp.asarray(s._L_np, dtype)
        wts_h = jnp.asarray(s._wts_h, dtype)
        dts = jnp.asarray(s.dts, dtype)
        w0 = jnp.zeros_like(phi0)
        mu0 = s.initialize_mu(phi0, w0)
        m0 = jnp.dot(wts_h, phi0)

        def step(carry, inp):
            phi, mu, w = carry
            u_n, u_np1, dt = inp
            w_new = solve_w(w, dt, cfg.gamma, u_n, u_np1)
            phi_star, mu_new = newton_1d(
                L, phi, mu, w, w_new, dt, cfg.tau, cfg.c1, cfg.c2, cfg.kappa,
                DELTA_SEP, cfg.newton_tol, cfg.newton_max_iter,
                rtol=s._rtol, stagnation_exit=s._stagnation,
                spectral_op=s._op1d, krylov_fixed=s._krylov_fixed,
                krylov_tol=s._krylov_tol)
            phi_c = jnp.clip(phi_star, -1.0 + DELTA_SEP, 1.0 - DELTA_SEP)
            phi_next = phi_c - (jnp.dot(wts_h, phi_c) - m0) / cfg.Lx
            return (phi_next, mu_new, w_new), (phi_next, phi_star, mu_new,
                                               w_new)

        inputs = (u[:-1], u[1:], dts)
        _, (phis, phi_stars, mus, ws) = jax.lax.scan(
            step, (phi0, mu0, w0), inputs)
        return phis, phi_stars, mus, ws, mu0, w0

    # ------------------------------------------------------------------
    def _gradient_impl(self, u, phi0, b1, b2, b3, phi_Q, phi_T):
        """u: core layout (M+1, N+1). Returns (grad_density, J_smooth)."""
        cfg = self.config
        dtype = self.dtype
        s = self.solver
        L = jnp.asarray(s._L_np, dtype)
        LT = L.T
        wts_h = jnp.asarray(s._wts_h, dtype)
        wx = jnp.asarray(self._wx, dtype)
        wt_t = jnp.asarray(self._wt_t, dtype)
        dts = jnp.asarray(s.dts, dtype)
        n = cfg.N + 1
        tau, c1, c2, kappa, gamma = (cfg.tau, cfg.c1, cfg.c2, cfg.kappa,
                                     cfg.gamma)

        phis, phi_stars, mus, ws, mu0, w0 = self._forward_full(u, phi0)
        phi_all = jnp.concatenate([phi0[None], phis], axis=0)   # (M+1, n)

        # smooth cost (tracking + terminal + control energy), trapz
        diff = phi_all - phi_Q
        J1 = 0.5 * b1 * jnp.sum(wt_t[:, None] * wx[None, :] * diff * diff)
        J2 = 0.5 * b2 * jnp.sum(wx * (phi_all[-1] - phi_T) ** 2)
        J3 = 0.5 * b3 * jnp.sum(wt_t[:, None] * wx[None, :] * u * u)
        J = J1 + J2 + J3

        # dJ/dphi_k (levels 1..M; phi_0 is fixed data)
        dJdphi = b1 * wt_t[:, None] * wx[None, :] * diff
        dJdphi = dJdphi.at[-1].add(b2 * wx * (phi_all[-1] - phi_T))

        # reverse sweep
        def back(carry, inp):
            phibar_next, mubar_next, wbar_next = carry
            phi_k, mu_k, phi_star, dt, dJdphi_next, u_n, u_np1 = inp

            # projection P^T then clip mask
            lam_phi_c = phibar_next - (jnp.sum(phibar_next) / cfg.Lx) * wts_h
            mask = (jnp.abs(phi_star) < 1.0 - DELTA_SEP).astype(dtype)
            lam_phi_star = mask * lam_phi_c

            # transposed Newton-Jacobian solve: S^T lam2 = lam_phi* + 2 Kpp^T mubar
            d = 2.0 * c1 / (1.0 - phi_star * phi_star)
            KppT = -(0.5 * kappa) * LT + jnp.diag(tau / dt + d)
            ST = (1.0 / dt) * jnp.eye(n, dtype=dtype) - KppT @ LT
            rhs = lam_phi_star + 2.0 * (KppT @ mubar_next)
            lam2 = jnp.linalg.solve(ST, rhs)
            lam1 = -2.0 * mubar_next - LT @ lam2

            # x-bar = -(dR/dx)^T lam
            phibar_k = ((tau / dt + 2.0 * c2) * lam1
                        + 0.5 * kappa * (LT @ lam1) + (1.0 / dt) * lam2)
            mubar_k = 0.5 * lam1 + 0.5 * (LT @ lam2)
            wbar_total = wbar_next + 0.5 * lam1

            gamma_dt = gamma / dt
            a_w = (gamma_dt - 0.5) / (gamma_dt + 0.5)
            b_w = 0.5 / (gamma_dt + 0.5)
            ubar_n = b_w * wbar_total
            ubar_np1 = b_w * wbar_total
            wbar_k = a_w * wbar_total + 0.5 * lam1

            phibar_k = phibar_k + dJdphi_next   # cost term at level k
            return (phibar_k, mubar_k, wbar_k), (ubar_n, ubar_np1)

        # inputs for reverse scan over steps k = M-1 .. 0
        phi_prev = jnp.concatenate([phi0[None], phis[:-1]], axis=0)  # phi_k
        mu_prev = jnp.concatenate([mu0[None], mus[:-1]], axis=0)
        init = (dJdphi[-1], jnp.zeros(n, dtype), jnp.zeros(n, dtype))
        inputs = (phi_prev, mu_prev, phi_stars, dts, dJdphi[:-1], u[:-1],
                  u[1:])
        _, (ubar_n_all, ubar_np1_all) = jax.lax.scan(back, init, inputs,
                                                     reverse=True)

        # scatter-add the two per-step contributions onto control rows
        ubar = jnp.zeros_like(u)
        ubar = ubar.at[:-1].add(ubar_n_all)
        ubar = ubar.at[1:].add(ubar_np1_all)
        # direct control-energy term
        ubar = ubar + b3 * wt_t[:, None] * wx[None, :] * u

        # convert to L2(Q) density (guard zero end weights)
        W = wt_t[:, None] * wx[None, :]
        grad_density = ubar / jnp.maximum(W, 1e-300)
        return grad_density, J

    # ------------------------------------------------------------------
    def gradient(self, u, initial_phi: Optional[np.ndarray] = None,
                 b1: float = 0.3, b2: float = 13.0, b3: float = 0.0019,
                 phi_Q: Optional[np.ndarray] = None,
                 phi_T: Optional[np.ndarray] = None):
        """Exact smooth-cost gradient density for core-layout u (M+1, N+1).

        Returns (grad_density (M+1, N+1), J_smooth scalar).
        """
        dtype = self.dtype
        s = self.solver
        phi0 = (s.default_initial_phi() if initial_phi is None
                else np.asarray(initial_phi, np.float64))
        u = jnp.asarray(u, dtype)
        M, n = s.M, self.config.N + 1
        assert u.shape == (M + 1, n)
        if phi_Q is None:
            phi_Q = jnp.zeros((M + 1, n), dtype)
        else:
            phi_Q = jnp.asarray(phi_Q, dtype)
        if phi_T is None:
            phi_T = jnp.zeros(n, dtype)
        else:
            phi_T = jnp.asarray(phi_T, dtype)
        g, J = self._grad(u, jnp.asarray(phi0, dtype), float(b1), float(b2),
                          float(b3), phi_Q, phi_T)
        return g, float(J)
