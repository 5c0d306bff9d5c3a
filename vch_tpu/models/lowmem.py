"""Memory-lean trajectory handling: segment-checkpointed recomputation.

The adjoint sweep needs the full phi trajectory; at 256x256 with large
scenario batches the stored history dominates memory (SURVEY.md section 7
'Memory at scale'). This module implements the classic sqrt-schedule
checkpointing: the forward marcher stores only every K-th state
(plus the running-cost accumulator), and the backward sweep recomputes each
K-step segment from its checkpoint just before consuming it — O(M/K + K)
live states instead of O(M).

Round-1 scope: standalone 2D functions, verified against the full-memory
solvers; PGD-loop integration is follow-up. The adjoint scheme is the
reference one (backward2_solver.py operators, see adjoint2d.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
from vch_tpu.models.adjoint2d import AdjointSolver2D
from vch_tpu.models.forward1d import solve_w
from vch_tpu.models.forward2d import ForwardSolver2D, newton_2d
from vch_tpu.ops.grids import trapz_weights
from vch_tpu.ops.laplacian import apply_laplacian_2d
from vch_tpu.ops.linsolve import bicgstab_split, from_spectral, to_spectral
from vch_tpu.ops.potential import fpp_log


class LowMemPipeline2D:
    """Checkpointed forward + recomputing adjoint for the 2D problem.

    Requires M % K == 0 (pick K near sqrt(M); K=10 for the default M=100)
    and a uniform dt schedule. Verified to reproduce the full-memory adjoint
    to machine precision (tests/test_lowmem.py).
    """

    def __init__(self, config: Optional[ForwardSolverConfig2D] = None,
                 K: int = 10):
        self.solver = ForwardSolver2D(config)
        self.adjoint = AdjointSolver2D(self.solver.config)
        self.config = self.solver.config
        self.K = K
        M = self.solver.M
        assert M % K == 0, f"M={M} must be divisible by K={K}"
        self.S = M // K
        dts = self.solver.dts
        assert np.allclose(dts, dts[0]), \
            "lowmem pipeline currently requires a uniform dt schedule"
        self.dt = float(dts[0])
        self.dtype = self.solver.dtype
        self._ckpt_fwd = jax.jit(self._forward_ckpt_impl)
        self._adj = jax.jit(self._adjoint_impl)

    # ------------------------------------------------------------------
    def _step(self, phi, mu, w, u_n, u_np1, m0):
        cfg = self.config
        s = self.solver
        wts_h = jnp.asarray(s._wts_h, self.dtype)
        lo, hi = -1.0 + DELTA_SEP, 1.0 - DELTA_SEP
        dt = self.dt
        w_new = solve_w(w, dt, cfg.gamma, u_n, u_np1)
        mu_init = s.initialize_mu(phi, w_new)
        phi_new, mu_new = newton_2d(
            s.op, phi, mu, w, w_new, dt, cfg.tau, cfg.c1, cfg.c2, cfg.kappa,
            DELTA_SEP, cfg.newton_tol, cfg.newton_max_iter, s.krylov_tol,
            cfg.krylov_max_iter, mu_init, rtol=s._rtol,
            stagnation_exit=s._stagnation, krylov_fixed=s._krylov_fixed,
            use_pallas=s._use_pallas)
        phi_c = jnp.clip(phi_new, lo, hi)
        mass_error = jnp.sum(wts_h * phi_c) - m0
        interior = jnp.abs(phi_c) < (1.0 - DELTA_SEP - 5e-3)
        Wint = jnp.sum(jnp.where(interior, wts_h, 0.0))
        corrected = jnp.where(interior, phi_c - mass_error / Wint, phi_c)
        fallback = jnp.clip(phi_c - mass_error / (cfg.Lx * cfg.Ly), lo, hi)
        phi_c = jnp.where(jnp.abs(mass_error) > 1e-16,
                          jnp.where(Wint > 0, corrected, fallback), phi_c)
        return phi_c, mu_new, w_new

    def _segment_scan(self, phi, mu, w, u_seg, m0):
        """Run K steps from (phi, mu, w); u_seg is (K+1, ...) control rows.
        Returns final carry and the (K+1, ...) phi states incl. the start."""
        def step(carry, inp):
            phi, mu, w = carry
            u_n, u_np1 = inp
            out = self._step(phi, mu, w, u_n, u_np1, m0)
            return out, out[0]

        (phi_f, mu_f, w_f), phis = jax.lax.scan(
            step, (phi, mu, w), (u_seg[:-1], u_seg[1:]))
        phis = jnp.concatenate([phi[None], phis], axis=0)
        return (phi_f, mu_f, w_f), phis

    def _forward_ckpt_impl(self, u, phi0):
        """Segment-checkpointed forward: returns per-segment (phi, mu, w)
        start states, the final phi, and the accumulated tracking cost."""
        K, S = self.K, self.S
        s = self.solver
        w0 = jnp.zeros_like(phi0)
        mu0 = s.initialize_mu(phi0, w0)
        m0 = jnp.sum(jnp.asarray(s._wts_h, self.dtype) * phi0)

        def outer(carry, i):
            phi, mu, w = carry
            u_seg = jax.lax.dynamic_slice_in_dim(u, i * K, K + 1, axis=0)
            (phi_f, mu_f, w_f), _ = self._segment_scan(phi, mu, w, u_seg, m0)
            return (phi_f, mu_f, w_f), (phi, mu, w)

        (phi_T, mu_T, w_T), (phi_ck, mu_ck, w_ck) = jax.lax.scan(
            outer, (phi0, mu0, w0), jnp.arange(S))
        return phi_ck, mu_ck, w_ck, phi_T

    # ------------------------------------------------------------------
    def _adjoint_impl(self, u, phi0, b1, b2, phi_Q_all, phi_T_target):
        """Reference-scheme adjoint with segment recomputation.

        phi_Q_all: (M+1, ...) tracking target (kept as an input array here;
        the trajectory and its intermediates are what this pipeline avoids
        storing — O(M/K + K) live phi states).
        """
        cfg = self.config
        op = self.solver.op
        K, S = self.K, self.S
        dt = self.dt
        tau, gamma, c1, c2 = cfg.tau, cfg.gamma, cfg.c1, cfg.c2
        lap = partial(apply_laplacian_2d, op.Lx, op.Ly)

        m0 = jnp.sum(jnp.asarray(self.solver._wts_h, self.dtype) * phi0)
        phi_ck, mu_ck, w_ck, phi_T = self._ckpt_fwd(u, phi0)

        # terminal conditions (exact cosine-diagonal solve)
        rhs_T = b2 * (phi_T - phi_T_target)
        p = from_spectral(op, to_spectral(op, rhs_T) / (1.0 - tau * op.lam))
        q = -lap(p)
        r = jnp.zeros_like(p)

        ktol = self.adjoint.krylov_tol

        def adj_step(carry, inp):
            p_next, q_next, r_next = carry
            phi_n, phi_np1, src_n, src_np1 = inp
            fpp_n = fpp_log(phi_n, c1, c2)
            fpp_np1 = fpp_log(phi_np1, c1, c2)
            fbar = jnp.mean(fpp_n)
            w1 = lap(p_next)
            Bp = (p_next - tau * w1 - 0.5 * dt * lap(w1)
                  + 0.5 * dt * fpp_np1 * w1)
            rhs = Bp + 0.5 * dt * b1 * (src_n + src_np1)

            def apply_A(v):
                w = lap(v)
                return v - tau * w + 0.5 * dt * (lap(w) - fpp_n * w)

            denom = (1.0 - tau * op.lam + 0.5 * dt * op.lam ** 2
                     - 0.5 * dt * fbar * op.lam)
            inv_sqrt = jax.lax.rsqrt(jnp.abs(denom))

            def Phalf(v):
                return from_spectral(op, to_spectral(op, v) * inv_sqrt)

            def Phalf_inv(v):
                return from_spectral(op, to_spectral(op, v) / inv_sqrt)

            p_n = bicgstab_split(apply_A, rhs, Phalf, Phalf_inv, tol=ktol,
                                 max_iter=cfg.krylov_max_iter, x0=p_next)
            q_n = -lap(p_n)
            den = gamma + 0.5 * dt
            r_n = ((gamma - 0.5 * dt) / den * r_next
                   + 0.5 * dt / den * (q_n + q_next))
            return (p_n, q_n, r_n), r_n

        def outer(carry, s_idx):
            p, q, r = carry
            i = S - 1 - s_idx          # segments in reverse order
            u_seg = jax.lax.dynamic_slice_in_dim(u, i * K, K + 1, axis=0)
            phiQ_seg = jax.lax.dynamic_slice_in_dim(
                phi_Q_all, i * K, K + 1, axis=0)
            _, phis = self._segment_scan(phi_ck[i], mu_ck[i], w_ck[i],
                                         u_seg, m0)
            src = phis - phiQ_seg
            inputs = (phis[:-1], phis[1:], src[:-1], src[1:])
            (p, q, r), r_seg = jax.lax.scan(adj_step, (p, q, r), inputs,
                                            reverse=True)
            return (p, q, r), r_seg

        (p0, q0, r0), r_segs = jax.lax.scan(outer, (p, q, r),
                                            jnp.arange(S))
        # r_segs: (S, K, ...) with segments in reverse order; reassemble
        r_hist = jnp.flip(r_segs, axis=0).reshape((S * K,) + r.shape)
        r_full = jnp.concatenate([r_hist, jnp.zeros_like(r)[None]], axis=0)
        return r_full

    # ------------------------------------------------------------------
    def adjoint_r(self, u, initial_phi=None, b1: float = 5.0,
                  b2: float = 10.0, phi_Q=None, phi_T_target=None):
        """Compute the reference-scheme adjoint r with O(M/K + K) live phi
        states. Returns r of shape (M+1, Nx+1, Ny+1)."""
        cfg = self.config
        s = self.solver
        shape = (cfg.Nx + 1, cfg.Ny + 1)
        dtype = self.dtype
        phi0 = (s.default_initial_phi() if initial_phi is None
                else np.asarray(initial_phi, np.float64))
        u = jnp.asarray(u, dtype)
        assert u.shape == (s.M + 1,) + shape
        if phi_Q is None:
            phi_Q = jnp.zeros((s.M + 1,) + shape, dtype)
        else:
            phi_Q = jnp.asarray(phi_Q, dtype)
        if phi_T_target is None:
            phi_T_target = jnp.zeros(shape, dtype)
        else:
            phi_T_target = jnp.asarray(phi_T_target, dtype)
        return self._adj(u, jnp.asarray(phi0, dtype), float(b1), float(b2),
                         phi_Q, phi_T_target)
