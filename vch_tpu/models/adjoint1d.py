"""1D adjoint (p, q, r) backward solver, TPU-native reverse `lax.scan`.

Implements the reference's optimize-then-discretize adjoint scheme
(ref: backward_solver.py:48-125) exactly — including its quirks, which the
rebuild consciously reproduces for gradient parity (SURVEY.md section 5):

  - operators A/B use L^2 WITHOUT a kappa factor:
      A(phi_n)   = I - tau L + (dt/2) L^2 - (dt/2) diag(f''(phi_n)) L
      B(phi_np1) = I - tau L - (dt/2) L^2 + (dt/2) diag(f''(phi_np1)) L
  - terminal solve (I - tau L) p_T = b2 (phi_T - phi_Omega); q = -L p; r_T = 0
  - r backward CN recursion r_n = [(g-dt/2) r_{n+1} + (dt/2)(q_n+q_{n+1})]/(g+dt/2)
  - steps with dt <= 0 are skipped leaving p,q,r at ZERO (this is what the
    reference does for the duplicated t=0 history row: `continue` at :110
    leaves the allocated zeros in place).

Unlike the reference (which binds tau/gamma/c1/c2/kappa from a DEFAULT config
at import time, backward_solver.py:29-33), this solver threads the runtime
config — identical results for default physics, correct results otherwise.

Each step is one dense (N+1) linear solve; under vmap over scenarios these
become batched LUs on the MXU.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vch_tpu.config import ForwardSolverConfig1D
from vch_tpu.ops.laplacian import laplacian_matrix_neumann
from vch_tpu.ops.potential import fpp_log


class AdjointSolver1D:
    """Jit-compiled backward sweep producing (p, q, r) on the forward grid."""

    def __init__(self, config: Optional[ForwardSolverConfig1D] = None):
        self.config = config or ForwardSolverConfig1D()
        cfg = self.config
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        self.h = cfg.Lx / cfg.N
        self._L_np = laplacian_matrix_neumann(cfg.N, self.h)
        self._run = jax.jit(self._run_impl)

    def _run_impl(self, phi_hist, dts, b1, b2, phi_Q, phi_T_target):
        cfg = self.config
        dtype = self.dtype
        L = jnp.asarray(self._L_np, dtype)
        L2 = L @ L
        I = jnp.eye(L.shape[0], dtype=dtype)
        tau, gamma, c1, c2 = cfg.tau, cfg.gamma, cfg.c1, cfg.c2

        # Terminal conditions
        rhs_T = b2 * (phi_hist[-1] - phi_T_target)
        p_T = jnp.linalg.solve(I - tau * L, rhs_T)
        q_T = -(p_T @ L.T)
        r_T = jnp.zeros_like(p_T)

        src_all = phi_hist - phi_Q

        def step(carry, inp):
            p_next, q_next, r_next = carry
            phi_n, phi_np1, src_n, src_np1, dt = inp

            fpp_n = fpp_log(phi_n, c1, c2)
            fpp_np1 = fpp_log(phi_np1, c1, c2)
            # A = I - tau L + (dt/2) L^2 - (dt/2) diag(fpp_n) L
            A = I - tau * L + 0.5 * dt * L2 - 0.5 * dt * (fpp_n[:, None] * L)
            # B p = (I - tau L - (dt/2) L^2 + (dt/2) diag(fpp_np1) L) p
            Bp = (p_next - tau * (p_next @ L.T) - 0.5 * dt * (p_next @ L2.T)
                  + 0.5 * dt * fpp_np1 * (p_next @ L.T))
            src = 0.5 * dt * b1 * (src_n + src_np1)
            p_n = jnp.linalg.solve(A, Bp + src)
            q_n = -(p_n @ L.T)
            denom = gamma + 0.5 * dt
            r_n = ((gamma - 0.5 * dt) / denom * r_next
                   + 0.5 * dt / denom * (q_n + q_next))

            # dt <= 0 (duplicated history rows): leave zeros, keep carry frozen
            skip = dt <= 0
            zero = jnp.zeros_like(p_n)
            out = (jnp.where(skip, zero, p_n), jnp.where(skip, zero, q_n),
                   jnp.where(skip, zero, r_n))
            new_carry = (jnp.where(skip, p_next, p_n),
                         jnp.where(skip, q_next, q_n),
                         jnp.where(skip, r_next, r_n))
            return new_carry, out

        inputs = (phi_hist[:-1], phi_hist[1:], src_all[:-1], src_all[1:], dts)
        _, (p_rev, q_rev, r_rev) = jax.lax.scan(
            step, (p_T, q_T, r_T), inputs, reverse=True)

        p = jnp.concatenate([p_rev, p_T[None]], axis=0)
        q = jnp.concatenate([q_rev, q_T[None]], axis=0)
        r = jnp.concatenate([r_rev, r_T[None]], axis=0)
        return p, q, r

    def run(self, phi_hist, t_hist, b1: float, b2: float,
            phi_Q: Optional[np.ndarray] = None,
            phi_T_target: Optional[np.ndarray] = None):
        """Solve the adjoint system backward over the given trajectory.

        Accepts histories in either core layout (M+1 rows) or reference
        layout (duplicated t=0 row); output matches the input layout.
        """
        dtype = self.dtype
        phi_hist = jnp.asarray(phi_hist, dtype)
        t = np.asarray(t_hist, dtype=np.float64)
        dts = jnp.asarray(np.diff(t), dtype)
        if phi_Q is None:
            phi_Q = jnp.zeros_like(phi_hist)
        else:
            phi_Q = jnp.asarray(phi_Q, dtype)
        if phi_T_target is None:
            phi_T_target = jnp.zeros(phi_hist.shape[-1], dtype)
        else:
            phi_T_target = jnp.asarray(phi_T_target, dtype)
        return self._run(phi_hist, dts, float(b1), float(b2), phi_Q,
                         phi_T_target)
