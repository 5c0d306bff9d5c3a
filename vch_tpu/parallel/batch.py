"""Batched, mesh-sharded PGD over scenario sweeps.

The scenario batch is the TPU-native unit of work (SURVEY.md section 7):
each member has its own initial condition, targets, and cost weights
(b1, b2, b3, kappa_spar). One PGD iteration for the whole batch is a single
jitted vmapped function — adjoint sweep, gradient, prox, optimistic forward,
and the backtracking search all run data-parallel; per-member line-search
divergence is handled by the vmapped while_loop (runs to the max trial count
across members, others are masked no-ops). With a Mesh, the batch axis is
sharded via NamedSharding so the same program spans chips with XLA inserting
any needed collectives.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vch_tpu.config import (
    ForwardSolverConfig1D,
    ForwardSolverConfig2D,
    OptimizationConfig,
)
from vch_tpu.control.cost import calculate_cost_1d, calculate_cost_2d
from vch_tpu.control.pgd import PGDSettings, optimistic_backtracking_search
from vch_tpu.control.prox import proximal_step
from vch_tpu.control.targets import build_targets_1d, build_targets_2d
from vch_tpu.models.adjoint1d import AdjointSolver1D
from vch_tpu.models.adjoint2d import AdjointSolver2D
from vch_tpu.models.forward1d import ForwardSolver1D
from vch_tpu.models.forward2d import ForwardSolver2D
from vch_tpu.parallel.mesh import batch_sharding, make_mesh


@dataclass
class ScenarioBatch:
    """Per-scenario inputs, each with leading batch axis B (numpy, host)."""

    phi0: np.ndarray        # (B, *space)
    phi_T: np.ndarray       # (B, *space)
    phi_Q: np.ndarray       # (B, M+1, *space)
    b1: np.ndarray          # (B,)
    b2: np.ndarray          # (B,)
    b3: np.ndarray          # (B,)
    kappa_spar: np.ndarray  # (B,)
    u_min: float = -1.0
    u_max: float = 1.0

    @property
    def batch(self) -> int:
        return self.phi0.shape[0]


def sweep_1d(fwd_config: ForwardSolverConfig1D,
             opt_config: Optional[OptimizationConfig] = None,
             b3_values=None, kappa_values=None,
             choice_t: int = 1, choice_q: int = 1) -> ScenarioBatch:
    """Build a (b3, kappa_spar) sweep batch with the default IC/targets
    (BASELINE.md benchmark config 2)."""
    opt = opt_config or OptimizationConfig()
    solver = ForwardSolver1D(fwd_config)
    phi0 = solver.default_initial_phi()
    t_core = solver.t_hist
    phi_T, phi_Q = build_targets_1d(solver.x, t_core, phi0,
                                    float(fwd_config.Lx), float(fwd_config.T),
                                    choice_t=choice_t, choice_q=choice_q)
    b3s = np.asarray(b3_values if b3_values is not None else [opt.b3])
    kss = np.asarray(kappa_values if kappa_values is not None else [opt.kappa_sparsity])
    g_b3, g_ks = np.meshgrid(b3s, kss, indexing="ij")
    B = g_b3.size
    rep = lambda a: np.broadcast_to(a, (B,) + a.shape).copy()
    return ScenarioBatch(
        phi0=rep(phi0), phi_T=rep(phi_T), phi_Q=rep(phi_Q),
        b1=np.full(B, opt.b1), b2=np.full(B, opt.b2),
        b3=g_b3.ravel(), kappa_spar=g_ks.ravel(),
        u_min=opt.u_min, u_max=opt.u_max)


def sweep_2d(fwd_config: ForwardSolverConfig2D,
             opt_config: Optional[OptimizationConfig] = None,
             b3_values=None, kappa_values=None,
             choice_t: int = 1, choice_q: int = 1) -> ScenarioBatch:
    """2D sweep batch (BASELINE.md benchmark configs 4-5)."""
    opt = opt_config or OptimizationConfig.defaults_2d()
    solver = ForwardSolver2D(fwd_config)
    phi0 = solver.default_initial_phi()
    phi_T, phi_Q = build_targets_2d(solver.x, solver.y, solver.t_hist, phi0,
                                    float(fwd_config.Lx), float(fwd_config.Ly),
                                    float(fwd_config.T),
                                    choice_t=choice_t, choice_q=choice_q)
    b3s = np.asarray(b3_values if b3_values is not None else [opt.b3])
    kss = np.asarray(kappa_values if kappa_values is not None else [opt.kappa_sparsity])
    g_b3, g_ks = np.meshgrid(b3s, kss, indexing="ij")
    B = g_b3.size
    rep = lambda a: np.broadcast_to(a, (B,) + a.shape).copy()
    return ScenarioBatch(
        phi0=rep(phi0), phi_T=rep(phi_T), phi_Q=rep(phi_Q),
        b1=np.full(B, opt.b1), b2=np.full(B, opt.b2),
        b3=g_b3.ravel(), kappa_spar=g_ks.ravel(),
        u_min=opt.u_min, u_max=opt.u_max)


class _BatchedPGDBase:
    """Shared machinery: vmapped jitted iteration + vectorized host loop."""

    def __init__(self, settings: PGDSettings, alpha_max: float,
                 mesh=None, use_mesh: bool = False):
        self.s = settings
        self.alpha_max = alpha_max
        self.mesh = mesh if mesh is not None else (make_mesh() if use_mesh else None)
        vmapped = jax.vmap(self._one_iteration)
        self._iteration_plain = jax.jit(vmapped)
        if self.mesh is not None:
            sh = batch_sharding(self.mesh)
            self._iteration_sharded = jax.jit(
                vmapped, in_shardings=(sh,) * 11, out_shardings=sh)
        else:
            self._iteration_sharded = None

    def _pick_iteration(self, batch: int):
        """Sharded program when the batch divides the mesh, else replicated."""
        if (self._iteration_sharded is not None
                and batch % self.mesh.devices.size == 0):
            return self._iteration_sharded
        return self._iteration_plain

    # subclass provides: _forward(u, phi0), _adjoint(phi, b1, b2, phi_Q, phi_T),
    #                    _cost(phi, u, phi_Q, phi_T, b1, b2, b3, ks)
    def _one_iteration(self, u, phi, cost, alpha, phi0, phi_T, phi_Q,
                       b1, b2, b3, ks):
        r = self._adjoint(phi, b1, b2, phi_Q, phi_T)
        grad = r + b3 * u

        def trial(a):
            u_t = proximal_step(u, grad, a, ks, self.u_min, self.u_max)
            phi_t = self._forward(u_t, phi0)
            c_t = self._cost(phi_t, u_t, phi_Q, phi_T, b1, b2, b3, ks)
            return u_t, phi_t, c_t

        alpha_k, u1, phi1, c1, n_trials, opt_ok = (
            optimistic_backtracking_search(trial, cost, alpha, self.s))
        change = jnp.linalg.norm(u1 - u) / (jnp.linalg.norm(u) + 1e-9)
        return u1, phi1, c1, alpha_k, r, n_trials, change, opt_ok

    def run(self, scenarios: ScenarioBatch, max_iter: int,
            verbose: bool = True, dtype=None):
        """Vectorized PGD over the batch. Per-member plateau detection,
        alpha growth, and convergence freezing mirror the single-scenario
        loop; converged members keep iterating as no-ops (their u no longer
        changes materially), matching masked-fixed-point semantics."""
        dtype = dtype or self.dtype
        B = scenarios.batch
        as_dev = lambda a: jnp.asarray(a, dtype)
        phi0 = as_dev(scenarios.phi0)
        phi_T = as_dev(scenarios.phi_T)
        phi_Q = as_dev(scenarios.phi_Q)
        b1, b2 = as_dev(scenarios.b1), as_dev(scenarios.b2)
        b3, ks = as_dev(scenarios.b3), as_dev(scenarios.kappa_spar)
        self.u_min, self.u_max = scenarios.u_min, scenarios.u_max

        # baseline forward per scenario
        phi = jax.jit(jax.vmap(self._forward))(
            jnp.zeros((B,) + self._control_shape, dtype), phi0)
        u = jnp.zeros_like(phi) if self._control_is_state_shaped else (
            jnp.zeros((B,) + self._control_shape, dtype))
        cost = jax.jit(jax.vmap(self._cost))(phi, u, phi_Q, phi_T, b1, b2, b3, ks)

        alpha = jnp.full((B,), self.alpha_max, dtype)
        cost_hist = [np.asarray(cost)]
        plateau = np.zeros(B, dtype=int)
        converged = np.zeros(B, dtype=bool)
        iters_to_converge = np.full(B, max_iter, dtype=int)
        s = self.s

        iteration = self._pick_iteration(B)
        for k in range(max_iter):
            u, phi, cost, alpha_k, r, n_trials, change, opt_ok = (
                iteration(u, phi, cost, alpha, phi0, phi_T, phi_Q,
                          b1, b2, b3, ks))
            c_np = np.asarray(cost)
            a_np = np.asarray(alpha_k)
            ch_np = np.asarray(change)

            flat = np.abs(c_np - cost_hist[-1]) < s.plateau_tolerance
            plateau = np.where(flat, plateau + 1, 0)
            boost = plateau >= s.plateau_length
            a_next = np.where(boost, a_np * s.plateau_boost, a_np * 1.2)
            plateau = np.where(boost, 0, plateau)
            alpha = jnp.asarray(np.minimum(self.alpha_max, a_next), dtype)

            newly = (~converged) & (ch_np < s.conv_tol) & (k > s.conv_min_iter)
            iters_to_converge[newly] = k + 1
            converged |= newly
            cost_hist.append(c_np)
            if verbose:
                print(f"iter {k+1:4d} | mean cost {c_np.mean():.6f} | "
                      f"converged {converged.sum()}/{B} | "
                      f"max trials {int(np.asarray(n_trials).max())}")
            if converged.all():
                break

        return {
            "u": np.asarray(u), "r": np.asarray(r), "phi": np.asarray(phi),
            "cost_history": np.stack(cost_hist), "alpha": np.asarray(alpha),
            "converged": converged, "iterations": iters_to_converge,
        }


class BatchedProblem1D(_BatchedPGDBase):
    """Batched 1D PGD (reference layout, duplicated t=0 row)."""

    def __init__(self, fwd_config: Optional[ForwardSolverConfig1D] = None,
                 settings: Optional[PGDSettings] = None,
                 alpha_max: float = 100.0, mesh=None, use_mesh: bool = False):
        self.fwd_config = fwd_config or ForwardSolverConfig1D()
        self.solver = ForwardSolver1D(self.fwd_config)
        self.adj = AdjointSolver1D(self.fwd_config)
        self.dtype = self.solver.dtype
        M, n = self.solver.M, self.fwd_config.N + 1
        self._control_shape = (M + 2, n)          # ref layout
        self._control_is_state_shaped = True
        self._dts_ref = jnp.asarray(
            np.diff(np.concatenate([[0.0], self.solver.t_hist])), self.dtype)
        self._x = jnp.asarray(self.solver.x, self.dtype)
        self._t_ref = jnp.asarray(
            np.concatenate([[0.0], self.solver.t_hist]), self.dtype)
        super().__init__(settings or PGDSettings.defaults_1d(), alpha_max,
                         mesh, use_mesh)

    def _forward(self, u_ref, phi0):
        M = self.solver.M
        phi = self.solver._simulate_impl(u_ref[: M + 1], phi0)
        return jnp.concatenate([phi[:1], phi], axis=0)

    def _adjoint(self, phi_ref, b1, b2, phi_Q, phi_T):
        _, _, r = self.adj._run_impl(phi_ref, self._dts_ref, b1, b2,
                                     phi_Q, phi_T)
        return r

    def _cost(self, phi_ref, u_ref, phi_Q, phi_T, b1, b2, b3, ks):
        return calculate_cost_1d(phi_ref, u_ref, phi_Q, phi_T, self._x,
                                 self._t_ref, b1, b2, b3, ks)

    def run(self, scenarios: ScenarioBatch, max_iter: int,
            verbose: bool = True, dtype=None):
        # convert core-layout phi_Q (M+1 rows, as sweep_1d builds) to the
        # reference layout (duplicated t=0 row) this problem operates in
        pq = scenarios.phi_Q
        if pq.shape[1] == self.solver.M + 1:
            scenarios.phi_Q = np.concatenate([pq[:, :1], pq], axis=1)
        return super().run(scenarios, max_iter, verbose=verbose, dtype=dtype)


class BatchedProblem2D(_BatchedPGDBase):
    """Batched 2D PGD (no layout quirk)."""

    def __init__(self, fwd_config: Optional[ForwardSolverConfig2D] = None,
                 settings: Optional[PGDSettings] = None,
                 alpha_max: float = 50.0, mesh=None, use_mesh: bool = False):
        self.fwd_config = fwd_config or ForwardSolverConfig2D()
        self.solver = ForwardSolver2D(self.fwd_config)
        self.adj = AdjointSolver2D(self.fwd_config)
        self.dtype = self.solver.dtype
        M = self.solver.M
        self._control_shape = (M + 1, self.fwd_config.Nx + 1,
                               self.fwd_config.Ny + 1)
        self._control_is_state_shaped = True
        self._dts = jnp.asarray(self.solver.dts, self.dtype)
        self._x = jnp.asarray(self.solver.x, self.dtype)
        self._y = jnp.asarray(self.solver.y, self.dtype)
        self._t = jnp.asarray(self.solver.t_hist, self.dtype)
        super().__init__(settings or PGDSettings.defaults_2d(), alpha_max,
                         mesh, use_mesh)

    def _forward(self, u, phi0):
        return self.solver._simulate_impl(u, phi0)

    def _adjoint(self, phi_hist, b1, b2, phi_Q, phi_T):
        _, _, r = self.adj._run_impl(phi_hist, self._dts, b1, b2, phi_Q, phi_T)
        return r

    def _cost(self, phi_hist, u, phi_Q, phi_T, b1, b2, b3, ks):
        return calculate_cost_2d(phi_hist, u, phi_Q, phi_T, self._x, self._y,
                                 self._t, b1, b2, b3, ks)
