"""Spatial (grid) sharding: the 2D solver under shard_map with halo exchange.

For very large grids (256x256+, BASELINE.md config 5) the scenario batch
alone may not saturate a slice; the grid's x-axis is sharded across chips.
Design (SURVEY.md section 7 stretch goal, completed round 2):

  - the 5-point stencil Laplacian exchanges one halo row per neighbor per
    apply with `lax.ppermute` (ICI neighbor traffic, no all-to-all); global
    Neumann boundaries keep their mirrored-ghost form automatically — the
    first/last shard substitutes its own second/second-to-last row for the
    missing halo, which is exactly the reflection stencil (ops/laplacian.py);
  - the cosine-basis preconditioner's x-transforms contract over the SHARDED
    axis: each shard multiplies its row block of V^-1/V and the partial
    products are combined with `lax.psum_scatter` (reduce-scatter, the
    bandwidth-optimal collective) so the result comes back row-sharded;
  - every scalar reduction in the Newton loop (residual norms, step-ceiling
    minima, the mean-diagonal dbar, mass-correction sums, Krylov inner
    products) becomes a `psum`/`pmin` over the mesh axis — the Krylov
    recurrence itself is unchanged (ops/linsolve.bicgstab with a distributed
    dot_fn).

The whole time marcher (scan over steps, Newton while_loop, Armijo, mass
correction) runs INSIDE one shard_map, so a forward solve is one compiled
SPMD program per mesh. Parity-gated against the unsharded ForwardSolver2D
on the 8-virtual-device CPU mesh (tests/test_spatial_sharding.py).

Replaces the role of scipy spsolve on the monolithic grid
(ref: Forward2_solver.py:370) at scales where one chip's HBM cannot hold
the working set.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
from vch_tpu.models.forward1d import solve_w
from vch_tpu.models.timegrid import build_dt_schedule, t_history
from vch_tpu.ops.grids import trapz_weights
from vch_tpu.ops.laplacian import neumann_eigendecomposition
from vch_tpu.ops.linsolve import bicgstab
from vch_tpu.ops.potential import f_prime, regularized_log


def _halo_laplacian_local(v, hx, hy, axis_name):
    """Per-shard 2D Laplacian with ppermute halo exchange along axis 0."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    up_halo = lax.ppermute(v[-1:], axis_name,
                           [(i, i + 1) for i in range(n - 1)])
    down_halo = lax.ppermute(v[:1], axis_name,
                             [(i, i - 1) for i in range(1, n)])
    # global boundaries: mirrored ghost row (Neumann)
    up = jnp.where(idx == 0, v[1:2], up_halo)
    down = jnp.where(idx == n - 1, v[-2:-1], down_halo)

    pad = jnp.concatenate([up, v, down], axis=0)
    lap_x = (pad[:-2] - 2.0 * v + pad[2:]) / (hx * hx)

    pady = jnp.concatenate([v[:, 1:2], v, v[:, -2:-1]], axis=1)
    lap_y = (pady[:, :-2] - 2.0 * v + pady[:, 2:]) / (hy * hy)
    return lap_x + lap_y


def sharded_laplacian_2d(mesh: Mesh, axis_name: str, hx: float, hy: float):
    """Standalone jitted Laplacian whose x-axis is sharded over `axis_name`
    (kept as the minimal parity probe; the full solver is below)."""
    fn = jax.shard_map(
        partial(_halo_laplacian_local, hx=hx, hy=hy, axis_name=axis_name),
        mesh=mesh, in_specs=P(axis_name, None), out_specs=P(axis_name, None))
    sharding = NamedSharding(mesh, P(axis_name, None))

    @jax.jit
    def apply(v):
        v = jax.device_put(v, sharding)
        return fn(v)

    return apply


class GridShardedForward2D:
    """2D forward marcher + Newton solver sharded over the grid's x-axis.

    Semantics match models/forward2d.ForwardSolver2D step-for-step (CN +
    monolithic Newton via the Schur/spectral solve, step ceiling, Armijo
    with best-trial fallback, interior-only mass correction); only the
    *schedule* is distributed. Requires (Nx+1) divisible by the mesh axis
    size and >= 2 rows per shard (halo width 1).
    """

    def __init__(self, config: Optional[ForwardSolverConfig2D] = None,
                 mesh: Optional[Mesh] = None, axis: str = "gx"):
        self.config = config or ForwardSolverConfig2D()
        cfg = self.config
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (axis,))
        self.mesh, self.axis = mesh, axis
        n_sh = mesh.devices.size
        rows = cfg.Nx + 1
        assert rows % n_sh == 0, (
            f"Nx+1={rows} must be divisible by mesh size {n_sh}")
        assert rows // n_sh >= 2, "need >= 2 rows per shard (halo width 1)"
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        self.hx, self.hy = cfg.Lx / cfg.Nx, cfg.Ly / cfg.Ny
        self.dts = build_dt_schedule(cfg.T, cfg.dt_initial)
        self.t_hist = t_history(self.dts, cfg.T)
        self.M = len(self.dts)

        # host-side spectral constants (float64, cast at use)
        lamx, Vx, Vx_inv = neumann_eigendecomposition(cfg.Nx, self.hx)
        lamy, Vy, Vy_inv = neumann_eigendecomposition(cfg.Ny, self.hy)
        d = self.dtype
        # x-matrices enter transposed so the SHARDED axis is their leading
        # axis: VxiT[r] = Vx_inv[:, r], VxT[r] = Vx[:, r]
        self._VxiT = jnp.asarray(Vx_inv.T, d)
        self._VxT = jnp.asarray(Vx.T, d)
        self._lamx = jnp.asarray(lamx, d)
        self._Vy = jnp.asarray(Vy, d)
        self._Vy_inv = jnp.asarray(Vy_inv, d)
        self._lamy = jnp.asarray(lamy, d)
        wx = trapz_weights(cfg.Nx + 1) * self.hx
        wy = trapz_weights(cfg.Ny + 1) * self.hy
        self._wts = jnp.asarray(np.outer(wx, wy), d)

        self.krylov_tol = (cfg.krylov_tol if self.dtype == jnp.float64
                           else max(cfg.krylov_tol, 1e-6))
        self._rtol = 0.0 if self.dtype == jnp.float64 else cfg.newton_rtol
        self._stagnation = self.dtype != jnp.float64

        sh_x = P(axis, None)          # row-sharded fields / x-matrices
        sh_t = P(None, axis, None)    # time-major control/history
        rep = P()
        self._simulate = jax.jit(jax.shard_map(
            self._march_local, mesh=mesh,
            in_specs=(sh_t, sh_x, sh_x, sh_x, P(axis), sh_x, rep, rep,
                      rep),
            out_specs=sh_t,
            check_vma=False))

    # ------------------------------------------------------------------
    def _march_local(self, u_l, phi0_l, VxiT_l, VxT_l, lamx_l, wts_l,
                     Vy, Vy_inv, lamy):
        """Per-shard marcher: u_l (M+1, rows_l, Ny+1); returns local rows of
        the full history (M+1, rows_l, Ny+1)."""
        cfg = self.config
        ax = self.axis
        dtype = self.dtype
        tau, c1, c2 = cfg.tau, cfg.c1, cfg.c2
        gamma, kappa = cfg.gamma, cfg.kappa
        lo, hi = -1.0 + DELTA_SEP, 1.0 - DELTA_SEP
        dts = jnp.asarray(self.dts, dtype)

        psum = lambda s: lax.psum(s, ax)
        pmin = lambda s: lax.pmin(s, ax)
        dot = lambda a, b: psum(jnp.sum(a * b))
        lap = partial(_halo_laplacian_local, hx=self.hx, hy=self.hy,
                      axis_name=ax)
        Ntot = (cfg.Nx + 1) * (cfg.Ny + 1)

        # distributed cosine transforms: contract over the sharded x-axis
        # with reduce-scatter (each shard keeps its row block)
        def to_spec(v_l):
            part = jnp.einsum("rk,rm->km", VxiT_l, v_l)
            vhat_l = lax.psum_scatter(part, ax, scatter_dimension=0,
                                      tiled=True)
            return vhat_l @ Vy_inv.T

        def from_spec(vh_l):
            part = jnp.einsum("rk,rm->km", VxT_l, vh_l)
            v_l = lax.psum_scatter(part, ax, scatter_dimension=0, tiled=True)
            return v_l @ Vy.T

        lam_l = lamx_l[:, None] + lamy[None, :]

        def initialize_mu(phi, w):
            return (-kappa * lap(phi)
                    + f_prime(phi, c1, c2, DELTA_SEP) - w)

        def resid(phi, mu, phi_old, mu_old, w_new, w_old, dt):
            lap_avg = 0.5 * lap(phi + phi_old)
            f_cvx = c1 * regularized_log(phi, DELTA_SEP)
            f_ccv = -2.0 * c2 * phi_old
            Rphi = (tau * (phi - phi_old) / dt - kappa * lap_avg + f_cvx
                    + f_ccv - 0.5 * (mu + mu_old) - 0.5 * (w_new + w_old))
            Rmu = (phi - phi_old) / dt - 0.5 * lap(mu + mu_old)
            norm = jnp.sqrt(dot(Rphi, Rphi) + dot(Rmu, Rmu))
            return norm, Rphi, Rmu

        def schur_solve(phi, Rphi, Rmu, dt):
            """Distributed spectral-preconditioned BiCGStab Schur solve
            (ops/linsolve.newton_schur_solve_2d with collective reductions)."""
            phi_sq = jnp.clip(phi * phi, 0.0, 1.0 - DELTA_SEP * DELTA_SEP)
            d = 2.0 * c1 / (1.0 - phi_sq)
            dbar = psum(jnp.sum(d)) / Ntot

            def apply_S(v):
                u = (tau / dt + d) * v - 0.5 * kappa * lap(v)
                return (1.0 / dt) * v - lap(u)

            denom = ((1.0 / dt) + 0.5 * kappa * lam_l ** 2
                     - (tau / dt + dbar) * lam_l)

            def apply_M(v):
                return from_spec(to_spec(v) / denom)

            rhs = lap(Rphi) - Rmu
            dphi = bicgstab(apply_S, rhs, apply_M, tol=self.krylov_tol,
                            max_iter=cfg.krylov_max_iter, dot_fn=dot)
            Kpp_dphi = -(0.5 * kappa) * lap(dphi) + (tau / dt + d) * dphi
            dmu = 2.0 * (Kpp_dphi + Rphi)
            return dphi, dmu

        def step_ceiling(phi, dphi):
            big = jnp.asarray(jnp.inf, dtype)
            rp = jnp.where(dphi > 0, (hi - phi) / dphi, big)
            rn = jnp.where(dphi < 0, (lo - phi) / dphi, big)
            amax = jnp.minimum(jnp.asarray(2.0, dtype),
                               jnp.minimum(0.9 * pmin(jnp.min(rp)),
                                           0.9 * pmin(jnp.min(rn))))
            bad = ~jnp.isfinite(amax) | (amax <= 0)
            amax = jnp.where(bad, 1.0, amax)
            return jnp.minimum(1.0, amax)

        def newton(phi_old, mu_old, w_old, w_new, dt, mu_init):
            res = lambda p, m: resid(p, m, phi_old, mu_old, w_new, w_old, dt)

            def armijo(phi, mu, dphi, dmu, norm_R):
                eta = 1e-4
                alpha0 = step_ceiling(phi, dphi)

                def cond(c):
                    return (~c[6]) & (c[7] < 12)

                def body(c):
                    alpha, phi_a, mu_a, bn, bp, bm, _, j = c
                    phi_t = phi + alpha * dphi
                    mu_t = mu + alpha * dmu
                    norm_t, _, _ = res(phi_t, mu_t)
                    better = norm_t < bn
                    bn = jnp.where(better, norm_t, bn)
                    bp = jnp.where(better, phi_t, bp)
                    bm = jnp.where(better, mu_t, bm)
                    accept = norm_t <= (1.0 - eta * alpha) * norm_R
                    phi_a = jnp.where(accept, phi_t, phi_a)
                    mu_a = jnp.where(accept, mu_t, mu_a)
                    alpha = jnp.where(accept, alpha, alpha * 0.5)
                    return (alpha, phi_a, mu_a, bn, bp, bm, accept, j + 1)

                big = jnp.asarray(jnp.inf, dtype)
                init = (alpha0, phi, mu, big, phi, mu, jnp.asarray(False),
                        jnp.asarray(0, jnp.int32))
                (_, phi_a, mu_a, bn, bp, bm, acc, _) = lax.while_loop(
                    cond, body, init)
                use_best = (~acc) & (bn < norm_R)
                phi_out = jnp.where(acc, phi_a, jnp.where(use_best, bp, phi))
                mu_out = jnp.where(acc, mu_a, jnp.where(use_best, bm, mu))
                return phi_out, mu_out

            def cond(carry):
                return (~carry[2]) & (carry[3] < cfg.newton_max_iter)

            big = jnp.asarray(jnp.inf, dtype)

            def body(carry):
                phi, mu, done, k, norm0, prev = carry
                norm_R, Rphi, Rmu = res(phi, mu)
                norm0 = jnp.where(k == 0, norm_R, norm0)
                conv = norm_R < cfg.newton_tol
                if self._rtol > 0:
                    conv = conv | (norm_R < self._rtol * norm0)
                if self._stagnation:
                    conv = conv | ((k > 0) & (norm_R >= prev))

                def take(args):
                    phi, mu = args
                    dphi, dmu = schur_solve(phi, Rphi, Rmu, dt)
                    return armijo(phi, mu, dphi, dmu, norm_R)

                phi_n, mu_n = lax.cond(conv, lambda a: a, take, (phi, mu))
                return (phi_n, mu_n, conv, k + 1, norm0, norm_R)

            phi, mu, _, _, _, _ = lax.while_loop(
                cond, body, (phi_old, mu_init, jnp.asarray(False),
                             jnp.asarray(0, jnp.int32), big, big))
            return phi, mu

        # -- marcher -----------------------------------------------------
        w0 = jnp.zeros_like(phi0_l)
        mu0 = initialize_mu(phi0_l, w0)
        m0 = psum(jnp.sum(wts_l * phi0_l))

        def step(carry, inp):
            phi, mu, w = carry
            u_n, u_np1, dt = inp
            w_new = solve_w(w, dt, gamma, u_n, u_np1)
            mu_init = initialize_mu(phi, w_new)
            phi_new, mu_new = newton(phi, mu, w, w_new, dt, mu_init)
            phi_c = jnp.clip(phi_new, lo, hi)
            mass_error = psum(jnp.sum(wts_l * phi_c)) - m0
            interior = jnp.abs(phi_c) < (1.0 - DELTA_SEP - 5e-3)
            Wint = psum(jnp.sum(jnp.where(interior, wts_l, 0.0)))
            corrected = jnp.where(interior, phi_c - mass_error / Wint, phi_c)
            fallback = jnp.clip(phi_c - mass_error / (cfg.Lx * cfg.Ly),
                                lo, hi)
            phi_c = jnp.where(jnp.abs(mass_error) > 1e-16,
                              jnp.where(Wint > 0, corrected, fallback),
                              phi_c)
            return (phi_c, mu_new, w_new), phi_c

        inputs = (u_l[:-1], u_l[1:], dts)
        (_, _, _), phis = lax.scan(step, (phi0_l, mu0, w0), inputs)
        return jnp.concatenate([phi0_l[None], phis], axis=0)

    # ------------------------------------------------------------------
    def simulate(self, control=None, initial_phi=None):
        """Run the grid-sharded forward simulation.

        Returns (phi_hist, (x, y), t_hist) with phi_hist row-sharded across
        the mesh (a global jax.Array — np.asarray gathers it).
        """
        cfg = self.config
        shape = (cfg.Nx + 1, cfg.Ny + 1)
        d = self.dtype
        if initial_phi is None:
            from vch_tpu.ops.potential import init_phi_random_2d
            initial_phi = init_phi_random_2d(cfg.Nx, cfg.Ny, DELTA_SEP,
                                             amp=0.1, seed=42)
        phi0 = jnp.asarray(np.asarray(initial_phi), d)
        u = (jnp.zeros((self.M + 1,) + shape, d) if control is None
             else jnp.asarray(control, d))
        assert u.shape == (self.M + 1,) + shape
        phi_hist = self._simulate(u, phi0, self._VxiT, self._VxT, self._lamx,
                                  self._wts, self._Vy, self._Vy_inv,
                                  self._lamy)
        x = np.linspace(0.0, cfg.Lx, cfg.Nx + 1)
        y = np.linspace(0.0, cfg.Ly, cfg.Ny + 1)
        return phi_hist, (x, y), self.t_hist
