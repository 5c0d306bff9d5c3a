"""Fully-fused 2D forward march: the whole CN time loop in ONE Pallas kernel.

Re-architecture of the batched forward solve (models/forward2d.py
`_simulate_body`, itself the TPU rebuild of the reference marcher
Forward2_solver.py:489-608 and Newton :323-427): instead of a vmapped
`lax.scan` whose Newton/Armijo `while_loop`s run in LOCKSTEP across the
scenario batch (every member executes the max member's trip count, and
converged members still burn full Schur solves because `lax.cond` under
vmap evaluates both branches), the kernel walks a (member, time-step) grid
sequentially on-core:

  grid = (B, M), both dims "arbitrary" (sequential);
  (phi, mu, w) live in VMEM scratch across the member's M steps;
  each grid cell runs that member's OWN Newton `while_loop` (with the
  nested Armijo `while_loop` and the fixed-trip spectral-basis BiCGStab
  Schur solve of ops/pallas_kernels.py) to ITS OWN convergence;
  the only HBM traffic is reading two control frames and writing one
  phi frame (~17 KB each at 64x64) per step.

Per-member early exit replaces lockstep masking, per-step kernel launches
and HBM round-trips between the ~30 XLA ops of a Newton iteration
disappear, and every matmul runs back-to-back on the MXU from VMEM.

Semantics match `newton_2d` + the marcher's clip / interior mass
correction / non-finite sanitizer exactly (same tolerances, same
best-trial Armijo fallback, same fixed Krylov trip count); the Krylov
residual lives in the spectral metric like the production
`bicgstab_schur_spectral_pallas` kernel. Parity is gated in
tests/test_pallas_march.py against the scan-based solver.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from vch_tpu.ops.pallas_kernels import _PREC


def _make_mm(dt_, mode):
    """Matmul builder for the fused kernels: 'bf16x3' emulates the
    validated 'high' f32 precision with three INDEPENDENT single-pass
    bf16 dots on the (hi, lo) split — Mosaic lowers only DEFAULT (1-pass
    bf16) and HIGHEST (6-pass) dot precisions, and the three split dots
    pipeline on the MXU where HIGHEST's 6 passes serialize. Any other
    mode compiles the package-default full-precision dot."""
    if mode != "bf16x3":
        def mm(a, c):
            return jnp.dot(a, c, preferred_element_type=dt_,
                           precision=_PREC)
        return mm

    one_pass = jax.lax.Precision.DEFAULT   # each split dot pinned to 1 pass
    # (the package-global default precision is 'highest', which a bf16
    # dot cannot lower — "Bad lhs type")

    def mm(a, c):
        a16 = a.astype(jnp.bfloat16)
        c16 = c.astype(jnp.bfloat16)
        ar = (a - a16.astype(dt_)).astype(jnp.bfloat16)
        cr = (c - c16.astype(dt_)).astype(jnp.bfloat16)
        d0 = jnp.dot(a16, c16, preferred_element_type=dt_,
                     precision=one_pass)
        d1 = jnp.dot(ar, c16, preferred_element_type=dt_,
                     precision=one_pass)
        d2 = jnp.dot(a16, cr, preferred_element_type=dt_,
                     precision=one_pass)
        return d0 + (d1 + d2)
    return mm


def _march_kernel_factory(M: int, tau: float, c1: float, c2: float,
                          kappa: float, gamma: float, delta_sep: float,
                          area: float, newton_tol: float, newton_rtol: float,
                          newton_max_iter: int, n_trips: int,
                          stagnation_exit: bool, eps_mach: float,
                          solve_prec: str = "highest",
                          fwd_mm: str = "highest",
                          segment: bool = False):
    """Build the fused-march kernel with the config constants baked in.

    All physics/tolerance scalars are per-solver compile-time constants
    (they come from the pydantic config); only dt varies per step and is
    read from the SMEM schedule.

    solve_prec: matmul precision INSIDE the Krylov solve only ('highest'
    or 'default' = raw bf16 passes). Residuals, Laplacians, and the Armijo
    trials always run at HIGHEST — they gate solution quality, so an
    imprecise solve direction can only cost extra Newton iterations
    (observable in the returned counters), never accuracy.
    """
    log_eps = max(1e-8, 0.5 * delta_sep)
    lo, hi = -1.0 + delta_sep, 1.0 - delta_sep
    dsep2 = 1.0 - delta_sep * delta_sep
    sprec = (jax.lax.Precision.DEFAULT if solve_prec == "default"
             else jax.lax.Precision.HIGHEST)

    def kernel(*refs):
        # segment=True adds (mu0, w0, m0) carry INPUTS and (phi_f, mu_f,
        # w_f) final-state OUTPUTS so the lowmem pipeline can chain
        # K-step fused marches across checkpoints (models/lowmem.py);
        # segment=False initializes (mu, w, m0) from phi0 internally.
        if segment:
            (dts_ref, phi0_ref, mu0_ref, w0_ref, m00_ref,
             u_n_ref, u_np1_ref, Lx_ref, LyT_ref,
             Vxi_ref, VyiT_ref, Vx_ref, VyT_ref, lam_ref, wts_ref,
             hist_ref, ns_ref, bad_ref, phif_ref, muf_ref, wf_ref,
             phi_s, mu_s, w_s, m0_s) = refs
        else:
            (dts_ref, phi0_ref, u_n_ref, u_np1_ref, Lx_ref, LyT_ref,
             Vxi_ref, VyiT_ref, Vx_ref, VyT_ref, lam_ref, wts_ref,
             hist_ref, ns_ref, bad_ref,
             phi_s, mu_s, w_s, m0_s) = refs
        b = pl.program_id(0)
        m = pl.program_id(1)
        Lx = Lx_ref[:]
        LyT = LyT_ref[:]
        Vxi = Vxi_ref[:]
        VyiT = VyiT_ref[:]
        Vx = Vx_ref[:]
        VyT = VyT_ref[:]
        lam = lam_ref[:]
        wts = wts_ref[:]
        dt_ = lam.dtype
        mm = _make_mm(dt_, fwd_mm)

        def to_s(v):
            return mm(mm(Vxi, v), VyiT)

        def from_s(vh):
            return mm(mm(Vx, vh), VyT)

        def lap(v):
            # dense-stencil apply (2 matmuls), identical to the scan path's
            # apply_laplacian_2d — NOT the spectral round trip (4 matmuls +
            # extra f32 roundoff through the eigenbasis)
            return mm(Lx, v) + mm(v, LyT)

        def f_log(phi):
            ph = jnp.clip(phi, -1.0 + log_eps, 1.0 - log_eps)
            return jnp.log((1.0 + ph) / (1.0 - ph))

        @pl.when(m == 0)
        def _():
            phi0 = phi0_ref[0]
            phi_s[0] = phi0
            if segment:
                mu_s[0] = mu0_ref[0]
                w_s[0] = w0_ref[0]
                m0_s[0] = m00_ref[b]
            else:
                w_s[0] = jnp.zeros_like(phi0)
                # mu0 = -kappa lap(phi0) + f'(phi0) - w0
                mu_s[0] = (-kappa * lap(phi0)
                           + c1 * f_log(phi0) - 2.0 * c2 * phi0)
                m0_s[0] = jnp.sum(wts * phi0)
            ns_ref[b, 0] = jnp.int32(0)
            bad_ref[b, 0] = jnp.int32(-1)

        phi_old = phi_s[0]
        mu_old = mu_s[0]
        w_old = w_s[0]
        m0 = m0_s[0]
        dt = dts_ref[m]
        inv_dt = 1.0 / dt
        tau_dt = tau * inv_dt

        gamma_dt = gamma * inv_dt
        w_new = (((gamma_dt - 0.5) * w_old
                  + 0.5 * (u_np1_ref[0, 0] + u_n_ref[0, 0]))
                 / (gamma_dt + 0.5))
        lap_mu_old = lap(mu_old)
        lap_phi_old = lap(phi_old)
        mu_init = (-kappa * lap_phi_old
                   + c1 * f_log(phi_old) - 2.0 * c2 * phi_old - w_new)
        f_ccv = -2.0 * c2 * phi_old
        w_avg = 0.5 * (w_new + w_old)

        def resid(phi, mu):
            """CN residuals vs the step's frozen (phi_old, mu_old) level."""
            lap_mu = lap(mu)
            lap_phi = lap(phi)
            Rmu = (phi - phi_old) * inv_dt - 0.5 * (lap_mu + lap_mu_old)
            Rphi = (tau * inv_dt * (phi - phi_old)
                    - 0.5 * kappa * (lap_phi + lap_phi_old)
                    + c1 * f_log(phi) + f_ccv
                    - 0.5 * (mu + mu_old) - w_avg)
            norm = jnp.sqrt(jnp.sum(Rphi * Rphi) + jnp.sum(Rmu * Rmu))
            return norm, Rphi, Rmu

        def schur_solve(phi, Rphi, Rmu):
            """Fixed-trip spectral-basis BiCGStab on the Schur system
            (same Krylov path as bicgstab_schur_spectral_pallas)."""
            phi_sq = jnp.clip(phi * phi, 0.0, dsep2)
            d = 2.0 * c1 / (1.0 - phi_sq)
            dbar = jnp.mean(d)
            poly = inv_dt - tau_dt * lam + 0.5 * kappa * lam * lam
            denom = poly - dbar * lam

            if solve_prec == "default":
                def mm_s(a, c):
                    return jnp.dot(a, c, preferred_element_type=dt_,
                                   precision=sprec)
            elif solve_prec == "bf16x3":
                mm_s = _make_mm(dt_, "bf16x3")
            else:
                mm_s = mm     # inherit the kernel-wide (highest | bf16x3)

            def apply_S(yh):
                return poly * yh - lam * mm_s(mm_s(Vxi, d * mm_s(
                    mm_s(Vx, yh), VyT)), VyiT)

            bvec = to_s(lap(Rphi) - Rmu)
            dot = lambda a, c: jnp.sum(a * c)
            eps_div = jnp.asarray(1e-30, dt_)
            one = jnp.asarray(1.0, dt_)
            r0 = bvec
            floor2 = ((50.0 * eps_mach) ** 2
                      * jnp.maximum(dot(bvec, bvec), eps_div))

            def body(_, carry):
                x, r, p, v, rho, alpha, omega, best_x, best_r2 = carry
                active = dot(r, r) > floor2
                rho_new = dot(r0, r)
                beta = (rho_new / (rho + eps_div)) * (alpha / (omega + eps_div))
                p_n = r + beta * (p - omega * v)
                phat = p_n / denom
                v_n = apply_S(phat)
                alpha_n = rho_new / (dot(r0, v_n) + eps_div)
                s = r - alpha_n * v_n
                shat = s / denom
                t = apply_S(shat)
                omega_n = dot(t, s) / (dot(t, t) + eps_div)
                x_n = x + alpha_n * phat + omega_n * shat
                r_n = s - omega_n * t
                r2_n = dot(r_n, r_n)
                ok = active & jnp.isfinite(r2_n)
                sel = lambda a, bb: jnp.where(ok, a, bb)
                better = ok & (r2_n < best_r2)
                best_x = jnp.where(better, x_n, best_x)
                best_r2 = jnp.where(better, r2_n, best_r2)
                return (sel(x_n, x), sel(r_n, r), sel(p_n, p), sel(v_n, v),
                        jnp.where(ok, rho_new, rho),
                        jnp.where(ok, alpha_n, alpha),
                        jnp.where(ok, omega_n, omega), best_x, best_r2)

            z = jnp.zeros_like(bvec)
            init = (z, r0, z, z, one, one, one, z, dot(r0, r0))
            out = jax.lax.fori_loop(0, n_trips, body, init)
            dphi = from_s(out[7])
            Kpp_dphi = -(0.5 * kappa) * lap(dphi) + (tau_dt + d) * dphi
            dmu = 2.0 * (Kpp_dphi + Rphi)
            return dphi, dmu

        def step_ceiling(phi, dphi):
            big = jnp.asarray(jnp.inf, dt_)
            ratio_pos = jnp.where(dphi > 0, (hi - phi) / dphi, big)
            ratio_neg = jnp.where(dphi < 0, (lo - phi) / dphi, big)
            amax = jnp.minimum(jnp.asarray(2.0, dt_),
                               jnp.minimum(0.9 * jnp.min(ratio_pos),
                                           0.9 * jnp.min(ratio_neg)))
            bad_a = ~jnp.isfinite(amax) | (amax <= 0)
            amax = jnp.where(bad_a, 1.0, amax)
            return jnp.minimum(1.0, amax)

        def armijo(phi, mu, dphi, dmu, norm_R, Rphi_R, Rmu_R):
            """Backtracking on the residual norm. Besides the ref semantics
            (accept / best-trial fallback / unchanged), every exit path also
            returns the RESIDUAL of the returned iterate — already computed
            inside the trial evaluations — so the next Newton iteration
            skips its residual recompute (4 matmuls + 2 log fields)."""
            eta = 1e-4
            alpha0 = step_ceiling(phi, dphi)

            def cond_a(c):
                return (~c[-2]) & (c[-1] < 12)

            def body_a(c):
                (alpha, phi_a, mu_a, aN, aRp, aRm,
                 best_norm, best_phi, best_mu, bRp, bRm, _, j) = c
                phi_t = phi + alpha * dphi
                mu_t = mu + alpha * dmu
                norm_t, Rp_t, Rm_t = resid(phi_t, mu_t)
                better = norm_t < best_norm
                sb = lambda a, bb: jnp.where(better, a, bb)
                best_norm = sb(norm_t, best_norm)
                best_phi = sb(phi_t, best_phi)
                best_mu = sb(mu_t, best_mu)
                bRp = sb(Rp_t, bRp)
                bRm = sb(Rm_t, bRm)
                accept = norm_t <= (1.0 - eta * alpha) * norm_R
                sa = lambda a, bb: jnp.where(accept, a, bb)
                phi_a = sa(phi_t, phi_a)
                mu_a = sa(mu_t, mu_a)
                aN = sa(norm_t, aN)
                aRp = sa(Rp_t, aRp)
                aRm = sa(Rm_t, aRm)
                alpha = jnp.where(accept, alpha, alpha * 0.5)
                return (alpha, phi_a, mu_a, aN, aRp, aRm,
                        best_norm, best_phi, best_mu, bRp, bRm, accept, j + 1)

            big = jnp.asarray(jnp.inf, dt_)
            init = (alpha0, phi, mu, norm_R, Rphi_R, Rmu_R,
                    big, phi, mu, Rphi_R, Rmu_R, jnp.bool_(False),
                    jnp.int32(0))
            (_, phi_a, mu_a, aN, aRp, aRm, best_norm, best_phi, best_mu,
             bRp, bRm, accepted, _) = jax.lax.while_loop(cond_a, body_a, init)
            use_best = (~accepted) & (best_norm < norm_R)
            pick = lambda a, bb, cc: jnp.where(accepted, a,
                                               jnp.where(use_best, bb, cc))
            return (pick(phi_a, best_phi, phi), pick(mu_a, best_mu, mu),
                    pick(aN, best_norm, norm_R), pick(aRp, bRp, Rphi_R),
                    pick(aRm, bRm, Rmu_R))

        # ---- Newton while_loop (this member's own trip count) ----
        def cond_n(c):
            return (~c[3]) & (c[2] < newton_max_iter)

        def body_n(c):
            phi, mu, k, done, norm0, prev_norm, nsolve, nR, Rp, Rm = c

            def fresh(_):
                return resid(phi, mu)

            # k == 0 computes the residual; afterwards every Armijo exit
            # path carries the residual of its returned iterate
            norm_R, Rphi, Rmu = jax.lax.cond(k == 0, fresh,
                                             lambda a: a, (nR, Rp, Rm))
            norm0 = jnp.where(k == 0, norm_R, norm0)
            conv = norm_R < newton_tol
            if newton_rtol > 0:
                conv = conv | (norm_R < newton_rtol * norm0)
            if stagnation_exit:
                conv = conv | ((k > 0) & (norm_R >= prev_norm))

            def take_step(args):
                phi, mu = args
                dphi, dmu = schur_solve(phi, Rphi, Rmu)
                return armijo(phi, mu, dphi, dmu, norm_R, Rphi, Rmu)

            phi_n, mu_n, nR_n, Rp_n, Rm_n = jax.lax.cond(
                conv, lambda a: (a[0], a[1], norm_R, Rphi, Rmu), take_step,
                (phi, mu))
            nsolve = nsolve + jnp.where(conv, 0, 1).astype(jnp.int32)
            return (phi_n, mu_n, k + 1, conv, norm0, norm_R, nsolve,
                    nR_n, Rp_n, Rm_n)

        big = jnp.asarray(jnp.inf, dt_)
        zf = jnp.zeros_like(phi_old)
        init_n = (phi_old, mu_init, jnp.int32(0), jnp.bool_(False), big, big,
                  jnp.int32(0), big, zf, zf)
        phi_new, mu_new, _, _, _, _, k_n, _, _, _ = jax.lax.while_loop(
            cond_n, body_n, init_n)

        # ---- clip + interior mass correction + sanitizer (ref :564-577) ----
        phi_c = jnp.clip(phi_new, lo, hi)
        mass_error = jnp.sum(wts * phi_c) - m0
        is_bad = ~jnp.isfinite(mass_error)
        interior = jnp.abs(phi_c) < (1.0 - delta_sep - 5e-3)
        Wint = jnp.sum(jnp.where(interior, wts, 0.0))
        corrected = jnp.where(interior, phi_c - mass_error / Wint, phi_c)
        fallback = jnp.clip(phi_c - mass_error / area, lo, hi)
        needs_fix = jnp.abs(mass_error) > 1e-16
        phi_c = jnp.where(needs_fix,
                          jnp.where(Wint > 0, corrected, fallback), phi_c)

        phi_s[0] = phi_c
        mu_s[0] = mu_new
        w_s[0] = w_new
        hist_ref[0, 0] = phi_c
        ns_ref[b, 0] = ns_ref[b, 0] + k_n
        if segment:
            # final-state outputs: the block index is constant per member,
            # so the last grid step's write is the one that lands in HBM
            phif_ref[0] = phi_c
            muf_ref[0] = mu_new
            wf_ref[0] = w_new

        @pl.when(is_bad & (bad_ref[b, 0] < 0))
        def _():
            bad_ref[b, 0] = m

    return kernel


def march_fused_2d(dts, phi0, u, Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, lam, wts,
                   tau: float, c1: float, c2: float, kappa: float,
                   gamma: float, delta_sep: float, area: float,
                   newton_tol: float, newton_rtol: float,
                   newton_max_iter: int, n_trips: int,
                   stagnation_exit: bool = True, interpret: bool = False,
                   solve_prec: str = "highest", fwd_mm: str = "highest"):
    """Run the full batched 2D forward march in one Pallas kernel.

    Args:
      dts:   (M,) time-step schedule.
      phi0:  (B, n, m) initial fields.
      u:     (B, M+1, n, m) control frames.
      Lx, LyT: dense Neumann Laplacian stencil matrices (LyT transposed).
      Vx_inv, Vy_inv_T, Vx, VyT: cosine eigenbasis transforms.
      lam:   (n, m) eigenvalue grid of the 2D Neumann Laplacian.
      wts:   (n, m) trapz quadrature weights * hx * hy.
      area:  Lx * Ly (uniform mass-fix fallback denominator).
    Returns:
      phi_hist (B, M+1, n, m)  — phi0 prepended, matching _simulate_body,
      nsolve   (B,) int32      — measured Newton linear solves per member,
      first_bad (B,) int32     — first non-finite-mass step per member, -1
                                  if none (runtime sanitizer channel).
    """
    B, n, m = phi0.shape
    M = u.shape[1] - 1
    assert dts.shape == (M,), (dts.shape, M)
    dtype = phi0.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7

    kernel = _march_kernel_factory(
        M, float(tau), float(c1), float(c2), float(kappa), float(gamma),
        float(delta_sep), float(area), float(newton_tol), float(newton_rtol),
        int(newton_max_iter), int(n_trips), bool(stagnation_exit), eps_mach,
        solve_prec=solve_prec, fwd_mm=fwd_mm)

    if _HAS_PLTPU:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((1, n, m), dtype)] * 3 + [
            pltpu.SMEM((1,), dtype)]
        params = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 2**20)}
    else:  # pragma: no cover - CPU interpret-only fallback
        vmem = pl.BlockSpec()
        smem = pl.BlockSpec()
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx)
        scratch = []
        params = {}

    hist, ns, bad = pl.pallas_call(
        kernel,
        grid=(B, M),
        in_specs=[
            smem,                                           # dts (M,)
            vspec((1, n, m), lambda b, t: (b, 0, 0)),       # phi0
            vspec((1, 1, n, m), lambda b, t: (b, t, 0, 0)),     # u_n
            vspec((1, 1, n, m), lambda b, t: (b, t + 1, 0, 0)),  # u_np1
            vmem, vmem,                                      # Lx, LyT
            vmem, vmem, vmem, vmem,                          # transforms
            vmem,                                            # lam
            vmem,                                            # wts
        ],
        out_specs=(
            vspec((1, 1, n, m), lambda b, t: (b, t, 0, 0)),  # phi frames
            smem,                                            # nsolve (B,1)
            smem,                                            # first_bad (B,1)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, n, m), dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(dts, phi0, u, u, Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, lam, wts)

    phi_hist = jnp.concatenate([phi0[:, None], hist], axis=1)
    return phi_hist, ns[:, 0], bad[:, 0]


def march_fused_2d_segment(dts, phi0, mu0, w0, m0, u, Lx, LyT, Vx_inv,
                           Vy_inv_T, Vx, VyT, lam, wts,
                           tau: float, c1: float, c2: float, kappa: float,
                           gamma: float, delta_sep: float, area: float,
                           newton_tol: float, newton_rtol: float,
                           newton_max_iter: int, n_trips: int,
                           stagnation_exit: bool = True,
                           interpret: bool = False,
                           solve_prec: str = "highest",
                           fwd_mm: str = "highest"):
    """One K-step SEGMENT of the fused 2D march, with the (phi, mu, w)
    state carried explicitly so the lowmem pipeline (models/lowmem.py) can
    chain segments across checkpoints: mu0/w0 are the segment-start values
    and m0 is the GLOBAL initial mass (the mass correction always targets
    the trajectory's t=0 mass, not the segment's).

    Args: dts (K,), phi0/mu0/w0 (B, n, m), m0 (B,), u (B, K+1, n, m).
    Returns (hist (B, K, n, m) — the K post-step states, NOT including
    phi0 — phi_f, mu_f, w_f (B, n, m), nsolve (B,), first_bad (B,)).
    """
    B, n, m = phi0.shape
    K = u.shape[1] - 1
    assert dts.shape == (K,), (dts.shape, K)
    dtype = phi0.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7

    kernel = _march_kernel_factory(
        K, float(tau), float(c1), float(c2), float(kappa), float(gamma),
        float(delta_sep), float(area), float(newton_tol), float(newton_rtol),
        int(newton_max_iter), int(n_trips), bool(stagnation_exit), eps_mach,
        solve_prec=solve_prec, fwd_mm=fwd_mm, segment=True)

    if _HAS_PLTPU:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((1, n, m), dtype)] * 3 + [
            pltpu.SMEM((1,), dtype)]
        params = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 2**20)}
    else:  # pragma: no cover - CPU interpret-only fallback
        vmem = pl.BlockSpec()
        smem = pl.BlockSpec()
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx)
        scratch = []
        params = {}

    per_b = vspec((1, n, m), lambda b, t: (b, 0, 0))
    hist, ns, bad, phi_f, mu_f, w_f = pl.pallas_call(
        kernel,
        grid=(B, K),
        in_specs=[
            smem,                                           # dts (K,)
            per_b, per_b, per_b,                            # phi0, mu0, w0
            smem,                                           # m0 (B,)
            vspec((1, 1, n, m), lambda b, t: (b, t, 0, 0)),     # u_n
            vspec((1, 1, n, m), lambda b, t: (b, t + 1, 0, 0)),  # u_np1
            vmem, vmem,                                      # Lx, LyT
            vmem, vmem, vmem, vmem,                          # transforms
            vmem,                                            # lam
            vmem,                                            # wts
        ],
        out_specs=(
            vspec((1, 1, n, m), lambda b, t: (b, t, 0, 0)),  # phi frames
            smem,                                            # nsolve (B,1)
            smem,                                            # first_bad
            per_b, per_b, per_b,                             # finals
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, K, n, m), dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, n, m), dtype),
            jax.ShapeDtypeStruct((B, n, m), dtype),
            jax.ShapeDtypeStruct((B, n, m), dtype),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(dts, phi0, mu0, w0, m0, u, u, Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT,
      lam, wts)

    return hist, phi_f, mu_f, w_f, ns[:, 0], bad[:, 0]


def _adjoint_kernel_factory(M: int, tau: float, gamma: float, c1: float,
                            c2: float, n_trips: int, eps_mach: float,
                            carry_in: bool = False,
                            solve_prec: str = "highest"):
    """Fused backward (p, q, r) sweep: models/adjoint2d.py `_run_impl`
    walked in one kernel, reverse time index n = M-1-t.

    Per step: rhs = B(phi_{n+1}) p_{n+1} + (dt/2) b1 (src_n + src_{n+1}),
    then the split-preconditioned spectral-basis BiCGStab solve of
    A(phi_n) p_n = rhs warm-started from p_{n+1} (identical recurrence to
    pallas_kernels.bicgstab_adjoint_spectral_pallas), then q = -L p and the
    r backward-CN recursion. Only r is written out (the batched PGD
    gradient needs nothing else); r_T = 0 is appended by the caller.

    solve_prec: matmul precision inside the Krylov operator apply ONLY
    ('highest' or 'bf16x3' — the (hi, lo)-split three-dot emulation of
    f32, see _make_mm). The split preconditioning keeps Krylov iterates
    O(1)-scaled, so bf16x3 (~f32-equivalent arithmetic) holds the same
    f32 noise floor as 6-pass HIGHEST; rhs/terminal/q and the final
    synthesis stay HIGHEST. Raw 1-pass bf16 is NOT offered here — the
    adjoint has no outer Newton loop to absorb an imprecise solve.
    """
    fpp_eps = 1e-8

    def kernel(*refs):
        # carry_in=True replaces the terminal solve with explicit
        # (p0, q0, r0) carry INPUTS and adds (p_f, q_f, r_f) final
        # OUTPUTS, so the lowmem pipeline can chain segment sweeps
        # backward across checkpoints (models/lowmem.py).
        if carry_in:
            (dts_ref, b1_ref, phi_n_ref, phi_np1_ref, phiQ_n_ref,
             phiQ_np1_ref, p0_ref, q0_ref, r0_ref, Lx_ref, LyT_ref,
             Vxi_ref, VyiT_ref, Vx_ref, VyT_ref, lam_ref,
             r_out_ref, pf_ref, qf_ref, rf_ref,
             p_s, q_s, r_s) = refs
        else:
            (dts_ref, b1_ref, b2_ref, phi_n_ref, phi_np1_ref, phiQ_n_ref,
             phiQ_np1_ref, phiT_ref, Lx_ref, LyT_ref, Vxi_ref, VyiT_ref,
             Vx_ref, VyT_ref, lam_ref,
             r_out_ref,
             p_s, q_s, r_s) = refs
        b = pl.program_id(0)
        t = pl.program_id(1)
        n = M - 1 - t                      # reverse time index
        Lx = Lx_ref[:]
        LyT = LyT_ref[:]
        Vxi = Vxi_ref[:]
        VyiT = VyiT_ref[:]
        Vx = Vx_ref[:]
        VyT = VyT_ref[:]
        lam = lam_ref[:]
        dt_ = lam.dtype
        b1 = b1_ref[b]

        def mm(a, c):
            return jnp.dot(a, c, preferred_element_type=dt_, precision=_PREC)

        def to_s(v):
            return mm(mm(Vxi, v), VyiT)

        def from_s(vh):
            return mm(mm(Vx, vh), VyT)

        def lap(v):
            return mm(Lx, v) + mm(v, LyT)

        def fpp(phi):
            ph = jnp.clip(phi, -1.0 + fpp_eps, 1.0 - fpp_eps)
            return 2.0 * c1 / (1.0 - ph * ph) - 2.0 * c2

        phi_np1 = phi_np1_ref[0, 0]

        @pl.when(t == 0)
        def _():
            if carry_in:
                p_s[0] = p0_ref[0]
                q_s[0] = q0_ref[0]
                r_s[0] = r0_ref[0]
            else:
                # terminal: (I - tau L) p_T = b2 (phi(T) - phi_Omega),
                # exact in the cosine basis; q_T = -L p_T; r_T = 0
                rhs_T = b2_ref[b] * (phi_np1 - phiT_ref[0])
                p_T = from_s(to_s(rhs_T) / (1.0 - tau * lam))
                p_s[0] = p_T
                q_s[0] = -lap(p_T)
                r_s[0] = jnp.zeros_like(p_T)

        p_next = p_s[0]
        q_next = q_s[0]
        r_next = r_s[0]
        dt = dts_ref[n]
        half_dt = 0.5 * dt

        phi_n = phi_n_ref[0, 0]
        src_sum = ((phi_n - phiQ_n_ref[0, 0])
                   + (phi_np1 - phiQ_np1_ref[0, 0]))
        fpp_n = fpp(phi_n)
        fpp_np1 = fpp(phi_np1)
        fbar = jnp.mean(fpp_n)

        # rhs = B(phi_{n+1}) p_{n+1} + (dt/2) b1 (src_n + src_{n+1})
        w1 = lap(p_next)
        Bp = p_next - tau * w1 - half_dt * lap(w1) + half_dt * fpp_np1 * w1
        rhs = Bp + half_dt * b1 * src_sum

        # split-preconditioned spectral BiCGStab, warm start p_{n+1}
        poly = 1.0 - tau * lam + half_dt * lam * lam
        denom = poly - half_dt * fbar * lam
        isd = jax.lax.rsqrt(jnp.abs(denom))

        mm_s = _make_mm(dt_, "bf16x3") if solve_prec == "bf16x3" else mm

        def to_s_k(v):
            return mm_s(mm_s(Vxi, v), VyiT)

        def from_s_k(vh):
            return mm_s(mm_s(Vx, vh), VyT)

        def apply_At(yh):
            z = isd * yh
            w = to_s_k(fpp_n * from_s_k(lam * z))
            return isd * (poly * z - half_dt * w)

        bt = isd * to_s(rhs)
        y0 = to_s(p_next) / isd
        dot = lambda a, c: jnp.sum(a * c)
        eps_div = jnp.asarray(1e-30, dt_)
        one = jnp.asarray(1.0, dt_)
        r0 = bt - apply_At(y0)
        floor2 = (50.0 * eps_mach) ** 2 * jnp.maximum(dot(bt, bt), eps_div)

        def body(_, carry):
            x, rr, p, v, rho, alpha, omega, best_x, best_r2 = carry
            active = dot(rr, rr) > floor2
            rho_new = dot(r0, rr)
            beta = (rho_new / (rho + eps_div)) * (alpha / (omega + eps_div))
            p_n_ = rr + beta * (p - omega * v)
            v_n = apply_At(p_n_)
            alpha_n = rho_new / (dot(r0, v_n) + eps_div)
            s = rr - alpha_n * v_n
            tt = apply_At(s)
            omega_n = dot(tt, s) / (dot(tt, tt) + eps_div)
            x_n = x + alpha_n * p_n_ + omega_n * s
            r_n_ = s - omega_n * tt
            r2_n = dot(r_n_, r_n_)
            ok = active & jnp.isfinite(r2_n)
            sel = lambda a, bb: jnp.where(ok, a, bb)
            better = ok & (r2_n < best_r2)
            best_x = jnp.where(better, x_n, best_x)
            best_r2 = jnp.where(better, r2_n, best_r2)
            return (sel(x_n, x), sel(r_n_, rr), sel(p_n_, p), sel(v_n, v),
                    jnp.where(ok, rho_new, rho),
                    jnp.where(ok, alpha_n, alpha),
                    jnp.where(ok, omega_n, omega), best_x, best_r2)

        z = jnp.zeros_like(bt)
        init = (y0, r0, z, z, one, one, one, y0, dot(r0, r0))
        out = jax.lax.fori_loop(0, n_trips, body, init)
        p_n = from_s(isd * out[7])

        q_n = -lap(p_n)
        den = gamma + half_dt
        r_n = ((gamma - half_dt) / den * r_next
               + half_dt / den * (q_n + q_next))

        # dt <= 1e-14 steps copy the next level (backward2_solver.py:212-216)
        skip = dt <= 1e-14
        p_n = jnp.where(skip, p_next, p_n)
        q_n = jnp.where(skip, q_next, q_n)
        r_n = jnp.where(skip, r_next, r_n)

        p_s[0] = p_n
        q_s[0] = q_n
        r_s[0] = r_n
        r_out_ref[0, 0] = r_n
        if carry_in:
            # constant block index per member: last grid step's write lands
            pf_ref[0] = p_n
            qf_ref[0] = q_n
            rf_ref[0] = r_n

    return kernel


def adjoint_fused_2d(dts, phi_hist, phi_Q, phi_T, b1, b2,
                     Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, lam,
                     tau: float, gamma: float, c1: float, c2: float,
                     n_trips: int, interpret: bool = False,
                     solve_prec: str = "highest"):
    """Run the full batched 2D adjoint sweep in one Pallas kernel.

    Args:
      dts:      (M,) schedule; phi_hist, phi_Q: (B, M+1, n, m);
      phi_T:    (B, n, m) terminal targets; b1, b2: (B,) weights.
    Returns r (B, M+1, n, m) with r_T = 0 in the last frame — the gradient
    channel of models/adjoint2d.AdjointSolver2D._run_impl.
    """
    B, n, m = phi_T.shape
    M = phi_hist.shape[1] - 1
    assert dts.shape == (M,), (dts.shape, M)
    dtype = phi_T.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7

    kernel = _adjoint_kernel_factory(M, float(tau), float(gamma), float(c1),
                                     float(c2), int(n_trips), eps_mach,
                                     solve_prec=solve_prec)

    if _HAS_PLTPU:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((1, n, m), dtype)] * 3
        params = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 2**20)}
    else:  # pragma: no cover
        vmem = pl.BlockSpec()
        smem = pl.BlockSpec()
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx)
        scratch = []
        params = {}

    rev = lambda b, t: (b, M - 1 - t, 0, 0)
    rev1 = lambda b, t: (b, M - t, 0, 0)
    r_rev = pl.pallas_call(
        kernel,
        grid=(B, M),
        in_specs=[
            smem, smem, smem,                          # dts, b1, b2
            vspec((1, 1, n, m), rev),                  # phi_n
            vspec((1, 1, n, m), rev1),                 # phi_{n+1}
            vspec((1, 1, n, m), rev),                  # phi_Q_n
            vspec((1, 1, n, m), rev1),                 # phi_Q_{n+1}
            vspec((1, n, m), lambda b, t: (b, 0, 0)),  # phi_T
            vmem, vmem,                                # Lx, LyT
            vmem, vmem, vmem, vmem,                    # transforms
            vmem,                                      # lam
        ],
        out_specs=vspec((1, 1, n, m), rev),
        out_shape=jax.ShapeDtypeStruct((B, M, n, m), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(dts, b1, b2, phi_hist, phi_hist, phi_Q, phi_Q, phi_T,
      Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, lam)

    r_T = jnp.zeros((B, 1, n, m), dtype)
    return jnp.concatenate([r_rev, r_T], axis=1)


def adjoint_fused_2d_segment(dts, phi_seg, phi_Q_seg, p0, q0, r0, b1,
                             Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, lam,
                             tau: float, gamma: float, c1: float, c2: float,
                             n_trips: int, interpret: bool = False,
                             solve_prec: str = "highest"):
    """One K-step SEGMENT of the fused backward sweep with the (p, q, r)
    carry explicit, for the lowmem recompute-and-sweep pipeline
    (models/lowmem.py): p0/q0/r0 are the adjoint state at the segment's
    LAST time level (already computed by the later segment or the terminal
    solve), phi_seg/phi_Q_seg are the segment's K+1 state/target frames.

    Returns (r (B, K, n, m) — levels start..start+K-1 in forward order —
    p_f, q_f, r_f (B, n, m) at the segment's first level).
    """
    B, n, m = p0.shape
    K = phi_seg.shape[1] - 1
    assert dts.shape == (K,), (dts.shape, K)
    dtype = p0.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7

    kernel = _adjoint_kernel_factory(K, float(tau), float(gamma), float(c1),
                                     float(c2), int(n_trips), eps_mach,
                                     carry_in=True, solve_prec=solve_prec)

    if _HAS_PLTPU:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((1, n, m), dtype)] * 3
        params = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 2**20)}
    else:  # pragma: no cover
        vmem = pl.BlockSpec()
        smem = pl.BlockSpec()
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx)
        scratch = []
        params = {}

    rev = lambda b, t: (b, K - 1 - t, 0, 0)
    rev1 = lambda b, t: (b, K - t, 0, 0)
    per_b = vspec((1, n, m), lambda b, t: (b, 0, 0))
    r_rev, p_f, q_f, r_f = pl.pallas_call(
        kernel,
        grid=(B, K),
        in_specs=[
            smem, smem,                                # dts, b1
            vspec((1, 1, n, m), rev),                  # phi_n
            vspec((1, 1, n, m), rev1),                 # phi_{n+1}
            vspec((1, 1, n, m), rev),                  # phi_Q_n
            vspec((1, 1, n, m), rev1),                 # phi_Q_{n+1}
            per_b, per_b, per_b,                       # p0, q0, r0
            vmem, vmem,                                # Lx, LyT
            vmem, vmem, vmem, vmem,                    # transforms
            vmem,                                      # lam
        ],
        out_specs=(vspec((1, 1, n, m), rev), per_b, per_b, per_b),
        out_shape=(
            jax.ShapeDtypeStruct((B, K, n, m), dtype),
            jax.ShapeDtypeStruct((B, n, m), dtype),
            jax.ShapeDtypeStruct((B, n, m), dtype),
            jax.ShapeDtypeStruct((B, n, m), dtype),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(dts, b1, phi_seg, phi_seg, phi_Q_seg, phi_Q_seg, p0, q0, r0,
      Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, lam)

    return r_rev, p_f, q_f, r_f


# ---------------------------------------------------------------------------
# 1D fused march: one grid cell per TIME STEP, whole batch per cell
# ---------------------------------------------------------------------------

def _march1d_kernel_factory(M: int, tau: float, c1: float, c2: float,
                            kappa: float, gamma: float, delta_sep: float,
                            Lx_len: float, newton_tol: float,
                            newton_rtol: float, newton_max_iter: int,
                            n_trips: int, stagnation_exit: bool,
                            eps_mach: float):
    """Fused 1D batched march (models/forward1d.py semantics).

    Unlike the 2D kernel (grid over members, per-member loops), 1D fields
    are (N+1,) vectors: a per-member kernel would run 1-row matmuls and
    starve the MXU. Instead the grid is the TIME axis and each cell holds
    the WHOLE batch: matmuls are (B, n) @ (n, n) — full MXU tiles — and
    the Newton/Armijo loops run in masked per-member lockstep with exactly
    the vmapped-scan semantics (a member's carry freezes once its own exit
    fires), minus the per-op launch/HBM-roundtrip overhead of composed XLA.

    Loop-carried state lives in VMEM SCRATCH REFS, not while/fori carries:
    Mosaic cannot legalize scf yields whose (B, 1) per-member values carry
    a lane-REPLICATED layout from keepdims reductions ("failed to legalize
    scf.yield"); ref stores/loads relayout freely, so every loop carries
    only rank-0 scalars.

    Scratch column map (pm_s, a (B, 8) f32 ref):
      0 m0   1 newton-done   2 norm0   3 prev_norm   4 nsolve
      5 armijo-accepted      6 first-trip flag (unused spare)  7 spare
    """
    log_eps = max(1e-8, 0.5 * delta_sep)
    lo, hi = -1.0 + delta_sep, 1.0 - delta_sep

    def kernel(dts_ref, phi0_ref, u_n_ref, u_np1_ref, LT_ref, VinvT_ref,
               VT_ref, lam_ref, wts_ref,
               hist_ref, ns_ref, bad_ref,
               phi_s, mu_s, w_s, pm_s,
               phin_s, mun_s, phia_s, mua_s,
               x_s, r_s, p_s, v_s, bx_s, kr_s):
        m = pl.program_id(0)
        LT = LT_ref[:]
        VinvT = VinvT_ref[:]
        VT = VT_ref[:]
        lam = lam_ref[:]          # (1, n) eigenvalue row
        wts = wts_ref[:]          # (1, n) trapz weights * h
        dt_ = lam.dtype

        def mm(a, c):
            return jnp.dot(a, c, preferred_element_type=dt_, precision=_PREC)

        def lap(v):
            return mm(v, LT)

        def to_s(v):
            return mm(v, VinvT)

        def from_s(vh):
            return mm(vh, VT)

        def f_log(phi):
            ph = jnp.clip(phi, -1.0 + log_eps, 1.0 - log_eps)
            return jnp.log((1.0 + ph) / (1.0 - ph))

        msum = lambda a: jnp.sum(a, axis=1, keepdims=True)   # (B, 1)

        @pl.when(m == 0)
        def _():
            phi0 = phi0_ref[:]
            phi_s[:] = phi0
            w_s[:] = jnp.zeros_like(phi0)
            mu_s[:] = (-kappa * lap(phi0)
                       + c1 * f_log(phi0) - 2.0 * c2 * phi0)
            pm_s[:, 0:1] = msum(wts * phi0)
            ns_ref[:] = jnp.zeros_like(ns_ref)
            bad_ref[:] = -jnp.ones_like(bad_ref)

        phi_old = phi_s[:]
        mu_old = mu_s[:]
        w_old = w_s[:]
        m0 = pm_s[:, 0:1]
        dt = dts_ref[m]
        inv_dt = 1.0 / dt
        tau_dt = tau * inv_dt

        gamma_dt = gamma * inv_dt
        w_new = (((gamma_dt - 0.5) * w_old
                  + 0.5 * (u_np1_ref[0] + u_n_ref[0]))
                 / (gamma_dt + 0.5))
        lap_mu_old = lap(mu_old)
        lap_phi_old = lap(phi_old)
        f_ccv = -2.0 * c2 * phi_old
        w_avg = 0.5 * (w_new + w_old)

        def resid(phi, mu):
            lap_mu = lap(mu)
            lap_phi = lap(phi)
            Rmu = (phi - phi_old) * inv_dt - 0.5 * (lap_mu + lap_mu_old)
            Rphi = (tau * inv_dt * (phi - phi_old)
                    - 0.5 * kappa * (lap_phi + lap_phi_old)
                    + c1 * f_log(phi) + f_ccv
                    - 0.5 * (mu + mu_old) - w_avg)
            norm = jnp.sqrt(msum(Rphi * Rphi) + msum(Rmu * Rmu))   # (B, 1)
            return norm, Rphi, Rmu

        def schur_solve(phi, Rphi, Rmu):
            """Per-member spectral-basis fixed-trip BiCGStab, vectorized
            over the batch axis (newton_schur_solve_1d_spectral semantics
            with the bicgstab_fixed freeze/best-iterate policy). Krylov
            state lives in scratch refs; the fori carries nothing."""
            d = 2.0 * c1 / (1.0 - phi * phi)
            dbar = msum(d) / d.shape[1]
            poly = inv_dt - tau_dt * lam + 0.5 * kappa * lam * lam
            denom = poly - dbar * lam                   # (B, n)

            def apply_S(yh):
                return poly * yh - lam * to_s(d * from_s(yh))

            bvec = to_s(lap(Rphi) - Rmu)
            dot = lambda a, c: msum(a * c)              # (B, 1)
            eps_div = jnp.asarray(1e-30, dt_)
            r0 = bvec
            floor2 = ((50.0 * eps_mach) ** 2
                      * jnp.maximum(dot(bvec, bvec), eps_div))

            x_s[:] = jnp.zeros_like(bvec)
            r_s[:] = bvec
            p_s[:] = jnp.zeros_like(bvec)
            v_s[:] = jnp.zeros_like(bvec)
            bx_s[:] = jnp.zeros_like(bvec)
            kr_s[:, 0:1] = jnp.ones_like(m0)            # rho
            kr_s[:, 1:2] = jnp.ones_like(m0)            # alpha
            kr_s[:, 2:3] = jnp.ones_like(m0)            # omega
            kr_s[:, 3:4] = dot(r0, r0)                  # best_r2

            def body(_, carry):
                x = x_s[:]
                r = r_s[:]
                p = p_s[:]
                v = v_s[:]
                rho = kr_s[:, 0:1]
                alpha = kr_s[:, 1:2]
                omega = kr_s[:, 2:3]
                best_r2 = kr_s[:, 3:4]
                active = dot(r, r) > floor2
                rho_new = dot(r0, r)
                beta = (rho_new / (rho + eps_div)) * (alpha / (omega + eps_div))
                p_n = r + beta * (p - omega * v)
                phat = p_n / denom
                v_n = apply_S(phat)
                alpha_n = rho_new / (dot(r0, v_n) + eps_div)
                s = r - alpha_n * v_n
                shat = s / denom
                t = apply_S(shat)
                omega_n = dot(t, s) / (dot(t, t) + eps_div)
                x_n = x + alpha_n * phat + omega_n * shat
                r_n = s - omega_n * t
                r2_n = dot(r_n, r_n)
                ok = active & jnp.isfinite(r2_n)
                sel = lambda a, bb: jnp.where(ok, a, bb)
                better = ok & (r2_n < best_r2)
                x_s[:] = sel(x_n, x)
                r_s[:] = sel(r_n, r)
                p_s[:] = sel(p_n, p)
                v_s[:] = sel(v_n, v)
                kr_s[:, 0:1] = jnp.where(ok, rho_new, rho)
                kr_s[:, 1:2] = jnp.where(ok, alpha_n, alpha)
                kr_s[:, 2:3] = jnp.where(ok, omega_n, omega)
                kr_s[:, 3:4] = jnp.where(better, r2_n, best_r2)
                bx_s[:] = jnp.where(better, x_n, bx_s[:])
                return carry

            jax.lax.fori_loop(0, n_trips, body, jnp.int32(0))
            dphi = from_s(bx_s[:])
            Kpp_dphi = -(0.5 * kappa) * lap(dphi) + (tau_dt + d) * dphi
            dmu = 2.0 * (Kpp_dphi + Rphi)
            return dphi, dmu

        def step_ceiling(phi, dphi):
            # ref 1D: alpha = min(1, 0.9 * alpha_max), fallback 1.0
            big = jnp.asarray(jnp.inf, dt_)
            ratio_pos = jnp.where(dphi > 0, (hi - phi) / dphi, big)
            ratio_neg = jnp.where(dphi < 0, (lo - phi) / dphi, big)
            amax = jnp.minimum(jnp.min(ratio_pos, axis=1, keepdims=True),
                               jnp.min(ratio_neg, axis=1, keepdims=True))
            bad_a = ~jnp.isfinite(amax) | (amax <= 0)
            amax = jnp.where(bad_a, 1.0, amax)
            return jnp.minimum(1.0, 0.9 * amax)         # (B, 1)

        def armijo(phi, mu, dphi, dmu, norm_R, act):
            """1D Armijo: eta=1e-3, in-bounds guard, NO best-trial fallback;
            per-member masked lockstep. A live member's trial alpha at round
            j is exactly alpha0 * 0.5^j (it halves every failed round), so
            alpha is never stored: phia_s/mua_s/the accepted column carry
            the per-member state and the loop carries only (j, n_waiting).
            """
            eta = 1e-3
            alpha0 = step_ceiling(phi, dphi)
            phia_s[:] = phi
            mua_s[:] = mu
            pm_s[:, 5:6] = jnp.zeros_like(m0)           # accepted flag

            def cond_a(c):
                j, n_wait, fac = c
                return (n_wait > 0) & (j < 12)

            def body_a(c):
                j, _, fac = c
                accepted = pm_s[:, 5:6] > 0.5
                live = act & ~accepted
                alpha = alpha0 * fac     # exact 0.5^j (Mosaic has no powf)
                phi_t = phi + alpha * dphi
                mu_t = mu + alpha * dmu
                in_bounds = jnp.all(jnp.abs(phi_t) < 1.0 - delta_sep,
                                    axis=1, keepdims=True)
                norm_t, _, _ = resid(phi_t, mu_t)
                accept_now = live & in_bounds & (
                    norm_t <= (1.0 - eta * alpha) * norm_R)
                phia_s[:] = jnp.where(accept_now, phi_t, phia_s[:])
                mua_s[:] = jnp.where(accept_now, mu_t, mua_s[:])
                pm_s[:, 5:6] = jnp.where(accept_now, 1.0, pm_s[:, 5:6])
                still = live & ~accept_now
                return (j + 1, jnp.sum(still.astype(jnp.int32)),
                        fac * jnp.asarray(0.5, dt_))

            n0 = jnp.sum(act.astype(jnp.int32))
            jax.lax.while_loop(cond_a, body_a,
                               (jnp.int32(0), n0, jnp.asarray(1.0, dt_)))
            return phia_s[:], mua_s[:], pm_s[:, 5:6] > 0.5

        # ---- masked lockstep Newton over the batch (scratch state) ----
        phin_s[:] = phi_old
        mun_s[:] = mu_old                 # 1D: initial mu guess = mu_old
        pm_s[:, 1:2] = jnp.zeros_like(m0)     # done
        pm_s[:, 2:3] = jnp.full_like(m0, jnp.inf)   # norm0
        pm_s[:, 3:4] = jnp.full_like(m0, jnp.inf)   # prev_norm
        pm_s[:, 4:5] = jnp.zeros_like(m0)     # nsolve

        def cond_n(c):
            k, n_live = c
            return (n_live > 0) & (k < newton_max_iter)

        def body_n(c):
            k, _ = c
            phi = phin_s[:]
            mu = mun_s[:]
            done = pm_s[:, 1:2] > 0.5
            live0 = ~done
            norm_R, Rphi, Rmu = resid(phi, mu)
            norm0 = jnp.where(k == 0, norm_R, pm_s[:, 2:3])
            pm_s[:, 2:3] = norm0
            conv = norm_R < newton_tol
            if newton_rtol > 0:
                conv = conv | (norm_R < newton_rtol * norm0)
            if stagnation_exit:
                conv = conv | ((k > 0) & (norm_R >= pm_s[:, 3:4]))
            act = live0 & ~conv
            dphi, dmu = schur_solve(phi, Rphi, Rmu)
            phi_a, mu_a, accepted = armijo(phi, mu, dphi, dmu, norm_R, act)
            # line-search failure terminates that member's Newton loop
            take = act & accepted
            phin_s[:] = jnp.where(take, phi_a, phi)
            mun_s[:] = jnp.where(take, mu_a, mu)
            pm_s[:, 4:5] = pm_s[:, 4:5] + jnp.where(act, 1.0, 0.0)
            done_new = done | conv | (act & ~accepted)
            pm_s[:, 1:2] = jnp.where(done_new, 1.0, 0.0)
            pm_s[:, 3:4] = jnp.where(live0, norm_R, pm_s[:, 3:4])
            return (k + 1, jnp.sum((~done_new).astype(jnp.int32)))

        B_live = jnp.sum(jnp.ones_like(m0, jnp.int32))
        jax.lax.while_loop(cond_n, body_n, (jnp.int32(0), B_live))
        phi_new = phin_s[:]
        mu_new = mun_s[:]

        # clip + uniform mass projection + sanitizer
        phi_c = jnp.clip(phi_new, lo, hi)
        mass_error = msum(wts * phi_c) - m0              # (B, 1)
        is_bad = ~jnp.isfinite(mass_error)
        phi_c = phi_c - mass_error / Lx_len

        phi_s[:] = phi_c
        mu_s[:] = mu_new
        w_s[:] = w_new
        hist_ref[0] = phi_c
        ns_ref[:] = ns_ref[:] + pm_s[:, 4:5].astype(jnp.float32)
        m_f = jnp.asarray(m, jnp.float32) * jnp.ones_like(bad_ref)
        bad_ref[:] = jnp.where((bad_ref[:] < 0) & is_bad, m_f, bad_ref[:])

    return kernel


def march_fused_1d(dts, phi0, u, LT, VinvT, VT, lam, wts,
                   tau: float, c1: float, c2: float, kappa: float,
                   gamma: float, delta_sep: float, Lx_len: float,
                   newton_tol: float, newton_rtol: float,
                   newton_max_iter: int, n_trips: int,
                   stagnation_exit: bool = True, interpret: bool = False):
    """Run the full batched 1D forward march in one Pallas kernel.

    Args:
      dts:  (M,) schedule; phi0: (B, n); u: (B, M+1, n) CORE layout
            (no duplicated t=0 row — the wrapper handles ref layout).
      LT, VinvT, VT: transposed Laplacian / cosine transforms (n, n).
      lam, wts: (1, n) eigenvalues and trapz weights * h.
    Returns (phi_hist (B, M+1, n), newton_solves (B,) f32, first_bad (B,)
    f32 with -1 = none).
    """
    B, n = phi0.shape
    M = u.shape[1] - 1
    assert dts.shape == (M,), (dts.shape, M)
    dtype = phi0.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7

    kernel = _march1d_kernel_factory(
        M, float(tau), float(c1), float(c2), float(kappa), float(gamma),
        float(delta_sep), float(Lx_len), float(newton_tol),
        float(newton_rtol), int(newton_max_iter), int(n_trips),
        bool(stagnation_exit), eps_mach)

    # time-major layouts so every block's last two dims equal (B, n)
    u_tm = jnp.swapaxes(u, 0, 1)                        # (M+1, B, n)

    if _HAS_PLTPU:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                                memory_space=pltpu.VMEM)
        # phi/mu/w cross-step state, the (B, 8) per-member scalar block,
        # Newton iterate + Armijo + Krylov work fields, Krylov scalars
        scratch = ([pltpu.VMEM((B, n), dtype)] * 3
                   + [pltpu.VMEM((B, 8), dtype)]
                   + [pltpu.VMEM((B, n), dtype)] * 9
                   + [pltpu.VMEM((B, 4), dtype)])
        params = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2**20)}
    else:  # pragma: no cover
        vmem = pl.BlockSpec()
        smem = pl.BlockSpec()
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx)
        scratch = []
        params = {}

    hist_tm, ns, bad = pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            smem,                                       # dts
            vmem,                                       # phi0 (B, n)
            vspec((1, B, n), lambda t: (t, 0, 0)),      # u_n
            vspec((1, B, n), lambda t: (t + 1, 0, 0)),  # u_np1
            vmem, vmem, vmem,                           # LT, VinvT, VT
            vmem, vmem,                                 # lam, wts (1, n)
        ],
        out_specs=(
            vspec((1, B, n), lambda t: (t, 0, 0)),      # phi frames
            vmem,                                       # ns (B, 1)
            vmem,                                       # bad (B, 1)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, B, n), dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(dts, phi0, u_tm, u_tm, LT, VinvT, VT, lam, wts)

    phi_hist = jnp.concatenate([phi0[:, None],
                                jnp.swapaxes(hist_tm, 0, 1)], axis=1)
    return phi_hist, ns[:, 0], bad[:, 0]


# ---------------------------------------------------------------------------
# Member-BLOCK-tiled 2D fused march: Bb members per grid cell
# ---------------------------------------------------------------------------

def _march_kernel_factory_blocked(M: int, tau: float, c1: float, c2: float,
                                  kappa: float, gamma: float,
                                  delta_sep: float, area: float,
                                  newton_tol: float, newton_rtol: float,
                                  newton_max_iter: int, n_trips: int,
                                  stagnation_exit: bool, eps_mach: float,
                                  Bb: int, n: int, m: int,
                                  solve_prec: str = "highest",
                                  fwd_mm: str = "highest"):
    """Blocked variant of _march_kernel_factory: Bb members share one grid
    cell, their fields stacked (Bb*n, m) in VMEM scratch.

    Why (measured, BENCH_RESULTS blocked_march_microbench): the per-member
    kernel's dependent (n,n)@(n,n) matmul chain costs 213 ns/matmul at
    64x64 — latency, not FLOPs. Stacking turns every right-multiply into
    ONE (Bb*n, m) matmul (80 ns/member) and every left-multiply into Bb
    INDEPENDENT per-member slice matmuls that the MXU pipelines
    (67 ns/member). No member transposes anywhere (a (Bb,n,m) swapaxes
    costs 224 ns/member — what sank the round-2 member-tiled attempt), and
    per-member reductions are unrolled rank-0 scalars (~free).

    Newton/Armijo run in masked LOCKSTEP across the block's Bb members
    (same pattern as the 1D kernel): a member's carry freezes once its own
    exit fires, so per-member semantics — tolerances, best-trial Armijo
    fallback, stagnation exits, measured solve counts — are identical to
    the per-member kernel; the block merely executes max-of-Bb trips.
    """
    log_eps = max(1e-8, 0.5 * delta_sep)
    lo, hi = -1.0 + delta_sep, 1.0 - delta_sep
    dsep2 = 1.0 - delta_sep * delta_sep
    R = range(Bb)

    def kernel(dts_ref, phi0_ref, u_n_ref, u_np1_ref, Lx_ref, LyT_ref,
               Vxi_ref, VyiT_ref, Vx_ref, VyT_ref, lam_ref, wts_ref,
               hist_ref, ns_ref, bad_ref,
               phi_s, mu_s, w_s, m0_s):
        g = pl.program_id(0)
        t_step = pl.program_id(1)
        Lx = Lx_ref[:]
        LyT = LyT_ref[:]
        Vxi = Vxi_ref[:]
        VyiT = VyiT_ref[:]
        Vx = Vx_ref[:]
        VyT = VyT_ref[:]
        lam = lam_ref[:]
        wts = wts_ref[:]
        dt_ = lam.dtype
        mm = _make_mm(dt_, fwd_mm)

        sl = lambda X, b: X[b * n:(b + 1) * n, :]
        cat = lambda xs: jnp.concatenate(xs, axis=0)

        def mml(A, X):
            # per-member LEFT-multiplies: Bb independent matmuls (MXU
            # pipelines them), reassembled by concat
            return cat([mm(A, sl(X, b)) for b in R])

        def lap(X):
            return mml(Lx, X) + mm(X, LyT)

        def to_s(X):
            return mm(mml(Vxi, X), VyiT)

        def from_s(X):
            return mm(mml(Vx, X), VyT)

        def f_log(phi):
            ph = jnp.clip(phi, -1.0 + log_eps, 1.0 - log_eps)
            return jnp.log((1.0 + ph) / (1.0 - ph))

        def dots(a, c):
            return [jnp.sum(sl(a, b) * sl(c, b)) for b in R]

        def colb(ss):
            # per-member rank-0 scalars broadcast down each member's row
            # block: ONE stacked elementwise op then replaces Bb unrolled
            # slice updates (measured: the unrolled form costs ~0.7 us per
            # member-trip of VPU/copy overhead)
            return cat([jnp.full((n, 1), s) for s in ss])

        def colm(ss):
            # bool masks as float columns (Mosaic rejects i1 vreg
            # broadcasts: "Invalid vector register cast")
            onef = jnp.asarray(1.0, dt_)
            zerof = jnp.asarray(0.0, dt_)
            return colb([jnp.where(s, onef, zerof) for s in ss]) > 0.5

        # per-member stacks of the (replicated) spectral grids
        lam_st = cat([lam] * Bb)

        @pl.when(t_step == 0)
        def _():
            phi0 = cat([phi0_ref[b] for b in R])
            phi_s[:] = phi0
            w_s[:] = jnp.zeros_like(phi0)
            mu_s[:] = (-kappa * lap(phi0)
                       + c1 * f_log(phi0) - 2.0 * c2 * phi0)
            for b in R:
                m0_s[b] = jnp.sum(sl(phi0, b) * wts)
                ns_ref[g * Bb + b, 0] = jnp.int32(0)
                bad_ref[g * Bb + b, 0] = jnp.int32(-1)

        phi_old = phi_s[:]
        mu_old = mu_s[:]
        w_old = w_s[:]
        dt = dts_ref[t_step]
        inv_dt = 1.0 / dt
        tau_dt = tau * inv_dt

        gamma_dt = gamma * inv_dt
        u_n = cat([u_n_ref[b, 0] for b in R])
        u_np1 = cat([u_np1_ref[b, 0] for b in R])
        w_new = (((gamma_dt - 0.5) * w_old + 0.5 * (u_np1 + u_n))
                 / (gamma_dt + 0.5))
        lap_mu_old = lap(mu_old)
        lap_phi_old = lap(phi_old)
        mu_init = (-kappa * lap_phi_old
                   + c1 * f_log(phi_old) - 2.0 * c2 * phi_old - w_new)
        f_ccv = -2.0 * c2 * phi_old
        w_avg = 0.5 * (w_new + w_old)

        def resid(phi, mu):
            """Stacked CN residuals + per-member norms (list of rank-0)."""
            lap_mu = lap(mu)
            lap_phi = lap(phi)
            Rmu = (phi - phi_old) * inv_dt - 0.5 * (lap_mu + lap_mu_old)
            Rphi = (tau * inv_dt * (phi - phi_old)
                    - 0.5 * kappa * (lap_phi + lap_phi_old)
                    + c1 * f_log(phi) + f_ccv
                    - 0.5 * (mu + mu_old) - w_avg)
            norms = [jnp.sqrt(jnp.sum(sl(Rphi, b) ** 2)
                              + jnp.sum(sl(Rmu, b) ** 2)) for b in R]
            return norms, Rphi, Rmu

        if solve_prec == "default":
            one_pass = jax.lax.Precision.DEFAULT

            def mm_s(a, c):
                return jnp.dot(a, c, preferred_element_type=dt_,
                               precision=one_pass)
        elif solve_prec == "bf16x3":
            mm_s = _make_mm(dt_, "bf16x3")
        else:
            mm_s = mm

        def mml_s(A, X):
            return cat([mm_s(A, sl(X, b)) for b in R])

        def schur_solve(phi, Rphi, Rmu):
            """Blocked fixed-trip spectral-basis BiCGStab: stacked fields,
            per-member rank-0 Krylov scalars (bicgstab_fixed freeze /
            best-iterate / non-finite-rejection policy per member)."""
            phi_sq = jnp.clip(phi * phi, 0.0, dsep2)
            d = 2.0 * c1 / (1.0 - phi_sq)
            poly = inv_dt - tau_dt * lam_st + 0.5 * kappa * lam_st * lam_st
            denom = cat([poly[b * n:(b + 1) * n, :]
                         - jnp.mean(sl(d, b)) * lam for b in R])

            def apply_S(yh):
                w = d * mm_s(mml_s(Vx, yh), VyT)
                return poly * yh - lam_st * mm_s(mml_s(Vxi, w), VyiT)

            bvec = to_s(lap(Rphi) - Rmu)
            eps_div = jnp.asarray(1e-30, dt_)
            one = jnp.asarray(1.0, dt_)
            r0 = bvec
            b2 = dots(bvec, bvec)
            floor2 = [(50.0 * eps_mach) ** 2 * jnp.maximum(b2[b], eps_div)
                      for b in R]

            def body(_, carry):
                x, r, p, v, rho, alpha, omega, best_x, best_r2 = carry
                rr = dots(r, r)
                active = [rr[b] > floor2[b] for b in R]
                rho_new = dots(r0, r)
                beta = [(rho_new[b] / (rho[b] + eps_div))
                        * (alpha[b] / (omega[b] + eps_div)) for b in R]
                p_n = r + colb(beta) * (p - colb(omega) * v)
                phat = p_n / denom
                v_n = apply_S(phat)
                rv = dots(r0, v_n)
                alpha_n = [rho_new[b] / (rv[b] + eps_div) for b in R]
                a_c = colb(alpha_n)
                s = r - a_c * v_n
                shat = s / denom
                t = apply_S(shat)
                ts_ = dots(t, s)
                tt = dots(t, t)
                omega_n = [ts_[b] / (tt[b] + eps_div) for b in R]
                o_c = colb(omega_n)
                x_n = x + a_c * phat + o_c * shat
                r_n = s - o_c * t
                r2_n = dots(r_n, r_n)
                ok = [active[b] & jnp.isfinite(r2_n[b]) for b in R]
                better = [ok[b] & (r2_n[b] < best_r2[b]) for b in R]
                ok_c = colm(ok)
                sel = lambda a, bb_: jnp.where(ok_c, a, bb_)
                bx = jnp.where(colm(better), x_n, best_x)
                return (sel(x_n, x), sel(r_n, r), sel(p_n, p), sel(v_n, v),
                        [jnp.where(ok[b], rho_new[b], rho[b]) for b in R],
                        [jnp.where(ok[b], alpha_n[b], alpha[b]) for b in R],
                        [jnp.where(ok[b], omega_n[b], omega[b]) for b in R],
                        bx,
                        [jnp.where(better[b], r2_n[b], best_r2[b])
                         for b in R])

            z = jnp.zeros_like(bvec)
            ones = [one] * Bb
            init = (z, r0, z, z, ones, ones, ones, z, b2)
            out = jax.lax.fori_loop(0, n_trips, body, init)
            dphi = from_s(out[7])
            Kpp_dphi = -(0.5 * kappa) * lap(dphi) + (tau_dt + d) * dphi
            dmu = 2.0 * (Kpp_dphi + Rphi)
            return dphi, dmu

        def step_ceiling(phi, dphi):
            big = jnp.asarray(jnp.inf, dt_)
            ratio_pos = jnp.where(dphi > 0, (hi - phi) / dphi, big)
            ratio_neg = jnp.where(dphi < 0, (lo - phi) / dphi, big)
            outs = []
            for b in R:
                amax = jnp.minimum(jnp.asarray(2.0, dt_),
                                   jnp.minimum(
                                       0.9 * jnp.min(sl(ratio_pos, b)),
                                       0.9 * jnp.min(sl(ratio_neg, b))))
                bad_a = ~jnp.isfinite(amax) | (amax <= 0)
                amax = jnp.where(bad_a, 1.0, amax)
                outs.append(jnp.minimum(1.0, amax))
            return outs

        def armijo(phi, mu, dphi, dmu, norm_R, Rphi_R, Rmu_R, act):
            """Masked-lockstep Armijo over the block: per-member alpha
            ladder, accept / best-trial-fallback / unchanged exits, and the
            residual of the returned iterate carried out (per-member kernel
            semantics; `act` masks members whose Newton already exited)."""
            eta = 1e-4
            alpha0 = step_ceiling(phi, dphi)
            big = jnp.asarray(jnp.inf, dt_)
            n_act = sum(a.astype(jnp.int32) for a in act)

            def cond_a(c):
                return (c[-2] > 0) & (c[-1] < 12)

            def body_a(c):
                (alpha, phi_a, mu_a, aN, aRp, aRm,
                 best_norm, best_phi, best_mu, bRp, bRm, accepted,
                 _, j) = c
                live = [act[b] & ~accepted[b] for b in R]
                al_c = colb(alpha)
                phi_t = phi + al_c * dphi
                mu_t = mu + al_c * dmu
                norm_t, Rp_t, Rm_t = resid(phi_t, mu_t)
                better = [live[b] & (norm_t[b] < best_norm[b]) for b in R]
                bet_c = colm(better)
                best_norm = [jnp.where(better[b], norm_t[b], best_norm[b])
                             for b in R]
                best_phi = jnp.where(bet_c, phi_t, best_phi)
                best_mu = jnp.where(bet_c, mu_t, best_mu)
                bRp = jnp.where(bet_c, Rp_t, bRp)
                bRm = jnp.where(bet_c, Rm_t, bRm)
                acc_now = [live[b] & (norm_t[b]
                                      <= (1.0 - eta * alpha[b]) * norm_R[b])
                           for b in R]
                acc_c = colm(acc_now)
                phi_a = jnp.where(acc_c, phi_t, phi_a)
                mu_a = jnp.where(acc_c, mu_t, mu_a)
                aN = [jnp.where(acc_now[b], norm_t[b], aN[b]) for b in R]
                aRp = jnp.where(acc_c, Rp_t, aRp)
                aRm = jnp.where(acc_c, Rm_t, aRm)
                accepted = [accepted[b] | acc_now[b] for b in R]
                alpha = [jnp.where(accepted[b], alpha[b], alpha[b] * 0.5)
                         for b in R]
                still = sum((act[b] & ~accepted[b]).astype(jnp.int32)
                            for b in R)
                return (alpha, phi_a, mu_a, aN, aRp, aRm,
                        best_norm, best_phi, best_mu, bRp, bRm, accepted,
                        still, j + 1)

            init = (alpha0, phi, mu, list(norm_R), Rphi_R, Rmu_R,
                    [big] * Bb, phi, mu, Rphi_R, Rmu_R,
                    [jnp.bool_(False)] * Bb, n_act, jnp.int32(0))
            (_, phi_a, mu_a, aN, aRp, aRm, best_norm, best_phi, best_mu,
             bRp, bRm, accepted, _, _) = jax.lax.while_loop(
                cond_a, body_a, init)
            use_best = [(~accepted[b]) & (best_norm[b] < norm_R[b])
                        for b in R]

            acc_c2 = colm(accepted)
            ub_c = colm(use_best)

            def pick3(a, bb_, cc):
                return jnp.where(acc_c2, a, jnp.where(ub_c, bb_, cc))

            pickN = [jnp.where(accepted[b], aN[b],
                               jnp.where(use_best[b], best_norm[b],
                                         norm_R[b])) for b in R]
            return (pick3(phi_a, best_phi, phi), pick3(mu_a, best_mu, mu),
                    pickN, pick3(aRp, bRp, Rphi_R), pick3(aRm, bRm, Rmu_R),
                    accepted)

        # ---- masked-lockstep Newton over the block ----
        big = jnp.asarray(jnp.inf, dt_)
        zf = jnp.zeros_like(phi_old)

        def cond_n(c):
            return (c[-1] > 0) & (c[2] < newton_max_iter)

        def body_n(c):
            (phi, mu, k, done, norm0, prev_norm, nsolve,
             nR, Rp, Rm, _) = c

            def fresh(_):
                return resid(phi, mu)

            norm_R, Rphi, Rmu = jax.lax.cond(
                k == 0, fresh, lambda a: a, (nR, Rp, Rm))
            norm0 = [jnp.where(k == 0, norm_R[b], norm0[b]) for b in R]
            conv = [norm_R[b] < newton_tol for b in R]
            if newton_rtol > 0:
                conv = [conv[b] | (norm_R[b] < newton_rtol * norm0[b])
                        for b in R]
            if stagnation_exit:
                conv = [conv[b] | ((k > 0) & (norm_R[b] >= prev_norm[b]))
                        for b in R]
            act = [~done[b] & ~conv[b] for b in R]
            dphi, dmu = schur_solve(phi, Rphi, Rmu)
            phi_a, mu_a, aN, aRp, aRm, _ = armijo(
                phi, mu, dphi, dmu, norm_R, Rphi, Rmu, act)
            act_c = colm(act)
            phi_n = jnp.where(act_c, phi_a, phi)
            mu_n = jnp.where(act_c, mu_a, mu)
            nR_n = [jnp.where(act[b], aN[b], norm_R[b]) for b in R]
            Rp_n = jnp.where(act_c, aRp, Rphi)
            Rm_n = jnp.where(act_c, aRm, Rmu)
            nsolve = [nsolve[b]
                      + jnp.where(act[b], 1, 0).astype(jnp.int32)
                      for b in R]
            done_n = [done[b] | conv[b] for b in R]
            live = sum((~done_n[b]).astype(jnp.int32) for b in R)
            # prev_norm carries this iteration's ENTRY norm (the stagnation
            # test compares successive entry norms, per-member kernel :341)
            return (phi_n, mu_n, k + 1, done_n, norm0, list(norm_R), nsolve,
                    nR_n, Rp_n, Rm_n, live)

        init_n = (phi_old, mu_init, jnp.int32(0), [jnp.bool_(False)] * Bb,
                  [big] * Bb, [big] * Bb, [jnp.int32(0)] * Bb,
                  [big] * Bb, zf, zf, jnp.int32(Bb))
        out_n = jax.lax.while_loop(cond_n, body_n, init_n)
        phi_new, mu_new = out_n[0], out_n[1]
        nsolves = out_n[6]

        # ---- clip + per-member interior mass correction + sanitizer ----
        phi_c = jnp.clip(phi_new, lo, hi)
        for b in R:
            pb = sl(phi_c, b)
            mass_error = jnp.sum(wts * pb) - m0_s[b]
            is_bad = ~jnp.isfinite(mass_error)
            interior = jnp.abs(pb) < (1.0 - delta_sep - 5e-3)
            Wint = jnp.sum(jnp.where(interior, wts, 0.0))
            corrected = jnp.where(interior, pb - mass_error / Wint, pb)
            fallback = jnp.clip(pb - mass_error / area, lo, hi)
            needs_fix = jnp.abs(mass_error) > 1e-16
            pb = jnp.where(needs_fix,
                           jnp.where(Wint > 0, corrected, fallback), pb)
            phi_s[b * n:(b + 1) * n, :] = pb
            hist_ref[b, 0] = pb
            ns_ref[g * Bb + b, 0] = ns_ref[g * Bb + b, 0] + nsolves[b]

            @pl.when(is_bad & (bad_ref[g * Bb + b, 0] < 0))
            def _():
                bad_ref[g * Bb + b, 0] = t_step

        mu_s[:] = mu_new
        w_s[:] = w_new

    return kernel


def march_fused_2d_blocked(dts, phi0, u, Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT,
                           lam, wts, tau: float, c1: float, c2: float,
                           kappa: float, gamma: float, delta_sep: float,
                           area: float, newton_tol: float,
                           newton_rtol: float, newton_max_iter: int,
                           n_trips: int, stagnation_exit: bool = True,
                           interpret: bool = False,
                           solve_prec: str = "highest",
                           fwd_mm: str = "highest", block_b: int = 8):
    """Member-block-tiled batched 2D forward march (see
    _march_kernel_factory_blocked). Same contract as march_fused_2d; B
    must divide by block_b (callers fall back to the per-member kernel
    otherwise)."""
    B, n, m = phi0.shape
    M = u.shape[1] - 1
    assert dts.shape == (M,), (dts.shape, M)
    assert B % block_b == 0, (B, block_b)
    dtype = phi0.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7

    kernel = _march_kernel_factory_blocked(
        M, float(tau), float(c1), float(c2), float(kappa), float(gamma),
        float(delta_sep), float(area), float(newton_tol), float(newton_rtol),
        int(newton_max_iter), int(n_trips), bool(stagnation_exit), eps_mach,
        int(block_b), n, m, solve_prec=solve_prec, fwd_mm=fwd_mm)

    Bb = block_b
    if _HAS_PLTPU:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((Bb * n, m), dtype)] * 3 + [
            pltpu.SMEM((Bb,), dtype)]
        params = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 2**20)}
    else:  # pragma: no cover - CPU interpret-only fallback
        vmem = pl.BlockSpec()
        smem = pl.BlockSpec()
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx)
        scratch = [pltpu.VMEM((Bb * n, m), dtype)] * 3 + [
            pltpu.SMEM((Bb,), dtype)] if pltpu else []
        params = {}

    hist, ns, bad = pl.pallas_call(
        kernel,
        grid=(B // Bb, M),
        in_specs=[
            smem,                                             # dts (M,)
            vspec((Bb, n, m), lambda g, t: (g, 0, 0)),        # phi0
            vspec((Bb, 1, n, m), lambda g, t: (g, t, 0, 0)),      # u_n
            vspec((Bb, 1, n, m), lambda g, t: (g, t + 1, 0, 0)),  # u_np1
            vmem, vmem,                                       # Lx, LyT
            vmem, vmem, vmem, vmem,                           # transforms
            vmem,                                             # lam
            vmem,                                             # wts
        ],
        out_specs=(
            vspec((Bb, 1, n, m), lambda g, t: (g, t, 0, 0)),  # phi frames
            smem,                                             # nsolve (B,1)
            smem,                                             # first_bad
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, n, m), dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(dts, phi0, u, u, Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, lam, wts)

    phi_hist = jnp.concatenate([phi0[:, None], hist], axis=1)
    return phi_hist, ns[:, 0], bad[:, 0]


def _adjoint_kernel_factory_blocked(M: int, tau: float, gamma: float,
                                    c1: float, c2: float, n_trips: int,
                                    eps_mach: float, Bb: int, n: int, m: int,
                                    solve_prec: str = "highest"):
    """Blocked variant of _adjoint_kernel_factory: Bb members' (p, q, r)
    states stacked (Bb*n, m) per grid cell. The adjoint is the pure
    dependent-Krylov-chain case (no Newton/Armijo loops to amortize), so
    member blocking converts more of its wall time than the march's — the
    same stacked-right / pipelined-slice-left matmul layout as
    _march_kernel_factory_blocked, per-member scalars as rank-0 lists with
    float broadcast columns."""
    fpp_eps = 1e-8
    R = range(Bb)

    def kernel(dts_ref, b1_ref, b2_ref, phi_n_ref, phi_np1_ref, phiQ_n_ref,
               phiQ_np1_ref, phiT_ref, Lx_ref, LyT_ref, Vxi_ref, VyiT_ref,
               Vx_ref, VyT_ref, lam_ref,
               r_out_ref,
               p_s, q_s, r_s):
        g = pl.program_id(0)
        t = pl.program_id(1)
        nrev = M - 1 - t
        Lx = Lx_ref[:]
        LyT = LyT_ref[:]
        Vxi = Vxi_ref[:]
        VyiT = VyiT_ref[:]
        Vx = Vx_ref[:]
        VyT = VyT_ref[:]
        lam = lam_ref[:]
        dt_ = lam.dtype

        def mm(a, c):
            return jnp.dot(a, c, preferred_element_type=dt_, precision=_PREC)

        sl = lambda X, b: X[b * n:(b + 1) * n, :]
        cat = lambda xs: jnp.concatenate(xs, axis=0)
        mml = lambda A, X: cat([mm(A, sl(X, b)) for b in R])

        def lap(X):
            return mml(Lx, X) + mm(X, LyT)

        def to_s(X):
            return mm(mml(Vxi, X), VyiT)

        def from_s(X):
            return mm(mml(Vx, X), VyT)

        def fpp(phi):
            ph = jnp.clip(phi, -1.0 + fpp_eps, 1.0 - fpp_eps)
            return 2.0 * c1 / (1.0 - ph * ph) - 2.0 * c2

        def dots(a, c):
            return [jnp.sum(sl(a, b) * sl(c, b)) for b in R]

        def colb(ss):
            return cat([jnp.full((n, 1), s) for s in ss])

        def colm(ss):
            onef = jnp.asarray(1.0, dt_)
            zerof = jnp.asarray(0.0, dt_)
            return colb([jnp.where(s, onef, zerof) for s in ss]) > 0.5

        lam_st = cat([lam] * Bb)
        b1_c = colb([b1_ref[g * Bb + b] for b in R])
        phi_np1 = cat([phi_np1_ref[b, 0] for b in R])

        @pl.when(t == 0)
        def _():
            b2_c = colb([b2_ref[g * Bb + b] for b in R])
            phiT = cat([phiT_ref[b] for b in R])
            rhs_T = b2_c * (phi_np1 - phiT)
            p_T = from_s(to_s(rhs_T) / (1.0 - tau * lam_st))
            p_s[:] = p_T
            q_s[:] = -lap(p_T)
            r_s[:] = jnp.zeros_like(p_T)

        p_next = p_s[:]
        q_next = q_s[:]
        r_next = r_s[:]
        dt = dts_ref[nrev]
        half_dt = 0.5 * dt

        phi_n = cat([phi_n_ref[b, 0] for b in R])
        src_sum = ((phi_n - cat([phiQ_n_ref[b, 0] for b in R]))
                   + (phi_np1 - cat([phiQ_np1_ref[b, 0] for b in R])))
        fpp_n = fpp(phi_n)
        fpp_np1 = fpp(phi_np1)
        fbar = [jnp.mean(sl(fpp_n, b)) for b in R]

        w1 = lap(p_next)
        Bp = p_next - tau * w1 - half_dt * lap(w1) + half_dt * fpp_np1 * w1
        rhs = Bp + half_dt * b1_c * src_sum

        poly = 1.0 - tau * lam_st + half_dt * lam_st * lam_st
        denom = poly - half_dt * colb(fbar) * lam_st
        isd = jax.lax.rsqrt(jnp.abs(denom))

        mm_s = _make_mm(dt_, "bf16x3") if solve_prec == "bf16x3" else mm
        mml_s = lambda A, X: cat([mm_s(A, sl(X, b)) for b in R])

        def to_s_k(X):
            return mm_s(mml_s(Vxi, X), VyiT)

        def from_s_k(X):
            return mm_s(mml_s(Vx, X), VyT)

        def apply_At(yh):
            z = isd * yh
            w = to_s_k(fpp_n * from_s_k(lam_st * z))
            return isd * (poly * z - half_dt * w)

        bt = isd * to_s(rhs)
        y0 = to_s(p_next) / isd
        eps_div = jnp.asarray(1e-30, dt_)
        one = jnp.asarray(1.0, dt_)
        r0 = bt - apply_At(y0)
        bt2 = dots(bt, bt)
        floor2 = [(50.0 * eps_mach) ** 2 * jnp.maximum(bt2[b], eps_div)
                  for b in R]

        def body(_, carry):
            x, rr, p, v, rho, alpha, omega, best_x, best_r2 = carry
            rr2 = dots(rr, rr)
            active = [rr2[b] > floor2[b] for b in R]
            rho_new = dots(r0, rr)
            beta = [(rho_new[b] / (rho[b] + eps_div))
                    * (alpha[b] / (omega[b] + eps_div)) for b in R]
            p_n_ = rr + colb(beta) * (p - colb(omega) * v)
            v_n = apply_At(p_n_)
            rv = dots(r0, v_n)
            alpha_n = [rho_new[b] / (rv[b] + eps_div) for b in R]
            a_c = colb(alpha_n)
            s = rr - a_c * v_n
            tt_f = apply_At(s)
            ts_ = dots(tt_f, s)
            tt2 = dots(tt_f, tt_f)
            omega_n = [ts_[b] / (tt2[b] + eps_div) for b in R]
            o_c = colb(omega_n)
            x_n = x + a_c * p_n_ + o_c * s
            r_n_ = s - o_c * tt_f
            r2_n = dots(r_n_, r_n_)
            ok = [active[b] & jnp.isfinite(r2_n[b]) for b in R]
            better = [ok[b] & (r2_n[b] < best_r2[b]) for b in R]
            ok_c = colm(ok)
            sel = lambda a, bb_: jnp.where(ok_c, a, bb_)
            bx = jnp.where(colm(better), x_n, best_x)
            return (sel(x_n, x), sel(r_n_, rr), sel(p_n_, p), sel(v_n, v),
                    [jnp.where(ok[b], rho_new[b], rho[b]) for b in R],
                    [jnp.where(ok[b], alpha_n[b], alpha[b]) for b in R],
                    [jnp.where(ok[b], omega_n[b], omega[b]) for b in R],
                    bx,
                    [jnp.where(better[b], r2_n[b], best_r2[b]) for b in R])

        z = jnp.zeros_like(bt)
        ones = [one] * Bb
        init = (y0, r0, z, z, ones, ones, ones, y0, dots(r0, r0))
        out = jax.lax.fori_loop(0, n_trips, body, init)
        p_n = from_s(isd * out[7])

        q_n = -lap(p_n)
        den = gamma + half_dt
        r_n = ((gamma - half_dt) / den * r_next
               + half_dt / den * (q_n + q_next))

        skip = dt <= 1e-14
        p_n = jnp.where(skip, p_next, p_n)
        q_n = jnp.where(skip, q_next, q_n)
        r_n = jnp.where(skip, r_next, r_n)

        p_s[:] = p_n
        q_s[:] = q_n
        r_s[:] = r_n
        for b in R:
            r_out_ref[b, 0] = sl(r_n, b)

    return kernel


def adjoint_fused_2d_blocked(dts, phi_hist, phi_Q, phi_T, b1, b2,
                             Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, lam,
                             tau: float, gamma: float, c1: float, c2: float,
                             n_trips: int, interpret: bool = False,
                             solve_prec: str = "highest", block_b: int = 8):
    """Member-block-tiled batched 2D adjoint sweep (same contract as
    adjoint_fused_2d; B must divide by block_b)."""
    B, n, m = phi_T.shape
    M = phi_hist.shape[1] - 1
    assert dts.shape == (M,), (dts.shape, M)
    assert B % block_b == 0, (B, block_b)
    dtype = phi_T.dtype
    eps_mach = 2.2e-16 if dtype == jnp.float64 else 1.2e-7

    kernel = _adjoint_kernel_factory_blocked(
        M, float(tau), float(gamma), float(c1), float(c2), int(n_trips),
        eps_mach, int(block_b), n, m, solve_prec=solve_prec)

    Bb = block_b
    if _HAS_PLTPU:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx,
                                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((Bb * n, m), dtype)] * 3
        params = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 2**20)}
    else:  # pragma: no cover
        vmem = pl.BlockSpec()
        smem = pl.BlockSpec()
        vspec = lambda shape, idx: pl.BlockSpec(shape, idx)
        scratch = []
        params = {}

    rev = lambda g, t: (g, M - 1 - t, 0, 0)
    rev1 = lambda g, t: (g, M - t, 0, 0)
    r_rev = pl.pallas_call(
        kernel,
        grid=(B // Bb, M),
        in_specs=[
            smem, smem, smem,                          # dts, b1, b2
            vspec((Bb, 1, n, m), rev),                 # phi_n
            vspec((Bb, 1, n, m), rev1),                # phi_{n+1}
            vspec((Bb, 1, n, m), rev),                 # phi_Q_n
            vspec((Bb, 1, n, m), rev1),                # phi_Q_{n+1}
            vspec((Bb, n, m), lambda g, t: (g, 0, 0)),  # phi_T
            vmem, vmem,                                # Lx, LyT
            vmem, vmem, vmem, vmem,                    # transforms
            vmem,                                      # lam
        ],
        out_specs=vspec((Bb, 1, n, m), rev),
        out_shape=jax.ShapeDtypeStruct((B, M, n, m), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(dts, b1, b2, phi_hist, phi_hist, phi_Q, phi_Q, phi_T,
      Lx, LyT, Vx_inv, Vy_inv_T, Vx, VyT, lam)

    r_T = jnp.zeros((B, 1, n, m), dtype)
    return jnp.concatenate([r_rev, r_T], axis=1)
