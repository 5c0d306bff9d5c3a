"""Fused whole-march Pallas kernel (ops/pallas_march.py) parity tests.

Interpret mode on CPU (conftest forces the cpu platform); the same kernel
compiles on-chip — on-TPU parity and throughput are recorded in
BENCH_RESULTS.json (fused_march_onchip).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vch_tpu.config import DELTA_SEP, ForwardSolverConfig2D
from vch_tpu.models.forward2d import ForwardSolver2D
from vch_tpu.ops.pallas_march import march_fused_2d
from vch_tpu.ops.potential import init_phi_random_2d


def _solver(N=16, T=0.06, **kw):
    # pin the fused kernel to the scan path's trip count and full-precision
    # solve dots so the parity tests compare the SAME Krylov arithmetic
    # (production defaults are 3 trips + bf16x3 solve dots — measured
    # pure-throughput choices whose slack the Newton loop absorbs; see
    # config.fused_krylov_fixed_iters / fused_solve_precision)
    kw.setdefault("fused_krylov_fixed_iters", 4)
    kw.setdefault("fused_solve_precision", "highest")
    cfg = ForwardSolverConfig2D(Nx=N, Ny=N, T=T, dtype="float32",
                                newton_tol=2e-4, **kw)
    s = ForwardSolver2D(cfg)
    # force the same fixed-trip spectral Krylov path the fused kernel uses
    s._use_pallas = True
    s._pallas_interpret = True
    return s


def _batch(solver, B=2, amp=0.1, useed=0):
    N = solver.config.Nx
    M = solver.M
    rng = np.random.default_rng(useed)
    phi0 = np.stack([init_phi_random_2d(N, N, DELTA_SEP, amp=amp,
                                        seed=42 + i) for i in range(B)])
    u = 0.1 * rng.standard_normal((B, M + 1, N + 1, N + 1))
    return (jnp.asarray(phi0, solver.dtype), jnp.asarray(u, solver.dtype))


def _fused(solver, u, phi0):
    return solver.march_fused_batch(u, phi0, interpret=True)


def test_fused_march_matches_scan_path():
    solver = _solver()
    phi0, u = _batch(solver, B=2)
    phi_ref, st = jax.vmap(lambda uu, p0: solver._march_impl(uu, p0))(u, phi0)
    phi_f, ns, bad = _fused(solver, u, phi0)
    assert phi_f.shape == phi_ref.shape
    diff = np.abs(np.asarray(phi_f) - np.asarray(phi_ref)).max()
    # same Krylov path + same tolerances: CPU f32 agreement is roundoff-level
    assert diff < 1e-5, diff
    assert int(np.asarray(ns).sum()) == int(np.asarray(st.newton_solves).sum())
    assert (np.asarray(bad) == -1).all()


def test_fused_march_zero_control_mass_conservation():
    solver = _solver()
    phi0, u = _batch(solver, B=2)
    u = jnp.zeros_like(u)
    phi_f, ns, bad = _fused(solver, u, phi0)
    wts = np.asarray(solver._wts_h)
    mass = (wts * np.asarray(phi_f)).sum(axis=(-2, -1))
    m0 = (wts * np.asarray(phi0)).sum(axis=(-2, -1))
    assert np.abs(mass - m0[:, None]).max() < 1e-5
    assert (np.asarray(bad) == -1).all()


def test_fused_march_sanitizer_flags_nonfinite():
    solver = _solver(newton_max_iter=3)
    phi0, u = _batch(solver, B=2)
    # a poisoned state makes the mass defect non-finite immediately (a NaN
    # CONTROL is absorbed by the Armijo best-trial fallback, which keeps the
    # previous finite phi — same semantics as the scan path / the reference's
    # in-Newton mass check, Forward_solver.py:166-172)
    phi0 = phi0.at[1, 3, 3].set(jnp.nan)
    phi_f, ns, bad = _fused(solver, u, phi0)
    bad = np.asarray(bad)
    assert bad[0] == -1
    assert bad[1] == 0           # flagged at the first step


def test_batched_pgd_fused_matches_reference_path():
    cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.06, dtype="float32",
                                newton_tol=2e-4, fused_krylov_fixed_iters=4,
                                fused_solve_precision="highest")
    from vch_tpu.parallel.batch import BatchedProblem2D, sweep_2d
    sc = sweep_2d(cfg, b3_values=[1e-4, 2e-4], kappa_values=[5e-5])
    out0 = BatchedProblem2D(cfg, fused_march=False).run(
        sc, max_iter=3, verbose=False)
    prob = BatchedProblem2D(cfg, fused_march=True)
    assert prob._use_fused_march
    out1 = prob.run(sc, max_iter=3, verbose=False)
    c0, c1 = out0["cost_history"], out1["cost_history"]
    rel = np.abs(c1 - c0) / np.abs(c0)
    assert rel.max() < 2e-4, rel.max()
    assert out1["newton_solves"] == out0["newton_solves"]


def _solver_1d(N=64, T=0.06, **kw):
    from vch_tpu.config import ForwardSolverConfig1D
    from vch_tpu.models.forward1d import ForwardSolver1D
    cfg = ForwardSolverConfig1D(N=N, T=T, dtype="float32", newton_tol=2e-4,
                                linsolve_1d="spectral", **kw)
    return ForwardSolver1D(cfg)


def test_fused_march_1d_matches_scan_path():
    from vch_tpu.ops.potential import init_phi_random_1d
    solver = _solver_1d()
    N, M, B = solver.config.N, solver.M, 3
    rng = np.random.default_rng(0)
    phi0 = np.stack([init_phi_random_1d(N, DELTA_SEP, amp=0.01, seed=42 + i)
                     for i in range(B)])
    u = jnp.asarray(0.05 * rng.standard_normal((B, M + 1, N + 1)),
                    solver.dtype)
    phi0 = jnp.asarray(phi0, solver.dtype)
    phi_ref, st = jax.vmap(solver._march_impl)(u, phi0)
    phi_f, ns, bad = solver.march_fused_batch(u, phi0, interpret=True)
    diff = np.abs(np.asarray(phi_f) - np.asarray(phi_ref)).max()
    # raw-basis (scan) vs spectral-basis (fused) Krylov paths: agreement is
    # gated by the Newton tolerance, not bitwise
    assert diff < 5e-4, diff
    ns_ref = int(np.asarray(st.newton_solves).sum())
    ns_f = int(np.asarray(ns).sum())
    assert abs(ns_f - ns_ref) <= 0.1 * ns_ref + 3, (ns_f, ns_ref)
    assert (np.asarray(bad) == -1).all()
    # mass conservation through the uniform projection
    wts = np.asarray(solver._wts_h)
    mass = (wts * np.asarray(phi_f)).sum(axis=-1)
    m0 = (wts * np.asarray(phi0)).sum(axis=-1)
    assert np.abs(mass - m0[:, None]).max() < 1e-5


def test_batched_pgd_1d_fused_matches_reference_path():
    from vch_tpu.config import ForwardSolverConfig1D
    from vch_tpu.parallel.batch import BatchedProblem1D, sweep_1d
    cfg = ForwardSolverConfig1D(N=64, T=0.06, dtype="float32",
                                newton_tol=2e-4, linsolve_1d="spectral")
    sc = sweep_1d(cfg, b3_values=[1e-3, 5e-3], kappa_values=[5e-5])
    out0 = BatchedProblem1D(cfg, fused_march=False).run(
        sc, max_iter=3, verbose=False)
    prob = BatchedProblem1D(cfg, fused_march=True)
    assert prob._use_fused_march
    out1 = prob.run(sc, max_iter=3, verbose=False)
    rel = (np.abs(out1["cost_history"] - out0["cost_history"])
           / np.abs(out0["cost_history"]))
    assert rel.max() < 5e-4, rel.max()


def test_fused_march_bf16x3_solve_cost_level_parity():
    # the production default (bf16x3 solve dots) must stay cost-level
    # equivalent to the full-precision solve: the residual/Armijo gate is
    # untouched, so only the Krylov direction differs
    s_hi = _solver()                               # pinned highest
    s_b3 = _solver(fused_solve_precision="bf16x3")
    phi0, u = _batch(s_hi, B=2)
    hi, ns_hi, _ = _fused(s_hi, u, phi0)
    b3, ns_b3, _ = _fused(s_b3, u, phi0)
    diff = np.abs(np.asarray(hi) - np.asarray(b3)).max()
    assert diff < 5e-3, diff
    # Newton-solve totals stay the same order (tiny 16x16 configs sit at
    # the f32 noise floor where a handful of extra iterations is normal;
    # at production scale the measured overhead is +0.02% over 20 PGD
    # iterations on-chip)
    tot_hi = int(np.asarray(ns_hi).sum())
    tot_b3 = int(np.asarray(ns_b3).sum())
    assert abs(tot_b3 - tot_hi) <= 0.5 * tot_hi + 4, (tot_b3, tot_hi)


def test_make_batched_problem_2d_memory_chooser():
    from vch_tpu.parallel.batch import (BatchedProblem2D,
                                        LowMemBatchedProblem2D,
                                        make_batched_problem_2d)
    cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.06, dtype="float32",
                                newton_tol=2e-4)
    lim = 16 * 2**30
    small = make_batched_problem_2d(cfg, batch=8, hbm_limit_bytes=lim)
    assert isinstance(small, BatchedProblem2D)
    # a batch whose 7x trajectory footprint exceeds 75% of the limit
    big = make_batched_problem_2d(cfg, batch=2_000_000,
                                  hbm_limit_bytes=lim)
    assert isinstance(big, LowMemBatchedProblem2D)


def test_fused_march_nonuniform_final_dt():
    # T=0.05 with dt=0.02 -> schedule [0.02, 0.02, 0.01] exercises the
    # per-step SMEM dt read
    solver = _solver(N=16, T=0.05, dt_initial=0.02)
    assert len(np.unique(solver.dts)) == 2
    phi0, u = _batch(solver, B=2)
    phi_ref, _ = jax.vmap(lambda uu, p0: solver._march_impl(uu, p0))(u, phi0)
    phi_f, _, _ = _fused(solver, u, phi0)
    assert np.abs(np.asarray(phi_f) - np.asarray(phi_ref)).max() < 1e-5


def test_adjoint_fused_bf16x3_solve_matches_highest():
    """The opt-in bf16x3 Krylov dots in the fused adjoint (hi/lo-split
    three-dot f32 emulation, config.adjoint_solve_precision) must track
    the highest-precision kernel to f32 roundoff in interpret mode."""
    import jax
    import jax.numpy as jnp
    from vch_tpu.models.adjoint2d import AdjointSolver2D

    solver = _solver(T=0.04)
    phi0, u = _batch(solver, B=2)
    phi, _, _ = _fused(solver, u, phi0)
    dts = jnp.asarray(solver.dts, solver.dtype)
    b1 = jnp.full((2,), 5.0, solver.dtype)
    b2 = jnp.full((2,), 10.0, solver.dtype)
    phi_Q = jnp.zeros_like(phi)
    phi_T = jnp.zeros_like(phi0)
    outs = {}
    for prec in ("highest", "bf16x3"):
        cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.04, dtype="float32",
                                    newton_tol=2e-4,
                                    adjoint_solve_precision=prec)
        adj = AdjointSolver2D(cfg)
        outs[prec] = np.asarray(adj.adjoint_fused_batch(
            phi, dts, b1, b2, phi_Q, phi_T, interpret=True))
    scale = np.abs(outs["highest"]).max()
    diff = np.abs(outs["highest"] - outs["bf16x3"]).max()
    assert diff < 5e-4 * max(scale, 1e-30), diff / scale


def test_fused_march_blocked_matches_per_member():
    """The member-block-tiled kernel (config.fused_march_block) must agree
    with the per-member fused kernel member-for-member: same arithmetic per
    row (stacked right-multiplies / pipelined slice left-multiplies are
    row-wise identical contractions), lockstep masking makes extra
    in-block trips exact no-ops, and the measured Newton-solve counters
    must be EQUAL (the blocked kernel counts only active members)."""
    solver = _solver()
    phi0, u = _batch(solver, B=4, useed=3)
    phi_ref, ns_ref, bad_ref = _fused(solver, u, phi0)

    solver_b = _solver(fused_march_block=2)
    phi_b, ns_b, bad_b = solver_b.march_fused_batch(u, phi0, interpret=True)

    diff = np.abs(np.asarray(phi_b) - np.asarray(phi_ref)).max()
    assert diff < 1e-5, diff
    np.testing.assert_array_equal(np.asarray(ns_b), np.asarray(ns_ref))
    assert (np.asarray(bad_b) == -1).all()


def test_fused_march_blocked_indivisible_falls_back():
    """B not divisible by the block size routes to the per-member kernel."""
    solver_b = _solver(fused_march_block=2)
    phi0, u = _batch(solver_b, B=3, useed=4)
    phi_b, ns_b, _ = solver_b.march_fused_batch(u, phi0, interpret=True)
    solver = _solver()
    phi_ref, ns_ref, _ = _fused(solver, u, phi0)
    np.testing.assert_array_equal(np.asarray(ns_b), np.asarray(ns_ref))
    assert np.abs(np.asarray(phi_b) - np.asarray(phi_ref)).max() == 0.0


def test_adjoint_fused_blocked_matches_per_member():
    """The member-block-tiled adjoint kernel must track the per-member
    fused adjoint to f32 roundoff, member for member, with per-member
    (b1, b2) weights exercised."""
    import jax.numpy as jnp
    from vch_tpu.models.adjoint2d import AdjointSolver2D

    solver = _solver(T=0.04)
    phi0, u = _batch(solver, B=4, useed=5)
    phi, _, _ = _fused(solver, u, phi0)
    dts = jnp.asarray(solver.dts, solver.dtype)
    b1 = jnp.asarray([5.0, 2.0, 7.5, 4.0], solver.dtype)
    b2 = jnp.asarray([10.0, 12.0, 8.0, 9.0], solver.dtype)
    phi_Q = jnp.zeros_like(phi)
    phi_T = 0.1 * phi0
    outs = {}
    for bb in (0, 2):
        cfg = ForwardSolverConfig2D(Nx=16, Ny=16, T=0.04, dtype="float32",
                                    newton_tol=2e-4, fused_march_block=bb)
        adj = AdjointSolver2D(cfg)
        outs[bb] = np.asarray(adj.adjoint_fused_batch(
            phi, dts, b1, b2, phi_Q, phi_T, interpret=True))
    scale = np.abs(outs[0]).max()
    diff = np.abs(outs[0] - outs[2]).max()
    assert diff < 1e-5 * max(scale, 1e-30), diff / scale


def test_fused_march_block_auto_rule():
    """The auto rule (fused_march_block=None) resolves to 8 for grids up
    to 96 points and 0 above — the measured crossover (blocked wins 1.14x
    forward / 1.44x adjoint at 64x64, loses 0.71x/0.99x at 128x128;
    BENCH_RESULTS blocked_march_onchip)."""
    assert ForwardSolverConfig2D(Nx=64, Ny=64).resolved_fused_block() == 8
    assert ForwardSolverConfig2D(Nx=96, Ny=64).resolved_fused_block() == 8
    assert ForwardSolverConfig2D(Nx=128, Ny=128).resolved_fused_block() == 0
    assert ForwardSolverConfig2D(Nx=64, Ny=128).resolved_fused_block() == 0
    # explicit values pass through
    assert ForwardSolverConfig2D(Nx=64, Ny=64,
                                 fused_march_block=0).resolved_fused_block() == 0
    assert ForwardSolverConfig2D(Nx=128, Ny=128,
                                 fused_march_block=4).resolved_fused_block() == 4
