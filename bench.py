"""Headline benchmark: batched 2D PGD scenario-iterations per second.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric (BASELINE.md primary): PGD outer iterations/s on the 2D vCH control
problem, counted in SCENARIO-iterations (batch members x PGD iterations) per
second on one chip. The baseline is the reference NumPy/SciPy implementation
measured on CPU at the same grid/horizon (BASELINE_MEASURED.json, produced by
scripts/ref_baseline_2d.py running the actual reference code): it processes
1/pgd_iter_s_mean scenario-iterations per second (single scenario, its only
mode). vs_baseline = ours / reference.

Env overrides: VCH_BENCH_N (grid, default 64), VCH_BENCH_BATCH (default 512
— the fused whole-march kernel runs each member's own Newton trip counts, so
single-chip throughput scales with batch to ~B=512 instead of peaking at the
old lockstep B=32; see WEAK_SCALING.json tpu_batch_scaling), VCH_BENCH_ITERS
(default 20 — the SAME protocol as the baseline denominator, which is the
mean over a 20-iteration reference run; a 3-iteration window front-loads
the hardest line searches and under-reports steady state by ~1.5x),
VCH_BENCH_DTYPE (default float32 on TPU).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    # persistent compilation cache: the nested scan/while programs are
    # expensive to compile through the TPU compile service; cache them.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
    import jax

    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # Defaults match programs already compiled through the axon compile
    # service (it caches by program hash server-side; the local
    # JAX_COMPILATION_CACHE_DIR is set for non-axon environments).
    # VCH_BENCH_PROFILE=config4 reproduces the BASELINE.md primary-metric
    # measurement (2D 128x128, B=128 full-memory fused path, 20-iteration
    # protocol — BENCH_RESULTS.json config_4); explicit VCH_BENCH_N /
    # VCH_BENCH_BATCH still override.
    profile = os.environ.get("VCH_BENCH_PROFILE", "")
    prof_n, prof_b = ("128", "128") if profile == "config4" else ("64", "512")
    N = int(os.environ.get("VCH_BENCH_N", prof_n))
    B = int(os.environ.get("VCH_BENCH_BATCH", prof_b))
    iters = int(os.environ.get("VCH_BENCH_ITERS", "20"))
    on_tpu = jax.default_backend() != "cpu"
    dtype = os.environ.get("VCH_BENCH_DTYPE",
                           "float32" if on_tpu else "float64")
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    from vch_tpu.config import ForwardSolverConfig2D
    from vch_tpu.parallel.batch import BatchedProblem2D, sweep_2d

    # f32 forward solves auto-resolve to 'high' matmul precision (descent
    # verified on-chip, 16% faster than 'highest'); override here if needed.
    fwd_prec = os.environ.get("VCH_BENCH_FWD_PRECISION", "high") or None
    kf = os.environ.get("VCH_BENCH_KRYLOV_FIXED")
    at = os.environ.get("VCH_BENCH_ADJ_TRIPS")
    cfg = ForwardSolverConfig2D(
        Nx=N, Ny=N, T=1.0, dtype=dtype,
        newton_tol=2e-4 if dtype == "float32" else 1e-6,
        forward_matmul_precision=fwd_prec,
        **({"krylov_fixed_iters": int(kf),
            "fused_krylov_fixed_iters": int(kf)} if kf else {}),
        **({"adjoint_krylov_fixed_iters": int(at)} if at else {}),
        **({"fused_solve_precision": os.environ["VCH_BENCH_SOLVE_PREC"]}
           if os.environ.get("VCH_BENCH_SOLVE_PREC") else {}),
        # opt-in bf16x3 adjoint Krylov dots (+5.6% end-to-end, gradient at
        # the f32 noise floor but run-to-run cost comparability suffers —
        # see config.adjoint_solve_precision)
        **({"adjoint_solve_precision": os.environ["VCH_BENCH_ADJ_PREC"]}
           if os.environ.get("VCH_BENCH_ADJ_PREC") else {}))
    # VCH_BENCH_SEARCH selects the line-search scheduler; all three are
    # identical-semantics and parity-gated in tests/test_parallel.py:
    #   "plain" (default) — masked full-batch rounds; fastest measured at
    #             the committed defaults (22.7 it/s vs 15.2 speculative,
    #             64x64 B=32 on-chip).
    #   "spec"   — speculative ladder packing (idle rows evaluate several
    #             backtracking candidates per straggler per round).
    #   "straggler" — sub-batch compaction (size VCH_BENCH_STRAGGLER,
    #             default B/4; extra compile at the sub-shape).
    sb_env = os.environ.get("VCH_BENCH_STRAGGLER", "")
    sb = sb_env if sb_env == "auto" else int(sb_env or "0")
    mode = os.environ.get("VCH_BENCH_SEARCH", "plain")
    if mode == "straggler" and sb == 0:
        sb = max(1, B // 4)
    # VCH_BENCH_CHUNK=k: chunked execution (k members per device call) —
    # bounds the vmapped while_loop lockstep cost at large B
    ck = int(os.environ.get("VCH_BENCH_CHUNK", "0"))
    prob = BatchedProblem2D(cfg,
                            straggler_batch=(sb if sb == "auto"
                                             else (sb if sb > 0 else None)),
                            speculative=(mode == "spec" and sb == 0),
                            chunk_size=ck if ck > 0 else None)
    b3s = np.linspace(5e-5, 2e-4, max(1, B // 4))
    kss = np.linspace(5e-5, 2e-4, 4)[: max(1, min(4, B))]
    sc = sweep_2d(cfg, b3_values=b3s, kappa_values=kss)
    # trim/pad to exactly B
    import dataclasses
    reps = -(-B // sc.batch)
    tile = lambda a: np.concatenate([a] * reps, axis=0)[:B]
    sc = dataclasses.replace(
        sc, phi0=tile(sc.phi0), phi_T=tile(sc.phi_T), phi_Q=tile(sc.phi_Q),
        b1=tile(sc.b1), b2=tile(sc.b2), b3=tile(sc.b3),
        kappa_spar=tile(sc.kappa_spar))

    # Stage the scenario arrays on-device once (a real optimization keeps
    # them resident for hundreds of iterations; phi_Q alone is ~100 MB at
    # B=8 and re-uploading it per run() would bill the axon host->device
    # tunnel, not the solver).
    import jax.numpy as jnp
    dt_j = jnp.float32 if dtype == "float32" else jnp.float64
    stage = lambda a: jax.device_put(jnp.asarray(a, dt_j))
    sc = dataclasses.replace(
        sc, phi0=stage(sc.phi0), phi_T=stage(sc.phi_T), phi_Q=stage(sc.phi_Q),
        b1=stage(sc.b1), b2=stage(sc.b2), b3=stage(sc.b3),
        kappa_spar=stage(sc.kappa_spar))

    # warmup (compile + 1 iteration; prewarm compiles the straggler-bucket
    # trial shapes the masked search can gather into)
    prob.run(sc, max_iter=1, verbose=False)
    prob.prewarm(sc)
    t0 = time.perf_counter()
    out = prob.run(sc, max_iter=iters, verbose=False,
                   host_results=False)
    elapsed = time.perf_counter() - t0
    assert np.all(np.isfinite(out["cost_history"]))
    # A failed line search legitimately keeps a worse iterate for a member
    # (reference semantics, GD_1D.py:110-113); report descent diagnostics
    # on stderr rather than gating the throughput metric on them.
    descend_frac = float(
        (out["cost_history"][-1] < out["cost_history"][0] + 1e-9).mean())
    print(f"[bench] mean cost {out['cost_history'][0].mean():.4f} -> "
          f"{out['cost_history'][-1].mean():.4f}, descend_frac "
          f"{descend_frac:.2f}", file=sys.stderr)

    value = B * iters / elapsed

    # BASELINE.md primary counter: Newton solves/s/chip, MEASURED from the
    # Newton while_loop trip counts accumulated across every forward solve
    # the timed run performed (baseline forward + all line-search trials).
    from vch_tpu.utils.profiling import SolveCounters
    counters = SolveCounters(time_steps=prob.solver.M, batch=B)
    counters.record(pgd_iters=iters, elapsed_s=elapsed,
                    newton_solves=int(out["newton_solves"]))
    print(f"[bench] {counters.summary()}", file=sys.stderr)
    print(f"[bench] timers {out['timers']}", file=sys.stderr)
    # XLA buffer-assignment memory accounting of the trial program (the
    # run's peak-memory program); axon's runtime memory_stats() is
    # unimplemented, so this is the measured envelope.
    try:
        pm = prob.trial_memory_analysis(sc)
        if pm:
            print(f"[bench] trial program memory: "
                  f"peak {pm['peak_memory_in_bytes']/2**30:.2f} GiB "
                  f"(args {pm['argument_size_in_bytes']/2**30:.2f}, "
                  f"temp {pm['temp_size_in_bytes']/2**30:.2f})",
                  file=sys.stderr)
    except Exception as e:  # never fail the metric on accounting
        print(f"[bench] memory analysis unavailable: {e}", file=sys.stderr)

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as f:
            ref = json.load(f)
        key = f"2d_n{N}"
        if key in ref and ref[key].get("pgd_iter_s_mean"):
            baseline = 1.0 / ref[key]["pgd_iter_s_mean"]
    except Exception:
        pass

    result = {
        "metric": f"pgd_scenario_iters_per_s_2d_{N}x{N}_b{B}_{dtype}",
        "value": round(value, 4),
        "unit": "scenario-iters/s",
        "vs_baseline": (round(value / baseline, 2) if baseline else None),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
