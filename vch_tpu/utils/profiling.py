"""Profiler integration + solver throughput counters.

The reference's only tracing is printed wall-clock accumulators
(GD_1D.py:563-576). TPU equivalents here:
  - `trace(logdir)`: context manager around `jax.profiler` producing
    TensorBoard-loadable device traces of the jitted solvers.
  - `SolveCounters`: derives the BASELINE.md north-star counters
    (Newton solves/s/chip, PGD scenario-iterations/s) from phase timings
    and the solver's static step counts.
"""
from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass


@contextmanager
def trace(logdir: str = "/tmp/vch_tpu_trace"):
    """Capture a jax.profiler device trace around a block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclass
class SolveCounters:
    """Throughput accounting for a batched PGD run.

    newton_iters_per_step is an estimate (or measured mean) of Newton
    iterations per time step; the forward solve of one scenario then
    performs M * newton_iters_per_step Newton linear solves.
    """

    time_steps: int
    batch: int
    newton_iters_per_step: float = 3.0
    forwards_per_pgd_iter: float = 1.0   # optimistic accept; +trials otherwise
    pgd_iters: int = 0
    elapsed_s: float = 0.0

    def record(self, pgd_iters: int, elapsed_s: float,
               mean_trials: float = 1.0):
        self.pgd_iters += pgd_iters
        self.elapsed_s += elapsed_s
        self.forwards_per_pgd_iter = mean_trials

    @property
    def scenario_iters_per_s(self) -> float:
        return (self.batch * self.pgd_iters / self.elapsed_s
                if self.elapsed_s > 0 else 0.0)

    @property
    def newton_solves_per_s(self) -> float:
        solves = (self.batch * self.pgd_iters * self.forwards_per_pgd_iter
                  * self.time_steps * self.newton_iters_per_step)
        return solves / self.elapsed_s if self.elapsed_s > 0 else 0.0

    def summary(self) -> dict:
        return {
            "pgd_scenario_iters_per_s": round(self.scenario_iters_per_s, 4),
            "newton_solves_per_s": round(self.newton_solves_per_s, 1),
            "batch": self.batch,
            "pgd_iters": self.pgd_iters,
            "elapsed_s": round(self.elapsed_s, 3),
        }
