"""Segment-checkpointed (sqrt-schedule) adjoint pipeline tests.

SURVEY.md section 7 'Memory at scale': O(M/K + K) live phi states instead of
O(M). Gate: the recomputing adjoint reproduces the full-memory adjoint to
machine precision."""
import numpy as np
import pytest

from vch_tpu.config import ForwardSolverConfig2D
from vch_tpu.control.targets import build_targets_2d
from vch_tpu.models.adjoint2d import AdjointSolver2D
from vch_tpu.models.forward2d import ForwardSolver2D
from vch_tpu.models.lowmem import LowMemPipeline2D


@pytest.mark.slow
def test_lowmem_adjoint_matches_full_memory():
    cfg = ForwardSolverConfig2D(Nx=24, Ny=24, T=0.2, dt_initial=1e-2)
    lp = LowMemPipeline2D(cfg, K=5)
    s = ForwardSolver2D(cfg)
    rng = np.random.default_rng(0)
    M = s.M
    u = 0.05 * rng.standard_normal((M + 1, 25, 25))
    phi_hist, (x, y), t = s.simulate(control=u)
    phi_T, phi_Q = build_targets_2d(x, y, t, np.asarray(phi_hist[0]),
                                    1.0, 1.0, cfg.T)
    adj = AdjointSolver2D(cfg)
    _, _, r_full = map(np.asarray,
                       adj.run(np.asarray(phi_hist), t, 5.0, 10.0,
                               phi_Q, phi_T))
    r_low = np.asarray(lp.adjoint_r(u, b1=5.0, b2=10.0, phi_Q=phi_Q,
                                    phi_T_target=phi_T))
    assert r_low.shape == r_full.shape
    assert np.abs(r_low - r_full).max() < 1e-12


def test_lowmem_requires_divisible_segments():
    with pytest.raises(AssertionError):
        LowMemPipeline2D(ForwardSolverConfig2D(Nx=16, Ny=16, T=0.1), K=7)
