"""Config persistence, dt schedule, checkpoint, and timer tests.

The reference has NO tests for config persistence or the interactive CLI
(SURVEY.md section 4 'coverage gaps'); these close that gap for our build.
"""
import json
import os

import numpy as np
import pytest

from vch_tpu.config import (
    ForwardSolverConfig1D,
    ForwardSolverConfig2D,
    OptimizationConfig,
    SimulationParameters,
    load_params,
    save_params,
)
from vch_tpu.models.timegrid import build_dt_schedule, t_history
from vch_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from vch_tpu.utils.timers import PhaseTimers


def test_config_validators():
    with pytest.raises(Exception):
        ForwardSolverConfig1D(c1=2.0, c2=1.0)     # c2 must exceed c1
    with pytest.raises(Exception):
        OptimizationConfig(u_min=1.0, u_max=-1.0)
    with pytest.raises(Exception):
        ForwardSolverConfig1D(dtype="float16")


def test_config_roundtrip_1d(tmp_path):
    p = str(tmp_path / "cfg.json")
    fwd = ForwardSolverConfig1D(N=64, T=0.5)
    opt = OptimizationConfig(b3=0.01)
    save_params(fwd, opt, 42, filepath=p)
    loaded = load_params(p)
    assert loaded.forward_solver.N == 64
    assert loaded.forward_solver.T == 0.5
    assert loaded.optimization.b3 == 0.01
    assert loaded.last_run_iterations == 42


def test_config_roundtrip_2d(tmp_path):
    p = str(tmp_path / "cfg2.json")
    fwd = ForwardSolverConfig2D(Nx=32, Ny=16)
    opt = OptimizationConfig.defaults_2d()
    save_params(fwd, opt, 7, filepath=p)
    loaded = load_params(p, two_d=True)
    assert loaded.forward_solver.Nx == 32
    assert loaded.forward_solver.Ny == 16
    assert loaded.optimization.b1 == 5.0    # 2D default


def test_load_params_missing_file(tmp_path):
    loaded = load_params(str(tmp_path / "nope.json"))
    assert isinstance(loaded, SimulationParameters)
    assert loaded.forward_solver.N == 128


def test_dt_schedule_exact_division():
    dts = build_dt_schedule(1.0, 1e-2)
    assert len(dts) == 100
    assert np.allclose(dts, 1e-2)
    t = t_history(dts, 1.0)
    assert t[0] == 0.0 and abs(t[-1] - 1.0) < 1e-12


def test_dt_schedule_partial_last_step():
    dts = build_dt_schedule(0.25, 0.1)
    # 0.1 + 0.1 + 0.05 (+ float-accumulation remainder semantics)
    assert abs(sum(dts) - 0.25) < 1e-12
    assert dts[-1] <= 0.1 + 1e-15


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "ckpt.npz")
    state = {"u": np.random.default_rng(0).standard_normal((3, 4)),
             "alpha": np.asarray([1.5, 2.0])}
    meta = {"iteration": 12, "converged": False}
    save_checkpoint(p, state, meta)
    s2, m2 = load_checkpoint(p)
    assert np.array_equal(s2["u"], state["u"])
    assert np.array_equal(s2["alpha"], state["alpha"])
    assert m2 == meta


def test_phase_timers_report():
    t = PhaseTimers()
    with t.phase("solve"):
        pass
    t.add("solve", 1.0)
    text = t.report()
    assert "solve" in text
    assert t.counts["solve"] == 2


def test_cli_show_control(tmp_path, capsys):
    """CLI smoke test: the read-data-file equivalent."""
    import numpy as np
    from vch_tpu.cli import main
    p = str(tmp_path / "u.npy")
    np.save(p, np.zeros((5, 9)))
    assert main(["show-control", p]) == 0
    out = capsys.readouterr().out
    assert "sparsity=100.00% zeros" in out


def test_cli_parser_has_all_entry_points():
    from vch_tpu.cli import main
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        main(["--help"])
