"""Headless smoke tests for the visualization suite (files must be written
and non-empty; mirrors the reference's artifact set, visualization_3d.py)."""
import os

import numpy as np
import pytest

from vch_tpu.viz import (
    format_time_hms,
    parameter_card,
    plot_comparison_1d,
    plot_comparison_panels_2d,
    plot_convergence,
    plot_final_imshow_2d,
    plot_mid_slice_comparison_2d,
    plot_surface_2d,
    save_evolution_gif_1d,
    save_timelapse_2d,
)


def _nonempty(path):
    assert os.path.exists(path) and os.path.getsize(path) > 0, path


def test_format_time_hms():
    assert format_time_hms(3723.4) == "01:02:03"
    assert format_time_hms(59) == "00:00:59"


def test_1d_artifacts(tmp_path):
    x = np.linspace(0, 1, 33)
    phi_hist = 0.5 * np.sin(2 * np.pi * x)[None, :] * np.linspace(0, 1, 12)[:, None]
    t = np.linspace(0, 1, 12)
    _nonempty(plot_comparison_1d(x, phi_hist[0], 0.7 * np.sin(2 * np.pi * x),
                                 phi_hist[-1], path=str(tmp_path / "cmp.png")))
    _nonempty(plot_convergence([3, 2, 1], [0.5, 0.4], [0.6, 0.3],
                               path=str(tmp_path / "conv.png")))
    _nonempty(save_evolution_gif_1d(x, phi_hist, t, 0.7 * np.sin(2 * np.pi * x),
                                    path=str(tmp_path / "evo.gif"), skip=3))


def test_2d_artifacts(tmp_path):
    x = y = np.linspace(0, 1, 17)
    xx, yy = np.meshgrid(x, y, indexing="ij")
    phi = 0.7 * np.sin(2 * np.pi * xx) * np.cos(np.pi * yy)
    phi_hist = phi[None] * np.linspace(0, 1, 8)[:, None, None]
    t = np.linspace(0, 1, 8)
    _nonempty(plot_final_imshow_2d(phi, x, y, 1.0, path=str(tmp_path / "f.png")))
    _nonempty(plot_surface_2d(phi, x, y, "phi", str(tmp_path / "s.png")))
    _nonempty(plot_comparison_panels_2d(phi_hist[0], phi_hist[-1], phi, x, y,
                                        path=str(tmp_path / "p.png")))
    _nonempty(plot_mid_slice_comparison_2d(phi_hist[-1], phi, x, y,
                                           path=str(tmp_path / "m.png")))
    _nonempty(save_timelapse_2d(phi_hist, x, y, t,
                                path=str(tmp_path / "tl.gif"), max_frames=4))
    _nonempty(parameter_card({"Nx": 16, "T": 1.0}, path=str(tmp_path / "c.png")))


def test_3d_surface_suite(tmp_path):
    """The x4 3D-surface artifact suite the 2D driver emits (ref
    visualization_3d.py:82-112; wired into cli.cmd_optimize2d)."""
    from vch_tpu.viz import generate_all_3d_plots_2d
    x = y = np.linspace(0, 1, 17)
    xx, yy = np.meshgrid(x, y, indexing="ij")
    phi = 0.7 * np.sin(2 * np.pi * xx) * np.cos(np.pi * yy)
    paths = generate_all_3d_plots_2d(0.1 * phi, 0.5 * phi, phi, -phi, x, y,
                                     prefix=str(tmp_path) + "/")
    assert len(paths) == 4
    names = {os.path.basename(p) for p in paths}
    assert names == {"3d_plot_initial_state.png",
                     "3d_plot_natural_evolution.png",
                     "3d_plot_target_state.png",
                     "3d_plot_controlled_evolution.png"}
    for p in paths:
        _nonempty(p)
