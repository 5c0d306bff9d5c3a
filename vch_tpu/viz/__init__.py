"""Visualization & reporting suite (host-side matplotlib)."""
from vch_tpu.viz.plots import (
    plot_comparison_1d,
    plot_convergence,
    save_evolution_gif_1d,
    plot_final_imshow_2d,
    plot_surface_2d,
    generate_all_3d_plots_2d,
    plot_comparison_panels_2d,
    plot_mid_slice_comparison_2d,
    save_timelapse_2d,
    parameter_card,
    format_time_hms,
)

__all__ = [
    "plot_comparison_1d", "plot_convergence", "save_evolution_gif_1d",
    "plot_final_imshow_2d", "plot_surface_2d", "generate_all_3d_plots_2d",
    "plot_comparison_panels_2d",
    "plot_mid_slice_comparison_2d", "save_timelapse_2d", "parameter_card",
    "format_time_hms",
]
