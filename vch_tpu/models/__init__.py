"""Forward (state) and adjoint PDE solvers for the viscous Cahn–Hilliard system."""
from vch_tpu.models.forward1d import ForwardSolver1D
from vch_tpu.models.adjoint1d import AdjointSolver1D

__all__ = ["ForwardSolver1D", "AdjointSolver1D"]


def __getattr__(name):
    if name == "ForwardSolver2D":
        from vch_tpu.models.forward2d import ForwardSolver2D
        return ForwardSolver2D
    if name == "AdjointSolver2D":
        from vch_tpu.models.adjoint2d import AdjointSolver2D
        return AdjointSolver2D
    raise AttributeError(name)
