from . import grid, solver

__all__ = ["grid", "solver"]
