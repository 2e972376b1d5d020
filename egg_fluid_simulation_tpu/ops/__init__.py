from . import grid, render, solver

__all__ = ["grid", "render", "solver"]
