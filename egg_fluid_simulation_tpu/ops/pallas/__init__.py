from . import sweep_kernel

__all__ = ["sweep_kernel"]
