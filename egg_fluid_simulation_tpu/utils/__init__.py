from . import log, mathx, profiling

__all__ = ["log", "mathx", "profiling"]
