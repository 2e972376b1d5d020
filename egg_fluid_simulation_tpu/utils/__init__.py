from . import log, mathx

__all__ = ["log", "mathx"]
