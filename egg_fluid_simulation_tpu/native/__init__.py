"""Native (C++) components: build-on-first-use ctypes bindings.

``NativeOracle`` wraps oracle.cpp — the reference solver's exact sequential
semantics compiled with -O3. It exists for fidelity gating at particle counts
the pure-Python oracle can't reach (100x+ faster), and serves as the host-side
golden model the jitted TPU step is validated against.

The shared library is compiled with the system g++ on first import and cached
next to the source (keyed by source mtime), so no build step is required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..utils import log

__all__ = ["NativeOracle", "load_library", "available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "oracle.cpp")
_LIB = os.path.join(_HERE, "liboracle.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        log.error("native oracle build failed:\n", proc.stderr)


def load_library() -> ctypes.CDLL:
    """Compile (if stale) and load the native oracle library."""
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.oracle_abi_version.restype = ctypes.c_int
    if lib.oracle_abi_version() != 1:
        log.error("native oracle ABI mismatch")
    d = ctypes.POINTER(ctypes.c_double)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.oracle_step.argtypes = [d] * 9 + [i32, ctypes.c_int, d, d, d,
                                          ctypes.c_double, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int]
    lib.oracle_step.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


_CFG_KEYS = ["damping", "follow_strength", "cohesion_strength",
             "cohesion_interaction_distance_factor", "collision_strength",
             "collision_overlap_factor", "min_mass", "max_mass",
             "min_radius", "max_radius"]


class NativeOracle:
    """Sequential golden-model simulation of ONE population (white or yolk).

    Mirrors the per-population slice of tests/oracle.py's ``OracleSim`` with
    identical semantics; state lives in float64 numpy arrays.
    """

    def __init__(self, cfg: dict, max_batches: int = 256):
        self.cfg = {k: float(cfg[k]) for k in _CFG_KEYS}
        self.lib = load_library()
        self.n = 0
        for name in ("x", "y", "px", "py", "vx", "vy", "radius", "mass_t",
                     "inv_mass"):
            setattr(self, name, np.zeros(0, np.float64))
        self.batch = np.zeros(0, np.int32)
        self.targets = np.zeros((max_batches, 2), np.float64)
        self.follow_radius = np.ones(max_batches, np.float64)

    def add_particles(self, pos, mass_t, batch_id: int,
                      batch_radius: float, target) -> None:
        pos = np.asarray(pos, np.float64)
        mass_t = np.asarray(mass_t, np.float64)
        n = len(pos)
        mass = np.maximum(self.cfg["min_mass"] * (1 - mass_t)
                          + self.cfg["max_mass"] * mass_t, 1e-12)
        radius = (self.cfg["min_radius"] * (1 - mass_t)
                  + self.cfg["max_radius"] * mass_t)
        self.x = np.concatenate([self.x, pos[:, 0]])
        self.y = np.concatenate([self.y, pos[:, 1]])
        self.px = np.concatenate([self.px, pos[:, 0]])
        self.py = np.concatenate([self.py, pos[:, 1]])
        self.vx = np.concatenate([self.vx, np.zeros(n)])
        self.vy = np.concatenate([self.vy, np.zeros(n)])
        self.radius = np.concatenate([self.radius, radius])
        self.mass_t = np.concatenate([self.mass_t, mass_t])
        self.inv_mass = np.concatenate([self.inv_mass, 1.0 / mass])
        self.batch = np.concatenate([self.batch,
                                     np.full(n, batch_id, np.int32)])
        self.targets[batch_id] = target
        self.follow_radius[batch_id] = np.sqrt(max(batch_radius, 0.0))
        self.n += n

    def set_target(self, batch_id: int, x: float, y: float) -> None:
        self.targets[batch_id] = (x, y)

    def step(self, delta: float = 1 / 60, n_substeps: int = 2,
             n_collision_steps: int = 3, clean_hash: bool = True) -> None:
        cfg10 = np.asarray([self.cfg[k] for k in _CFG_KEYS], np.float64)
        d = ctypes.POINTER(ctypes.c_double)

        def ptr(a):
            return a.ctypes.data_as(d)

        self.lib.oracle_step(
            ptr(self.x), ptr(self.y), ptr(self.px), ptr(self.py),
            ptr(self.vx), ptr(self.vy), ptr(self.radius), ptr(self.mass_t),
            ptr(self.inv_mass),
            self.batch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.n, ptr(cfg10), ptr(self.targets), ptr(self.follow_radius),
            float(delta), int(n_substeps), int(n_collision_steps),
            int(bool(clean_hash)))

    @property
    def positions(self) -> np.ndarray:
        return np.stack([self.x, self.y], axis=-1)
