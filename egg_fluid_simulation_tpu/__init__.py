"""egg_fluid_simulation_tpu — TPU-native egg-fluid XPBD simulation framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of
Clemapfel/egg_fluid_simulation (reference mounted at ``/root/reference``):
an XPBD particle solver simulating "egg" batches (white + yolk populations)
plus a metaball-style multi-pass renderer — redesigned for TPUs: fixed-capacity
SoA state in HBM, one jitted population-vmapped step, sort-based cell grids,
analytic Gaussian splatting, and ``shard_map`` spatial scale-out.

Public surface::

    from egg_fluid_simulation_tpu import (
        SimulationHandler, Path,
        default_white_config, default_yolk_config, fluid_config,
    )
"""

from .config import (default_white_config, default_yolk_config, fluid_config,
                     CONFIG_SCHEMA)
from .handler import SimulationHandler
from .ops.solver import SolverOptions
from .path import Path
from .state import ParticleState, StepStats, WHITE, YOLK

__version__ = "0.1.0"

__all__ = [
    "SimulationHandler", "SpatialHandler", "Path", "SolverOptions",
    "default_white_config", "default_yolk_config", "fluid_config",
    "CONFIG_SCHEMA", "ParticleState", "StepStats", "WHITE", "YOLK",
]


def __getattr__(name):
    # lazy: SpatialHandler pulls in parallel/spatial (shard_map machinery)
    # which single-chip users never need at import time
    if name == "SpatialHandler":
        from .parallel.spatial_handler import SpatialHandler
        return SpatialHandler
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
