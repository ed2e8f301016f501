"""Reference-trajectory layer: analytic profiles, SCVX, trajectory library
(reference surface: ``src/reference/scvx_interface.py:73-96``,
``trajectory_library.py:153-170``)."""

from .profiles import cubic_descent_reference, pad_reference
from .scvx import (
    SCVXConfig,
    SCVXSolution,
    SCVXSolver,
    SimpleSCVX,
    scvx_free_time,
    scvx_solve,
)
from .trajectory_library import (
    Trajectory,
    TrajectoryLibrary,
    TrajectoryMetadata,
    generate_trajectory_library,
)

__all__ = [
    "SCVXConfig",
    "SCVXSolution",
    "SCVXSolver",
    "SimpleSCVX",
    "Trajectory",
    "TrajectoryLibrary",
    "TrajectoryMetadata",
    "cubic_descent_reference",
    "generate_trajectory_library",
    "pad_reference",
    "scvx_free_time",
    "scvx_solve",
]
