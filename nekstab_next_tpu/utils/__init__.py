from .noise import velocity_noise
from .diagnostics import (
    total_energy,
    total_enstrophy,
    boundary_quadrature,
    define_objects,
    surface_force_and_torque,
    zero_crossings,
    periods_from_signal,
    StepMonitor,
    SeriesWriter,
)

__all__ = [
    "velocity_noise",
    "total_energy",
    "total_enstrophy",
    "boundary_quadrature",
    "define_objects",
    "surface_force_and_torque",
    "zero_crossings",
    "periods_from_signal",
    "StepMonitor",
    "SeriesWriter",
]
