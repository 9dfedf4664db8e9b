from .cylinder import CylinderCase
from .bfs import BackwardFacingStepCase

__all__ = ["CylinderCase", "BackwardFacingStepCase"]
