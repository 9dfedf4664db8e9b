from .gll import gll_points_weights, diff_matrix, lagrange_interp_matrix
from .mesh import Mesh2D, BoundaryCondition
from .box import box_mesh_2d
from .cylinder import cylinder_mesh

__all__ = [
    "gll_points_weights",
    "diff_matrix",
    "lagrange_interp_matrix",
    "Mesh2D",
    "BoundaryCondition",
    "box_mesh_2d",
    "cylinder_mesh",
]
