from .gll import gll_points_weights, diff_matrix, lagrange_interp_matrix
from .mesh import Mesh2D, BoundaryCondition
from .mesh3 import Mesh3D, box_mesh_3d, build_mesh_3d
from .box import box_mesh_2d
from .cylinder import cylinder_mesh

__all__ = [
    "gll_points_weights",
    "diff_matrix",
    "lagrange_interp_matrix",
    "Mesh2D",
    "Mesh3D",
    "BoundaryCondition",
    "box_mesh_2d",
    "box_mesh_3d",
    "build_mesh_3d",
    "cylinder_mesh",
]
