from .rotations import (
    rodrigues,
    matrix_to_quaternion,
    quaternion_to_axis_angle,
    matrix_to_axis_angle,
    sixd_to_matrix,
    transform_mat,
)
from .robust import gmof, gmof_residual
from .triangulate import triangulate, backproject_rays
from .alignment import umeyama
