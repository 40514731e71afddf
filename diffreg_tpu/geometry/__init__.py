from .se3 import apply_transform, compose, inverse, rotation_error_deg, translation_error
from .procrustes import ProcrustesResult, soft_procrustes, weighted_kabsch
from .deformation import (apply_embedded_deformation,
                          apply_embedded_deformation_dense,
                          non_rigid_icp_adam, non_rigid_icp_gauss_newton)
from .so3 import (alignment_rotation_matrix, apply_rotation,
                  axis_angle_to_quaternion, axis_angle_to_rotation_matrix,
                  quaternion_conjugate, quaternion_product, quaternion_rotate,
                  quaternion_to_axis_angle, quaternion_to_matrix,
                  rodrigues_rotation_formula, rotation_matrix_to_axis_angle,
                  skew_symmetric_matrix)

__all__ = [
    "apply_embedded_deformation",
    "apply_embedded_deformation_dense",
    "non_rigid_icp_adam",
    "non_rigid_icp_gauss_newton",
    "alignment_rotation_matrix",
    "apply_rotation",
    "axis_angle_to_quaternion",
    "axis_angle_to_rotation_matrix",
    "quaternion_conjugate",
    "quaternion_product",
    "quaternion_rotate",
    "quaternion_to_axis_angle",
    "quaternion_to_matrix",
    "rodrigues_rotation_formula",
    "rotation_matrix_to_axis_angle",
    "skew_symmetric_matrix",
    "apply_transform",
    "compose",
    "inverse",
    "rotation_error_deg",
    "translation_error",
    "ProcrustesResult",
    "soft_procrustes",
    "weighted_kabsch",
]
