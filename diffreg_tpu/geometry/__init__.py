from .se3 import apply_transform, compose, inverse, rotation_error_deg, translation_error
from .procrustes import ProcrustesResult, soft_procrustes, weighted_kabsch
from .deformation import (apply_embedded_deformation,
                          apply_embedded_deformation_dense,
                          non_rigid_icp_adam)

__all__ = [
    "apply_embedded_deformation",
    "apply_embedded_deformation_dense",
    "non_rigid_icp_adam",
    "apply_transform",
    "compose",
    "inverse",
    "rotation_error_deg",
    "translation_error",
    "ProcrustesResult",
    "soft_procrustes",
    "weighted_kabsch",
]
